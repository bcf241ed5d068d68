"""End-to-end training-data curation over the documents table:

    raw docs
      → Gopher/C4 quality rules (word stats, repetition, top-bigram)
      → PII redaction (emails / IPv4s / long digit runs)
      → text profile (language ID, quality, token counts)
      → quality floor filter
      → exact dedup (md5 fingerprint, min-id survivor)
      → MinHash/LSH near-dedup, CLUSTER-correct (candidates → Jaccard
        confirm → connected components → one survivor per component)
      → TF-IDF top terms (feature preview)
      → ONE-CALL shard assembly (pipeline.assemble_dataset):
        leakage-safe train/val/test split (near-dup clusters never
        straddle splits) → repetition-capped temperature mix to a
        token budget (small sources repeat ≤ max_epochs, large ones
        truncate) → sliding-window chunking → token-budget sequence
        packing → ordered parquet shards + eval publish, with the
        same funnel-metrics contract as curate_documents

Every stage is a JVM DataFrame plan from
``cybersecurity_miw_spark.operators`` (packing is partition-local
Arrow); run it against any sf dir:

    python examples/training_data_pipeline.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, sf_dir: str, quality_floor: float = 0.3) -> DataFrame:
    """The standard curation chain — gopher rules → PII redaction →
    quality floor → exact + cluster-correct near-dedup — via the
    library API (cybersecurity_miw_spark/pipeline.py)."""
    from cybersecurity_miw_spark import pipeline
    from cybersecurity_miw_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    survivors = pipeline.curate_documents(
        docs, quality_floor=quality_floor, near_dup_threshold=0.8
    )
    return survivors.select(
        "doc_id", "lang_guess", "n_tokens", "quality", "fingerprint"
    )


def main() -> None:
    from cybersecurity_miw_spark.operators import textstats
    from cybersecurity_miw_spark.session import get_spark
    from cybersecurity_miw_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    # gate: validate the drop before spending compute on curation
    from cybersecurity_miw_spark.operators.quality import (
        Expectation,
        check_expectations,
        profile_table,
    )

    prof = profile_table(docs, ["doc_id", "text", "source"])
    checks = check_expectations(prof, [
        Expectation("doc_id", "not_null"),
        Expectation("doc_id", "unique"),
        Expectation("text", "max_null_fraction", 0.01),
        Expectation("source", "distinct_at_most", 100),
    ])
    for e, ok, detail in checks:
        print(f"  dq {e.column}.{e.check}: {'PASS' if ok else 'FAIL'} ({detail})")
    if not all(ok for _, ok, _ in checks):
        raise SystemExit("data-quality gate failed — refusing to curate")

    survivors = curate(spark, sf_dir)
    n_in, n_out = docs.count(), survivors.count()
    print(f"{n_in} docs in -> {n_out} curated "
          f"({n_in - n_out} removed by quality/dedup)")
    survivors.show(5, truncate=False)

    terms = textstats.tfidf_top_terms(
        survivors.join(docs.select("doc_id", "text"), "doc_id"), n=3
    )
    terms.show(9, truncate=False)

    # --- r16: URL/domain curation (the recipes' stage ONE) ---
    # the documents table ships no URL column, so synthesize the
    # crawl-shaped mess a real pipeline starts from: tracking params,
    # fragments, default ports, case noise, a blocked ad domain
    from cybersecurity_miw_spark.operators import urlcurate

    with_urls = docs.select("doc_id", "text").withColumn(
        "url",
        F.concat(
            F.lit("HTTP://WWW.Site"), (F.col("doc_id") % 40).cast("string"),
            F.when(F.col("doc_id") % 9 == 0, F.lit(".ads-tracker.com"))
            .otherwise(F.lit(".Example.COM")),
            F.lit(":80/page/"), (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed"))
            .otherwise(F.lit("")),
        ),
    )
    m_url: list = []
    from cybersecurity_miw_spark import pipeline as _pl

    url_clean = _pl.curate_documents(
        with_urls,
        url_col="url",
        domain_blocklist=("ads-tracker.com",),
        apply_gopher=False, redact_pii=False,
        quality_floor=None, near_dup_threshold=None,
    )
    print(f"URL stage: {with_urls.count()} -> {url_clean.count()} "
          "(blocked domain + canonical-URL dedup)")
    print("registrable domains of the survivors:")
    urlcurate.registrable_domain(url_clean, url_col="url").groupBy(
        "registrable_domain"
    ).count().orderBy(F.desc("count")).show(3, truncate=False)

    # --- r16: trained quality classifier (the fastText-recipe gate) ---
    # target = the top-quality decile, raw = the rest; integer
    # fixed-point SGD makes the trained weights bit-deterministic
    from cybersecurity_miw_spark.operators import qualityclf

    pool0 = survivors.join(docs.select("doc_id", "text", "source"), "doc_id")
    q90c = pool0.approxQuantile("quality", [0.9], 0.01)[0]
    clf_target = pool0.filter(F.col("quality") >= q90c).select(
        "doc_id", "text"
    )
    clf_raw = pool0.filter(F.col("quality") < q90c).select("doc_id", "text")
    clf = qualityclf.train_quality_classifier(
        clf_target, clf_raw, dim=512, iters=10
    )
    scored = qualityclf.score_quality(pool0, clf)
    print("classifier micro-logits by heuristic-quality decile "
          "(should rise together):")
    scored.withColumn(
        "decile", F.floor(F.col("quality") * 10)
    ).groupBy("decile").agg(
        F.avg("clf_score_micro").alias("avg_micro_logit")
    ).orderBy("decile").show(10)

    # --- DSIR: resample the curated pool toward a quality exemplar ---
    # (Xie et al., arXiv 2302.03169) the top-quality decile is the
    # target; importance weights pull in docs that LOOK like it even
    # when their heuristic quality score is middling. The LLR model
    # persists like any store (sidecar, drift monitor, streaming twin).
    from cybersecurity_miw_spark.operators import dsir

    pool = survivors.join(docs.select("doc_id", "text", "source"), "doc_id")
    q90 = pool.approxQuantile("quality", [0.9], 0.01)[0]
    exemplar = pool.filter(F.col("quality") >= q90).select("doc_id", "text")
    picked = dsir.dsir_select(pool, exemplar, k=100, n_buckets=2048)
    print("DSIR top-5 toward the quality exemplar:")
    picked.select("doc_id", "source", "llr_micro_sum", "dsir_score").show(5)

    # --- one-call shard assembly over the curated set ---
    # assemble_dataset is the tested back half of the pipeline:
    # split → mix → chunk → pack → shards in a single call with the
    # curate_documents funnel contract. Dedup already removed
    # near-dups at jaccard ≥ 0.8; for SPLIT hygiene we cluster the
    # survivors at a LOOSER threshold (0.5) so even weak rewrites
    # can never straddle train and eval (leakage_safe_split).
    from cybersecurity_miw_spark import pipeline
    from cybersecurity_miw_spark.operators import dedup as dd

    curated = survivors.join(
        docs.select("doc_id", "text", "source"), "doc_id"
    )
    cand = dd.minhash_lsh_candidates(curated, shingle_k=5)
    loose_pairs = dd.jaccard_pairs(curated, cand, shingle_k=5).filter(
        F.col("jaccard") >= 0.5
    )
    split_clusters = dd.dup_clusters(loose_pairs)

    # token budget 1.2× the natural corpus: under-represented sources
    # repeat whole epochs (never more than max_epochs), large sources
    # truncate to an md5-prefix partial epoch
    total_tokens = curated.agg(F.sum("n_tokens")).first()[0]
    budget = int(total_tokens * 1.2)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", "shards_example",
    )
    funnel: list = []
    train = pipeline.assemble_dataset(
        curated,
        out_dir=out_dir,
        clusters=split_clusters,
        temperature=2.0,
        budget_tokens=budget,
        max_epochs=2,
        chunk_window=64,
        pack_budget=4096,
        shard_rows=2048,  # tokens per shard on the budget path
        metrics=funnel,
    )
    for stage in funnel:
        print(
            f"  assemble {stage['stage']}: {stage['n_in']} -> "
            f"{stage['n_out']} ({stage['n_dropped']:+d} dropped; "
            "negative = budget upsampling)"
        )
    print("first 8 of the assembled train mix:")
    train.orderBy("mix_key", "doc_id").select(
        "doc_id", "source", "epoch", "chunk_id", "shard_id",
        F.round("mix_key", 1).alias("mix_key"),
    ).show(8)
    print(f"wrote ordered train shards + eval splits to {out_dir}")

    # analytics-side layout: z-order the curated metadata on
    # (n_tokens, quality) so later filtered reads ("long high-quality
    # docs") prune files on BOTH columns
    from cybersecurity_miw_spark.sources.zorder import write_zordered

    zdir = os.path.join(os.path.dirname(out_dir), "curated_zorder")
    write_zordered(
        curated.select("doc_id", "n_tokens", "quality"),
        zdir, ("n_tokens", "quality"), num_files=4,
    )
    print(f"z-ordered curated metadata on (n_tokens, quality) -> {zdir}")

    # day-2 operations: the corpus keeps growing — dedup INCREMENTALLY
    # against persisted indexes (history text never rescanned), fence
    # mega-clusters out of the pair join, and keep the indexes healthy
    # with compaction
    store_root = os.path.join(os.path.dirname(out_dir), "stores_example")
    fp_dir = os.path.join(store_root, "fingerprints")
    band_dir = os.path.join(store_root, "bands")
    history = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    dd.fingerprint_store(history).write.mode("overwrite").parquet(fp_dir)
    dd.lsh_band_store(history).write.mode("overwrite").parquet(band_dir)

    accepted = dd.dedup_against_store(batch, spark.read.parquet(fp_dir))
    flags = dd.incremental_near_dups_confirmed(
        batch, history, spark.read.parquet(band_dir), threshold=0.8
    )
    print(
        f"incremental ingest: {batch.count()} arriving, "
        f"{accepted.count()} accepted (exact), "
        f"{flags.count()} near-dup flags vs history"
    )
    # fence check: any near-dup mega-cluster (boilerplate template)
    # would surface here instead of exploding the pair join
    over = dd.oversized_band_buckets(docs, max_bucket_width=50)
    print(f"oversized band buckets (width > 50): {over.count()}")
    # periodic maintenance: collapse per-batch files + replayed rows
    stats = dd.compact_band_store(spark, band_dir)
    print(
        f"band store compacted: {stats['files_before']} -> "
        f"{stats['files_after']} files, {stats['rows_before']} -> "
        f"{stats['rows_after']} rows"
    )


if __name__ == "__main__":
    main()
