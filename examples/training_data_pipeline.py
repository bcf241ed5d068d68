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
      → shard assembly: deterministic train/val/test split
        → weighted source interleave (train shard order)
        → sliding-window chunking (fixed token windows)
        → token-budget sequence packing (context-window bins)

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

    # --- shard assembly over the curated set ---
    from cybersecurity_miw_spark.operators import packing, sampling

    curated = survivors.join(
        docs.select("doc_id", "source", "n_chars"), "doc_id"
    )
    split = sampling.split_assign(
        curated, {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    split.groupBy("split").count().orderBy("split").show()

    train = split.filter(F.col("split") == "train")
    top_sources = [
        r["source"]
        for r in train.groupBy("source").count()
        .orderBy(F.desc("count")).limit(3).collect()
    ]
    mixed = sampling.weighted_interleave(
        train, "source", dict(zip(top_sources, (0.6, 0.3, 0.1)))
    )
    print("first 8 of the weighted train mix (prefix holds 60/30/10):")
    mixed.orderBy("mix_key", "source", "doc_id").select(
        "doc_id", "source", F.round("mix_key", 3).alias("mix_key")
    ).show(8)

    chunks = packing.chunk_documents(
        mixed.join(docs.select("doc_id", "text"), "doc_id"),
        window=64, stride=64,
    )
    print("chunking: docs -> fixed 64-token windows")
    chunks.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.round(F.avg("n_chunk_tokens"), 1).alias("mean_tokens"),
    ).show()

    bins = packing.pack_sequences(
        mixed, budget=4096, weight_col="n_chars", n_packers=8
    )
    stats = bins.groupBy("packer", "bin_id").agg(
        F.sum("n_chars").alias("fill"), F.count(F.lit(1)).alias("docs")
    )
    stats.agg(
        F.count(F.lit(1)).alias("bins"),
        F.round(F.avg("fill"), 1).alias("mean_fill"),
        F.round(F.avg("docs"), 2).alias("mean_docs_per_bin"),
    ).show()

    # last mile: size-bounded, deterministically-ordered shards
    from cybersecurity_miw_spark.sources.shards import write_shards

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", "shards_example",
    )
    n_shards = write_shards(
        mixed.select("doc_id", "source", "mix_key"),
        out_dir, shard_rows=64,
    )
    print(f"wrote {n_shards} ordered shard ranges to {out_dir}")

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
    from cybersecurity_miw_spark.operators import dedup as dd

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
