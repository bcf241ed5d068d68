"""Scale-point benchmark: the flagship format-compiler query and the
MinHash-LSH dedup pipeline at ~sf1.0 (10x the per-round sf0.1 bench).

The driver ships no sf1.0 parquet, so this derives one from sf0.1:

* ``events``   — 10 copies, ``event_id`` offset per copy. Group keys
  (day, etype) are untouched, so the flagship aggregation keeps its
  150 groups and each group gets 10x the rows — exactly what a 10x
  retention window looks like in production.
* ``documents`` — 10 copies, ``doc_id`` offset per copy, and the text
  run through a per-copy lowercase-alphabet rotation
  (``translate(text, a..z, rotated)``). That keeps token lengths,
  whitespace structure, and within-copy near-dup relationships
  identical while making shingle sets DISJOINT across copies — naive
  duplication would put 10 identical texts in every LSH band bucket
  and quadratically inflate the candidate stage into a workload that
  no real 10x corpus produces.
* ``documents`` (media variant, ``-media``) — the phash family needs
  the byte-VALUE analog of the trick: a per-copy pseudo-random
  permutation of all printable byte values (copy 0 identity), so
  cross-copy aHash means decorrelate fully and candidates grow ~10x
  instead of the 88x the weak a..z rotation produced (r14 watch #2).

The question answered here is the one sf0.1 cannot: does wall time
scale ~linearly with input size, or is there a cliff (bucket blowup,
spill, driver collect) hiding above the small-factor bench?
Prints ONE JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join(os.path.dirname(__file__), ".tmp/scale/sf1.0")
)
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
QUERY_NAMES = [
    "miw_events_summary",
    "minhash_lsh_candidates",
    "gopher_quality_flags",
    "chunk_fixed_windows",
    "dup_clusters_cc",
    "asof_join_latest_snapshot",
    "lm_bigram_quality_scores",
    "remove_boilerplate_lines",
    "eval_ngram_overlap_flags",
    "hashed_text_embedding",
    "time_rollup_multires",
    "funnel_signup_click_purchase",
    "event_type_transitions",
    "star_pattern_signup_clicks_purchase",
    # round 7: incremental ingest vs a persisted store (rotated copies
    # keep the batch/history fingerprint and shingle sets disjoint
    # across copies — a linear 10x ingest workload), and the fuzzy
    # join (distinct source names are scale-invariant; the 10x cost
    # is the distinct scan, the blocking join stays constant)
    "incremental_exact_ingest",
    "incremental_lsh_vs_store",
    "fuzzy_source_name_pairs",
    # round 8 late: exact set-similarity join (rotated copies keep
    # shingle sets disjoint across copies, so prefix-join candidates
    # stay within copies — pairs grow exactly 10x, the real 10x-corpus
    # workload) and token-budget selection (grading scan + bucket agg
    # grow 10x; the boundary window stays one bucket)
    "setsim_exact_pairs",
    "budget_select_docs",
    # r11: containment joins — rotated copies keep shingle sets
    # disjoint across copies, so containment pairs grow exactly 10x
    "containment_pairs_exact",
    "containment_cross_decontaminate",
    # r12: store-backed incremental containment (same rotation
    # rationale; the store + frozen order are built inside the query)
    "incremental_containment_vs_store",
    # round 8 final: span-level substring dedup (rotated copies keep
    # 8-gram vocabularies disjoint across copies — duplicated-gram
    # occurrences and spans grow exactly 10x, no cross-copy inflation)
    "duplicated_ngram_spans",
    # r14: temperature mixing — per-source rank window + bounded
    # count collect; rotated docs keep the source column untouched so
    # the skewed pool grows exactly 10x
    "temperature_mix_prefix",
    # r15: repetition-capped budget mixing — the skewed pool grows 10x
    # per source (source column untouched by rotation) while the
    # 20k-token budget stays FIXED, so the explode output is
    # budget-bounded and the measured 10x cost is the per-source md5
    # rank window + running token sum over the full corpus (the real
    # backfill shape: corpus grows, budget is the training recipe's)
    "mix_to_budget_epochs",
    # r15: one-call dataset assembly — minhash clusters → leakage-safe
    # split → weighted mix → range-shard id → 32-token chunking;
    # rotation keeps shingle sets disjoint across copies so dup
    # clusters stay within copies and every stage grows linearly
    "assemble_manifest",
    # r15: DSIR selection — raw AND target (a corpus slice) both grow
    # 10x; the gram explode + (id, bucket) agg are corpus-linear, the
    # LLR table stays n_buckets-bounded, the top-k is TakeOrdered
    "dsir_select_topk",
    # r15: DSIR to a token budget — same weight plan + the bounded
    # 1000-grade budget walk (fixed budget over a 10x pool: the
    # backfill shape, like mix_to_budget)
    "dsir_select_budget",
    # r15: the full Gopher repetition battery — one 9-way posexplode
    # + uniform (doc, n, gram) agg + per-(doc, n) islands window;
    # rotation keeps gram vocabularies disjoint across copies and the
    # planted %11/%7 structure appears at the same rate in every copy
    "gopher_repetition_battery",
    # r15: C4 page rules — shuffle-free per-row expressions; the
    # planted pathology lines appear at the same %k rate per copy
    "c4_page_rules",
    # r15: distinct-n diversity — rotation keeps per-copy gram
    # vocabularies disjoint, so distinct counts grow ~10x with totals
    # (the honest no-upsampling baseline shape)
    "ngram_diversity_by_source",
    # r16: URL canonicalize + dedup — pure row expressions + one
    # md5 groupBy + semi-join; the synthesized canonical space is
    # doc_id-modular so duplicate groups deepen 10x (the real
    # re-crawl shape: same pages, more fetches)
    "url_canonical_dedup",
    # r16: PSL eTLD+1 — bounded candidate explode + broadcast rule
    # join; hosts are doc_id-modular so the domain roster is constant
    # while input grows 10x (the aggregation-report shape)
    "registrable_domain_counts",
    # r16: frozen-model classifier scoring — one feature explode +
    # (id, bucket) agg + broadcast weight join over 10x docs; the
    # rotated vocabulary re-hashes per copy but bucket volume is
    # corpus-linear either way
    "quality_clf_score",
    # r16: the integer-SGD training loop at 10x — 3 iterations, each
    # two uniform-key shuffles over the staged feature profile; the
    # model stays dim-bounded so driver traffic is scale-free
    "quality_clf_train_scores",
    # r16: classifier budget selection — frozen scoring + the
    # 1000-grade budget walk over a FIXED budget (the backfill
    # shape, like dsir_select_budget)
    "quality_clf_select_budget",
    # r16: URL structural scoring — shuffle-free per-row expressions
    "url_quality_flags",
    # r16: sentence-boundary chunking — one doc-key exchange shared
    # by the prefix window and the chunk group-concat
    "chunk_sentence_budget",
    # r17: language ID — script-gate row expressions + a ≤600-gram
    # bounded explode + broadcast profile join + two uniform-key
    # aggs; the 30-way fixture synthesizes per-row from doc_id, so
    # 10x docs is exactly 10x classification work (rotation of the
    # unused text column is irrelevant)
    "lang_id_assign",
    # r17: text_profile re-anchored (lang_guess now the trigram
    # classifier + CJK token fallback) — the profile columns stay
    # per-row; the added cost is the langid explode+join chain over
    # the real (rotated) text, corpus-linear
    "text_profile",
    # r17: HTML extraction — pure per-row regexp/replace chains over
    # pages synthesized from the rotated text; zero exchanges
    # (extract) / one bounded line explode (line stats)
    "html_extract_text",
    "html_line_density",
    # r17: outlink extraction — two regexp passes + zip explode
    "html_outlinks_edges",
    # r17: classifier calibration — frozen scoring explode + the
    # bounded 10k-grade table walk (report) and the two-sided
    # grade rank-sum (separation); corpus-linear scan into
    # grades-bounded aggregates
    "quality_clf_report_deciles",
    "quality_clf_separation",
    # r17: per-language size audit — the lang_id chain + one
    # language-keyed agg + a languages-bounded window
    "lang_report_counts",
    # r17: exact dedup (fingerprint groupBy, no join-back) — added so
    # the standing sweep carries the second flagship linear chain and
    # the 100x (sf10) spot point can read both off one harness
    "dedup_exact_groups",
    # r17 second rotation: n-gram LM — the alphabet rotation makes
    # per-copy vocabularies DISJOINT, so the 10x target split trains
    # a ~10x-vocab model (the real bigger-exemplar shape: token
    # explode and count aggs grow 10x, the model stays vocab-bounded
    # relative to the corpus) and scoring joins 10x docs against it
    "ngram_lm_train",
    "ngram_lm_score",
    "ngram_lm_ppl_buckets",
    # r17 second rotation: link graph — edges are doc_id-modular
    # (src URLs grow 10x with doc_id, dst roster is %97-bounded), so
    # in-degree DEEPENS while the target set stays constant — the
    # re-crawl shape (same sites, more fetched pages), the same
    # rationale as url_canonical_dedup / registrable_domain_counts
    "link_anchor_index",
    "link_pagerank",
    "domain_link_graph_counts",
    "crawl_frontier_rank",
    # r17 second rotation: robots gate — URLs grow 10x, the host
    # roster (and with it the parsed rules table) is %11-bounded, so
    # the measured cost is the gate join + regex filter, corpus-linear
    "robots_allow_gate",
    # r17 second rotation: unicode cleanup — shuffle-free per-row
    # translate/replace/regexp chain over the rotated text
    "clean_text_normalization",
    # r17 second rotation: topic argmax — one feature explode over
    # 10x (rotated) docs + the broadcast K·dim weight join; the
    # rotated vocabulary re-hashes per copy but bucket volume is
    # corpus-linear (the quality_clf_score rationale, K-way)
    "topic_classify_argmax",
    # r17 second rotation: keep-first paragraph dedup — the rotated
    # copies keep the PLANTED header/footer paragraphs byte-identical
    # (literals, not rotated text), so the shared-paragraph groups
    # DEEPEN 10x while per-copy bodies stay unique — the real
    # boilerplate shape; the md5 min agg reduces map-side
    "paragraph_dedup_first",
    # r18: dangling-mass PageRank — link_pagerank's rationale plus
    # one 1-row dangling-mass agg per iteration (scale-free driver
    # traffic; the broadcast cross is row-expression cost)
    "link_pagerank_dangling",
    # r18: Crawl-delay time slots — frontier URLs grow 10x, the host
    # roster (and the parsed delay table) is %11-bounded; measured
    # cost = the host window + one host-key broadcast-able join
    "crawl_fetch_slots",
    # r18: CDX parse+select — index lines grow 10x with doc_id and
    # capture keys are doc_id-distinct, so the latest-capture
    # max-struct agg grows linearly (the real bigger-index shape)
    "cdx_select_fetchlist",
    # r18: cluster.idx lookup — the secondary index is CRAWL-bounded
    # (20 blocks here), not corpus-scaled: the sweep point documents
    # scale-invariance of the pre-filter
    "cdx_shard_lookup",
    # r18: exact BPE tokenization — the alphabet rotation makes
    # per-copy word vocabularies DISJOINT, so the distinct-word
    # Arrow pass grows ~10x (mostly-OOV rotated words = the
    # worst-case long segmentations) while the count join stays
    # corpus-linear — exactly the |vocab| ≪ |corpus| claim the
    # module's scale story rests on; the ids variant adds the
    # order-struct sequence re-assembly cost
    "bpe_token_counts",
    "bpe_token_ids",
    # r18 continued: pct-normalize + canonicalize + dedup — the
    # url_canonical_dedup rationale (doc_id-modular canonical space,
    # duplicate groups deepen 10x) with the split-on-'%' transform
    # fused into the same row-expression projection
    "url_pct_normalize_dedup",
]

# r15: the phash media family runs against a BYTE-PERMUTED media
# variant instead of the shared alphabet-rotated documents: rotating
# a..z only shifts 26 of ~95 printable byte values by a constant, so
# cross-copy aHashes stayed correlated and the r14 10x point absorbed
# an 88x-inflated candidate load (VERDICT r14 watch #2). A per-copy
# pseudo-random permutation of ALL printable byte values keeps
# within-copy near-dup structure byte-identical while fully
# decorrelating the sampled-byte means across copies — candidates
# grow ~10x, the realistic 10x-media workload.
MEDIA_QUERY_NAMES = [
    "phash_band_candidates",
    "incremental_phash_vs_store",
]

# range_join runs against the TIME-SHIFTED events variant: with plain
# copies every copy shares ts AND user_id, so each interval anchor
# matches every copy's events — result rows grow copies² (an artifact,
# like naive doc duplication in LSH banding, not a real 10x workload).
# Shifting each copy by 31 days keeps per-interval match density
# constant while growing both sides 10x — a longer retention window.
TSHIFT_QUERY_NAMES = [
    "range_join_event_windows",
]

# round 9: BM25 runs against PLAIN-duplicated documents (doc_id offset,
# no alphabet rotation): it never joins docs to docs, so duplication has
# no quadratic artifact, and a real 10x corpus grows the query-term
# postings 10x too — rotation would freeze the posting lists at copy-0
# size and fake the very bound being measured. The posting discipline
# (query-term filter BELOW the per-(doc,term) agg) is what keeps the
# shuffle proportional to postings, not corpus.
PLAINDOC_QUERY_NAMES = [
    "bm25_topk_docs",
    # r11: hybrid fusion — BM25 branch needs real 10x postings
    # (plaindoc, same rationale as bm25) and the dense branch has no
    # self-join, so plain vec_id-offset embeddings are artifact-free
    "hybrid_rrf_topk_docs",
    # r12: the ANN dense branch (IVF probe-pruned) — same corpus
    # variant so brute-vs-ann reads off the same 10x postings/vectors
    "hybrid_rrf_ann_topk_docs",
    # r12: batched retrieval — one corpus pass per branch regardless
    # of query count; plaindoc for the same real-postings rationale
    "bm25_topk_batch_docs",
    "hybrid_rrf_batch_docs",
]

# r11: embedding-family queries run against DIMENSION-ROTATED 10x
# embeddings (norms preserved, cross-copy cosines ~0 — near-dup pairs
# stay within copies; plain duplication would plant identical-vector
# clusters and measure a quadratic artifact). Queries with a bucket
# self-join (semantic dedup) hold n_planes fixed here — the
# occupancy-constant operating rule is measured separately in
# SCALE.md "embedding-family 10x scale points".
EMB_QUERY_NAMES = [
    "incremental_semantic_vs_store",
    "ann_ivf_topk_batch",
    # r12: cluster-atomic SemDeDup — the CC rounds on top of the
    # bucket pair join; n_planes fixed here (occupancy rule measured
    # separately), rotation keeps pair graphs within copies
    "semantic_dedup_clusters",
    # r15 (VERDICT r14 watch #1): the same operator through the
    # DEFAULT n_planes=None occupancy-constant schedule — the plan
    # users actually get; the fixed-4 row above stays as the
    # documented oracle-pinned contrast on the quadratic path
    "semantic_dedup_clusters_auto",
    # r14: hard-negative mining — a FIXED 3-query batch against 10x
    # vectors (the ann_ivf_topk_batch shape + one bounded anti-join),
    # so cost is the corpus assignment scan, linear by construction
    "hard_negatives_topk",
]

# sweep-only entries (not catalog queries — no oracle twin exists or
# the geometry is deliberately the production default rather than the
# oracle-pinned one); same (spark, sf_dir) -> DataFrame contract
def _q_semantic_dedup_clusters_auto(spark, sf_dir):
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators import similarity
    from cybersecurity_miw_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", widen=True)
    return similarity.semantic_dedup_clusters(
        emb, dim=64, threshold=0.5, n_planes=None
    ).select("vec_id")


EXTRA_QUERIES = {
    "semantic_dedup_clusters_auto": _q_semantic_dedup_clusters_auto,
}

# round 8: the new TPC-H heavies against 10x facts (lineitem/orders
# copied with orderkey offsets; dims unchanged — the retention-growth
# story: the same customers/suppliers/parts, 10x the order history).
# q13's per-customer counts grow 10x (count-of-counts shifts right),
# q21's per-order aggregate sees disjoint orderkeys per copy (linear),
# q16's distinct pair agg scans 10x input into a constant-size output.
TPCH_SCALE_QUERY_NAMES = [
    "tpch_q13_order_count_distribution",
    "tpch_q16_supplier_part_counts",
    "tpch_q21_sole_return_supplier",
    # round 8 late: q9 (5-table join, constant nation×year groups over
    # 10x facts), q11 (10x input into a constant part roster; the
    # threshold fraction is scale-free since totals and values grow
    # together), q12 (date-pruned fact join, 2 output rows)
    "tpch_q9_product_type_profit",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipments",
]


def _rotated(i: int) -> str:
    az = string.ascii_lowercase
    k = i % 25 + 1 if i else 0  # copy 0 is the identity
    return az[k:] + az[:k]


def build_scaled(
    spark, base_dir: str, out_dir: str, copies: int,
    core_only: bool = False,
) -> None:
    """core_only skips the tshift/plaindoc/embeddings variants — the
    100x (sf10) spot point needs only events + documents."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.sources.tables import load_events

    ev = load_events(spark, base_dir)
    n_ev = ev.count()
    parts = []
    for i in range(copies):
        parts.append(
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * n_ev)
            )
        )
    scaled_ev = parts[0]
    for p in parts[1:]:
        scaled_ev = scaled_ev.unionByName(p)
    # many output files -> many row groups -> the scan parallelizes
    # without the widening repartition kicking in
    scaled_ev.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    if not core_only:
        parts = []
        for i in range(copies):
            parts.append(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * n_ev)
                ).withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {31 * i} DAYS")
                )
            )
        shifted_ev = parts[0]
        for p in parts[1:]:
            shifted_ev = shifted_ev.unionByName(p)
        shifted_ev.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}-tshift/events.parquet"
        )

    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    n_docs = docs.count()
    az = string.ascii_lowercase
    parts = []
    for i in range(copies):
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
            .withColumn("text", F.translate(F.col("text"), az, _rotated(i)))
        )
    scaled_docs = parts[0]
    for p in parts[1:]:
        scaled_docs = scaled_docs.unionByName(p)
    scaled_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    if not core_only:
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
            for i in range(copies)
        ]
        plain_docs = parts[0]
        for p in parts[1:]:
            plain_docs = plain_docs.unionByName(p)
        plain_docs.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}-plaindoc/documents.parquet"
        )
    if core_only:
        return

    # embeddings x10: per-copy DIMENSION ROTATION for the scaled dir
    # (norms preserved, cross-copy cosines ~0 — near-dup pairs stay
    # within copies, the rotated-alphabet trick in embedding space;
    # plain duplication would plant identical-vector clusters), plain
    # vec_id-offset copies for the plaindoc dir (hybrid's dense
    # branch has no self-join, so duplication is artifact-free there)
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    n_emb = emb.count()
    vec_t = emb.schema["embedding"].dataType
    dim = len(emb.select("embedding").head()[0])
    rot_parts, plain_parts = [], []
    for i in range(copies):
        shifted = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_emb))
        plain_parts.append(shifted)
        rot_parts.append(
            shifted.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, dim - i),
                    F.slice("embedding", 1, i),
                ).cast(vec_t),
            )
            if i
            else shifted
        )
    rot, plain = rot_parts[0], plain_parts[0]
    for p in rot_parts[1:]:
        rot = rot.unionByName(p)
    for p in plain_parts[1:]:
        plain = plain.unionByName(p)
    rot.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    plain.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}-plaindoc/embeddings.parquet"
    )


_PRINTABLE = "".join(chr(c) for c in range(32, 127))


def _permuted_bytes(i: int) -> str:
    """Per-copy deterministic pseudo-random permutation of the
    printable byte values (copy 0 = identity) — the media-variant
    decorrelator: aHash samples byte VALUES, so a full-alphabet value
    permutation scatters every copy's sampled means independently
    while keeping within-copy near-dup payloads byte-identical."""
    if not i:
        return _PRINTABLE
    import random as _random

    chars = list(_PRINTABLE)
    _random.Random(0xC0FFEE + i).shuffle(chars)
    return "".join(chars)


def build_scaled_media(spark, base_dir: str, out_dir: str, copies: int) -> None:
    """documents x10 with per-copy printable-byte-value permutation —
    the media 10x variant for the phash family (see MEDIA_QUERY_NAMES
    note)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    n_docs = docs.count()
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        .withColumn(
            "text", F.translate(F.col("text"), _PRINTABLE, _permuted_bytes(i))
        )
        for i in range(copies)
    ]
    media_docs = parts[0]
    for p in parts[1:]:
        media_docs = media_docs.unionByName(p)
    media_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}-media/documents.parquet"
    )


def build_scaled_tpch(spark, base_dir: str, out_dir: str, copies: int) -> None:
    """10x the TPC-H FACTS (lineitem, orders) with per-copy orderkey
    offsets; dims copied unchanged — same key spaces, 10x the
    history."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{base_dir}/orders.parquet")
    li = spark.read.parquet(f"{base_dir}/lineitem.parquet")
    okey_off = o.agg(F.max("o_orderkey")).first()[0] + 1
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * okey_off))
        for i in range(copies)
    ]
    scaled_li = parts[0]
    for pp in parts[1:]:
        scaled_li = scaled_li.unionByName(pp)
    scaled_li.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )
    parts = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * okey_off))
        for i in range(copies)
    ]
    scaled_o = parts[0]
    for pp in parts[1:]:
        scaled_o = scaled_o.unionByName(pp)
    scaled_o.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{base_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from cybersecurity_miw_spark.catalog import QUERIES
    from cybersecurity_miw_spark.session import get_spark

    spark = get_spark("miw-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    core_env = os.environ.get("SPARK_GRAFT_SCALE_CORE") == "1"
    need_core = not (
        os.path.exists(f"{SCALE_DIR}/documents.parquet/_SUCCESS")
        and os.path.exists(f"{SCALE_DIR}/events.parquet/_SUCCESS")
    )
    need_full = not core_env and not (
        os.path.exists(f"{SCALE_DIR}-tshift/events.parquet/_SUCCESS")
        and os.path.exists(f"{SCALE_DIR}-plaindoc/documents.parquet/_SUCCESS")
        and os.path.exists(f"{SCALE_DIR}/embeddings.parquet/_SUCCESS")
        and os.path.exists(f"{SCALE_DIR}-plaindoc/embeddings.parquet/_SUCCESS")
    )
    if need_core or need_full:
        t0 = time.perf_counter()
        build_scaled(spark, BASE_DIR, SCALE_DIR, COPIES, core_only=core_env)
        build_s = round(time.perf_counter() - t0, 3)
    else:
        build_s = 0.0

    # SPARK_GRAFT_SCALE_CORE=1 skips the tpch/media variant builds —
    # the 100x (sf10) spot-point runs only core-table queries and
    # must not pay for 100 copies of lineitem
    core_only = core_env
    if not core_only and not os.path.exists(
        f"{SCALE_DIR}/lineitem.parquet/_SUCCESS"
    ):
        t0 = time.perf_counter()
        build_scaled_tpch(spark, BASE_DIR, SCALE_DIR, COPIES)
        build_s += round(time.perf_counter() - t0, 3)

    if not core_only and not os.path.exists(
        f"{SCALE_DIR}-media/documents.parquet/_SUCCESS"
    ):
        t0 = time.perf_counter()
        build_scaled_media(spark, BASE_DIR, SCALE_DIR, COPIES)
        build_s += round(time.perf_counter() - t0, 3)

    # optional name filter: SPARK_GRAFT_SCALE_ONLY=q1,q2 reruns a
    # subset without paying for the full standing sweep
    only = {
        n for n in os.environ.get("SPARK_GRAFT_SCALE_ONLY", "").split(",") if n
    }

    # warm-up then min-of-2 timed, same methodology as bench.py
    out: dict[str, dict[str, float]] = {}
    plan = [(BASE_DIR, "base",
             QUERY_NAMES + TSHIFT_QUERY_NAMES + TPCH_SCALE_QUERY_NAMES
             + PLAINDOC_QUERY_NAMES + EMB_QUERY_NAMES + MEDIA_QUERY_NAMES),
            (SCALE_DIR, "scaled",
             QUERY_NAMES + TPCH_SCALE_QUERY_NAMES + EMB_QUERY_NAMES),
            (f"{SCALE_DIR}-tshift", "scaled", TSHIFT_QUERY_NAMES),
            (f"{SCALE_DIR}-plaindoc", "scaled", PLAINDOC_QUERY_NAMES),
            (f"{SCALE_DIR}-media", "scaled", MEDIA_QUERY_NAMES)]
    from cybersecurity_miw_spark.cache import release_intermediates

    for sf_dir, tag, names in plan:
        for name in names:
            if only and name not in only:
                continue
            q = EXTRA_QUERIES.get(name) or QUERIES[name]
            force(q(spark, sf_dir))
            release_intermediates()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                force(q(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_intermediates()
            out.setdefault(name, {})[tag] = round(best, 3)

    queries = {}
    for name, t in out.items():
        # per-row slowdown: scaled_time / (base_time * copies); ~<=1.0
        # means linear-or-better, >>1 means a cliff
        queries[name] = {
            **t,
            "scale_ratio": round(t["scaled"] / (t["base"] * COPIES), 3),
        }
    print(
        json.dumps(
            {
                "metric": "scale_point_wall",
                "unit": "sec",
                "copies": COPIES,
                "build_s": build_s,
                "queries": queries,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
