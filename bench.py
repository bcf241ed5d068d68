"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no output materialization on the driver). The headline set spans the
engine's hot paths: the format-compiler pipeline (tokenize → project →
aggregate), plain relational aggregation, text profiling, exact and
MinHash dedup, and similarity search; the extended set adds the
heaviest post-round-4 operators (fuzzy join, connected components,
near-dup confirm, TPC-H 5/18, range join, multi-resolution rollup,
PQ ANN).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The original 15-query core, unchanged since round 3-4 — "value" sums
# exactly these so the headline wall stays comparable across rounds.
CORE15 = [
    "miw_events_summary",
    "tokenize_typed_projection",
    "date_buckets",
    "match_substring_or",
    "agg_union_count_histogram",
    "tpch_q1_pricing_summary",
    "wc_wordcount",
    "text_profile",
    "dedup_exact_groups",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "cosine_brute_topk",
    "ann_lsh_topk",
    "embedding_near_dup_lsh",
]

# Round-7 additions: the heaviest post-round-4 operators, so a
# regression in (say) the fuzzy join's gram explode or the CC loop
# shows up in the per-round record. Timed identically; summed into
# "value_extended", NOT into the cross-round "value".
EXTENDED = [
    "fuzzy_source_name_pairs",
    "dup_clusters_cc",
    "near_dup_jaccard_confirm",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customer",
    "range_join_event_windows",
    "time_rollup_multires",
    "ann_pq_adc_topk",
    # r18: the exact-tokenizer Arrow pass (the one Python stage in
    # the chain — a regression here means the distinct-word
    # decomposition broke) and the dangling-redistribution PageRank
    # (iterative + a per-iteration 1-row broadcast cross)
    "bpe_token_counts",
    "link_pagerank_dangling",
]

HEADLINE = CORE15 + EXTENDED

# Fixed-reference control (round 16): a PINNED, zero-I/O, pure-codegen
# query defined HERE (not in the catalog, so no operator change can
# ever move it) whose wall calibrates the machine each bench run.
# Three consecutive rounds of uniform ambient drift (headline 9.98 →
# 10.46 → 13.85 s with no plan changed — VERDICT r15 watch #1) showed
# the raw headline conflates machine speed with code speed; the
# control's wall moves with the machine only, so
# value_ctrl_norm = value · (CONTROL_REF_SEC / control_warm) is the
# cross-round-comparable number. The mix mirrors the suite's hot
# paths: hashing, string building, regex, and aggregation — all
# whole-stage-codegen, 32 partitions like the suite.
# r17 (VERDICT r16 watch #1): 4M → 48M rows. The 0.57 s control had
# a measured ±10-15% noise floor of its own, jitter-amplifying the
# normalization of a ~12 s headline; at 48M rows the control runs
# ~3 s, where the same absolute jitter is a ~2% relative error, and
# the normalizer is now the MEDIAN OF FIVE samples spread across
# the session (one after warm-up, one before each timed pass, one
# at the end) instead of median-of-3.
CONTROL_ROWS = 48_000_000
# Pinned on the r17 clean re-pin run (SCALE.md "Bench control
# re-pin, round 17"): the median of 5 warm controls at 48M rows on
# an otherwise idle machine — samples [1.891, 1.923, 1.929, 1.996,
# 2.023], max-min spread 0.132 s (±3.4%, vs the ±10-15% the 0.57 s
# r16 control showed). Re-pinned BECAUSE CONTROL_ROWS changed — the
# r16 constant 0.574 calibrated the 4M control. Do NOT re-pin
# casually — the constant is the fixed point that makes normalized
# headlines comparable across rounds.
CONTROL_REF_SEC = 1.929


def control_query(spark):
    from pyspark.sql import functions as F

    s = F.col("id").cast("string")
    return (
        spark.range(0, CONTROL_ROWS, 1, 32)
        .select(
            # pmod keeps the sum bounded (4M · 1e9 « 2^63): a raw
            # sum of xxhash64 longs overflows under ANSI mode
            F.pmod(F.xxhash64(F.md5(s)), F.lit(1_000_000_007)).alias("h"),
            F.length(F.regexp_replace(s, "[0-9]", "x")).alias("l"),
        )
        .agg(F.sum("h").alias("sh"), F.sum("l").alias("sl"))
    )


def force(df) -> None:
    """Run the full plan without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def release() -> None:
    """Drop operator-internal cached intermediates so 23 queries x 4
    passes don't accumulate executor cache across timings. Called by
    the bench loops AFTER each timing is recorded, so the unpersist
    RPC is genuinely outside the timed region (round-8 fix: it used
    to run inside force() and was timed)."""
    from cybersecurity_miw_spark.cache import release_intermediates

    release_intermediates()


def main() -> None:
    from cybersecurity_miw_spark.catalog import QUERIES
    from cybersecurity_miw_spark.session import get_spark

    spark = get_spark("miw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else None

    # warm the JVM + file listing outside the timed region
    force(spark.read.parquet(f"{SF_DIR}/region.parquet"))

    # Pass 1 (untimed warm-up): codegen class generation + C2 JIT of the
    # generated loops. At sf0.1 the inputs are sub-10 MB, so one-shot
    # timings measure JVM compile scheduling, not the plan (measured up
    # to 10x run-to-run swings on a regex-heavy query while the
    # steady-state time was stable at 1.4 s). The 100 TB question is
    # per-byte steady-state throughput; cold timings are still reported
    # under "queries_cold" for transparency — but they are NOT
    # comparable across bench records: an isolated A/B (SCALE.md,
    # "Cold-run numbers") measured the flagship cold at 3.98-4.25 s on
    # BOTH the current code and the round-2 checkout, while successive
    # bench records logged 3.7-5.1 s. Only the warmed min-of-2 below is
    # a property of the plan.
    cold: dict[str, float] = {}
    t0 = time.perf_counter()
    force(control_query(spark))
    control_cold = round(time.perf_counter() - t0, 3)
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(QUERIES[name](spark, SF_DIR))
        cold[name] = round(time.perf_counter() - t0, 3)
        release()

    # Passes 2-4 (timed): steady-state wall time per query,
    # MEDIAN of three runs — the environment shows ±10-16% VM noise and
    # occasional multi-second stalls striking random queries (isolated
    # A/B in SCALE.md, round 5); the median is robust to one stall in
    # either direction where min-of-2 still tracked lucky runs. The
    # per-query spread (max-min over the three warm runs) is reported
    # so deltas can be read against measured same-session variance.
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # r19 (VERDICT r18 #6): construct/force split. Query CONSTRUCTION
    # (catalog fn + analysis py4j round-trips) happens inside the
    # timed region and the r18 per-app expression/reader memos zero
    # most of it out on warm passes — reporting the construction
    # share separately keeps execution-side wins distinguishable from
    # driver-cost amortization in round-over-round diffs. The timed
    # value is UNCHANGED (still construct+force, same region); this
    # only splits out where inside that region the time went.
    construct_runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    control_runs: list[float] = []

    def _sample_control() -> None:
        t0 = time.perf_counter()
        force(control_query(spark))
        control_runs.append(time.perf_counter() - t0)

    # five control samples SPREAD across the session (one right after
    # the cold pass, one before each timed pass, one at the end) so
    # the median sees the same ambient conditions the query timings
    # saw, not just one instant
    _sample_control()
    for _ in range(3):
        _sample_control()
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t_built = time.perf_counter()
            force(df)
            runs[name].append(time.perf_counter() - t0)
            construct_runs[name].append(t_built - t0)
            release()
    _sample_control()

    control_warm = round(sorted(control_runs)[2], 3)
    timings = {n: round(sorted(ts)[1], 3) for n, ts in runs.items()}
    construct = {
        n: round(sorted(ts)[1], 3) for n, ts in construct_runs.items()
    }
    spread = {n: round(max(ts) - min(ts), 3) for n, ts in runs.items()}
    # min-of-warm-runs, informational: the pre-round-7 records used
    # min-of-2, so this is the continuity number for cross-round diffs
    min_warm = {n: round(min(ts), 3) for n, ts in runs.items()}

    total = round(sum(timings[n] for n in CORE15), 3)
    # Full record FIRST (cold/spread/min3 diagnostics — long line),
    # compact contract line LAST: the round driver keeps only a
    # bounded tail of stdout and parses its final line, and the full
    # record overflowed that buffer in r11 (BENCH_r11.json parsed:
    # null). The last line carries the required
    # {metric, value, unit, queries, sf} contract and stays short.
    print(
        json.dumps(
            {
                "record": "bench_full",
                "warmup_passes": 1,
                "timing": "median_of_3_warm",
                "core15": CORE15,
                "value_extended": round(sum(timings.values()), 3),
                # median warm CONSTRUCTION seconds per query (the
                # construct share of the timed construct+force wall)
                "queries_construct": construct,
                "queries_spread_warm": spread,
                "value_min3": round(sum(min_warm[n] for n in CORE15), 3),
                "queries_min_warm": min_warm,
                "value_cold": round(sum(cold[n] for n in CORE15), 3),
                "queries_cold": cold,
                "control_cold": control_cold,
                "control_runs": [round(t, 3) for t in control_runs],
            }
        ),
        flush=True,
    )
    spark.stop()
    norm = (
        round(total * CONTROL_REF_SEC / control_warm, 3)
        if control_warm > 0
        else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "control": control_warm,
                "control_ref": CONTROL_REF_SEC,
                "value_ctrl_norm": norm,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
