"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no output materialization on the driver). The headline set spans the
engine's hot paths: the format-compiler pipeline (tokenize → project →
aggregate), plain relational aggregation, text profiling, exact and
MinHash dedup, and similarity search.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
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


def force(df) -> None:
    """Run the full plan without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


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
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(QUERIES[name](spark, SF_DIR))
        cold[name] = round(time.perf_counter() - t0, 3)

    # Passes 2-3 (timed): steady-state wall time per query, min of two
    # runs — the environment shows multi-second stalls striking random
    # queries (VM scheduling, not the plan), and min-of-2 filters them.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            t0 = time.perf_counter()
            force(QUERIES[name](spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "warmup_passes": 1,
                "value_cold": round(sum(cold.values()), 3),
                "queries_cold": cold,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
