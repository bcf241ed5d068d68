"""Core-count scaling bench: a compute-heavy query subset at the 10x
rotated-copy scale point (~sf1 equivalent), timed with bench.py's
methodology, at whatever core count ``$SPARK_GRAFT_CPUS`` dictates.

Why this exists (VERDICT r18 #2): the per-round sf0.1 bench is
LATENCY-bound — every query is 0.2-4 s of wall dominated by fixed
driver/job-scheduling cost, so the driver's 8-vs-32-core block reads
~1.0 everywhere and says nothing about parallel scaling. At 10x the
input the compute term dominates and the same 8-vs-32 comparison
separates queries that actually parallelize (ratio well above 1 at 8
cores) from driver-bound ones (~1).

Usage (documented in SCALE.md "Round-19 core-count scaling"):

    SPARK_GRAFT_CPUS=32 python bench_cores.py   # once
    SPARK_GRAFT_CPUS=8  python bench_cores.py   # again

Prints ONE JSON line with the same {metric, value, unit, queries, sf}
contract as bench.py (plus "cpus"), so records are self-describing.
The 10x input is built (or reused) by bench_scale.build_scaled with
core_only=True — alphabet-rotated documents / event-id-offset events,
the same derivation the standing 10x sweep uses (cross-copy shingle
sets disjoint, so dedup workloads grow linearly, not quadratically).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scale import BASE_DIR, SCALE_DIR, build_scaled  # noqa: E402

COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))

# Compute-heavy subset: the format-compiler flagship, the text/langid
# chain, the MinHash family front half + candidates + confirm + CC,
# and wc as the light control-like member. All read only the core
# tables (documents/events) that build_scaled(core_only=True) derives.
QUERY_NAMES = [
    "miw_events_summary",
    "wc_wordcount",
    "text_profile",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "near_dup_jaccard_confirm",
    "dup_clusters_cc",
    "simhash_fingerprints",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from cybersecurity_miw_spark.cache import release_intermediates
    from cybersecurity_miw_spark.catalog import QUERIES
    from cybersecurity_miw_spark.session import get_spark

    spark = get_spark("miw-bench-cores")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if not (
        os.path.exists(f"{SCALE_DIR}/documents.parquet/_SUCCESS")
        and os.path.exists(f"{SCALE_DIR}/events.parquet/_SUCCESS")
    ):
        build_scaled(spark, BASE_DIR, SCALE_DIR, COPIES, core_only=True)

    # warm-up pass (codegen + JIT, untimed), then median of 3 —
    # bench.py's discipline; release_intermediates outside the timed
    # region
    runs: dict[str, list[float]] = {n: [] for n in QUERY_NAMES}
    for name in QUERY_NAMES:
        spark.sparkContext.setJobDescription(f"bench_cores warmup {name}")
        force(QUERIES[name](spark, SCALE_DIR))
        release_intermediates()
    for _ in range(3):
        for name in QUERY_NAMES:
            spark.sparkContext.setJobDescription(f"bench_cores {name}")
            t0 = time.perf_counter()
            force(QUERIES[name](spark, SCALE_DIR))
            runs[name].append(time.perf_counter() - t0)
            release_intermediates()
    timings = {n: round(sorted(ts)[1], 3) for n, ts in runs.items()}
    print(
        json.dumps(
            {
                "metric": "scale10x_queries_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 1.0,
                "cpus": cpus,
                "copies": COPIES,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
