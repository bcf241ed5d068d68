"""Same-session A/B for the heavy dedup chain (SCALE.md r9 re-anchor,
VERDICT r8 #4): run minhash_lsh_candidates → jaccard-confirm →
dup_clusters end-to-end under a CHOSEN code checkout and a CHOSEN
MinHash setting, so consecutive invocations on the same machine
separate ambient drift from code delta from recall-setting cost.

Usage:
    python tools/ab_dedup_chain.py <repo_root> <num_hashes> <bands> \
        [sf_dir]

Prints ONE JSON line: median-of-3 and min-of-3 warm wall per stage
(each stage timed end-to-end from the parquet scan, the bench.py
convention — confirm includes candidates, clusters includes both).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    nh = int(sys.argv[2])
    nb = int(sys.argv[3])
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)

    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators import dedup
    from cybersecurity_miw_spark.session import get_spark

    spark = get_spark("ab-dedup-chain")
    spark.sparkContext.setLogLevel("ERROR")

    def chain(stage: str):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cand = dedup.minhash_lsh_candidates(
            docs, num_hashes=nh, bands=nb, shingle_k=3
        )
        if stage == "candidates":
            return cand
        confirmed = dedup.jaccard_pairs(docs, cand, shingle_k=3).filter(
            F.col("jaccard") >= 0.8
        )
        if stage == "confirm":
            return confirmed
        return dedup.dup_clusters(confirmed)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    release = None
    try:
        from cybersecurity_miw_spark.cache import release_intermediates

        release = release_intermediates
    except Exception:
        pass

    out = {}
    for stage in ("candidates", "confirm", "clusters"):
        force(chain(stage))  # warm-up
        if release:
            release()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(chain(stage))
            walls.append(time.perf_counter() - t0)
            if release:
                release()
        walls.sort()
        out[stage] = {
            "median3": round(walls[1], 3),
            "min3": round(walls[0], 3),
        }
    print(json.dumps({
        "repo": repo,
        "num_hashes": nh,
        "bands": nb,
        "sf_dir": sf_dir,
        "stages": out,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
