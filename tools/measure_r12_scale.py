"""Round-12 scale measurements (VERDICT r11 #2/#4/#5 done-criteria):

1. Hybrid RRF dense-branch A/B at 10x (50k vectors): brute full-scan
   vs the new dense="ann" IVF probe-pruned branch — wall time and the
   dense branch's measured scan FRACTION (rows in probed cells /
   corpus), at the bench_ann_recall geometry (cells from
   suggested_cells(n), the 512-cell frontier point).
2. ivf_topk_batch beyond the broadcast cap: a corpus-sized query
   table (50k queries x 50k corpus, the k-NN-graph shape) through the
   new _cell shuffle route, vs the broadcast route on a 10k slice —
   per-query rate comparison.
3. The r11 fixed-vs-scaled semantic_dedup A/B re-run THROUGH
   suggested_planes: n_planes=4 (fixed) vs suggested_planes(n)
   (the helper must reproduce the documented 0.32 -> 0.12 shape).

Writes one JSON line per measurement; transcribe into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from cybersecurity_miw_spark.operators import retrieval, similarity  # noqa: E402
from cybersecurity_miw_spark.session import get_spark  # noqa: E402

SCALE = "/root/repo/.tmp/scale"
DIM = 64


def wall(fn, warm=1, runs=2):
    for _ in range(warm):
        fn()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("r12-scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SCALE}/sf1.0-plaindoc/documents.parquet")
    emb = spark.read.parquet(
        f"{SCALE}/sf1.0-plaindoc/embeddings.parquet"
    ).select("vec_id", "embedding").persist()
    n = emb.count()

    # ---- 1. hybrid dense branch: brute vs ann --------------------
    n_cells = similarity.suggested_cells(n)
    n_probes = max(1, n_cells // 16)  # the 512/32 frontier proportion
    cents = similarity.train_centroids(emb, n_cells, DIM, iters=2)
    qvec = [float(x) for x in emb.limit(1).head()["embedding"]]
    terms = ["table", "join", "window"]

    t_brute = wall(lambda: force(retrieval.hybrid_rrf_topk(
        docs, emb, terms, qvec, k=20, pool=50)))
    t_ann = wall(lambda: force(retrieval.hybrid_rrf_topk(
        docs, emb, terms, qvec, k=20, pool=50,
        dense="ann", centroids=cents, n_probes=n_probes)))
    # measured scan fraction of the pruned dense branch
    assigned = similarity.ivf_assign(emb, cents, "embedding")
    d2 = sorted(
        (sum((a - b) ** 2 for a, b in zip(qvec, c)), i)
        for i, c in enumerate(cents)
    )
    probe_cells = [i for _, i in d2[:n_probes]]
    scanned = assigned.filter(F.col("_cell").isin(probe_cells)).count()
    print(json.dumps({
        "measure": "hybrid_dense_branch_10x", "n_vectors": n,
        "n_cells": n_cells, "n_probes": n_probes,
        "wall_brute_s": t_brute, "wall_ann_s": t_ann,
        "dense_rows_scored_ann": scanned,
        "scan_fraction": round(scanned / n, 4),
    }), flush=True)

    # ---- 2. batched IVF beyond the broadcast cap -----------------
    queries_all = emb  # corpus-sized query table: the k-NN graph shape
    t_shuffle = wall(lambda: force(similarity.ivf_topk_batch(
        emb, queries_all, cents, k=10, n_probes=4)), warm=1, runs=1)
    q10k = emb.filter(F.col("vec_id") < 10_000)
    t_bcast = wall(lambda: force(similarity.ivf_topk_batch(
        emb, q10k, cents, k=10, n_probes=4)), warm=1, runs=1)
    print(json.dumps({
        "measure": "ivf_topk_batch_shuffle_route", "n_corpus": n,
        "n_queries_shuffle": n, "wall_shuffle_s": t_shuffle,
        "ms_per_query_shuffle": round(1000 * t_shuffle / n, 3),
        "n_queries_broadcast": 10_000, "wall_broadcast_s": t_bcast,
        "ms_per_query_broadcast": round(1000 * t_bcast / 10_000, 3),
        "n_probes": 4, "n_cells": n_cells,
    }), flush=True)

    # ---- 3. fixed vs suggested_planes through the helper ---------
    emb_rot = spark.read.parquet(
        f"{SCALE}/sf1.0/embeddings.parquet"
    ).select("vec_id", "embedding").persist()
    n_rot = emb_rot.count()
    planes = similarity.suggested_planes(n_rot)
    t_fixed = wall(lambda: force(similarity.semantic_dedup(
        emb_rot, dim=DIM, threshold=0.5, n_planes=4)))
    t_sched = wall(lambda: force(similarity.semantic_dedup(
        emb_rot, dim=DIM, threshold=0.5, n_planes=planes)))
    print(json.dumps({
        "measure": "semantic_dedup_suggested_planes_ab", "n": n_rot,
        "suggested_planes": planes, "wall_fixed4_s": t_fixed,
        "wall_suggested_s": t_sched,
        "speedup": round(t_fixed / max(t_sched, 1e-9), 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
