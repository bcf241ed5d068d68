"""ANN recall on CLUSTERED embeddings (the realistic regime).

SCALE.md's original recall table used the sf0.1 embeddings table —
uniform random 64-d vectors, near-orthogonal, the provable worst case
for any space-partitioning index. Real embedding corpora (text/image
encoders) are strongly clustered; this harness generates a mixture of
Gaussians on the unit sphere, deterministic seed, and measures
recall@10 at matched scan fractions for the three index paths:

  - lsh_ann_topk      (hyperplane LSH, multi-probe)
  - ivf_topk          (coarse k-means cells, probe sweep)
  - ann_shortlist_rerank (IVF+PQ ADC shortlist -> exact rerank)

Ground truth is exact cosine computed in numpy on the same vectors
(engine-independent; the Spark exact path is separately oracle-checked
by cosine_brute_topk). Scan fraction is measured, not estimated: the
actual number of corpus rows each probe set admits, divided by corpus
size.

Usage: python bench_ann_recall.py [n_vectors] [out_json]
Prints one JSON line per (method, config) with mean recall@10 and mean
scan fraction over the query set.

Text mode: python bench_ann_recall.py --text [sf_dir] [n_docs] [out]
— the same IVF / residual-IVF+PQ sweep over HASHED-TEXT embeddings of
the documents table (textstats.hashed_embedding, the trained-quantizer
path SCALE.md's text-side table previously covered only for LSH).
Ground truth is exact numpy cosine over the same hashed vectors;
queries are corpus documents (the dedup/similarity-search query
distribution).
"""

from __future__ import annotations

import json
import sys

import numpy as np

N_DEFAULT = 20_000
DIM = 64
N_CLUSTERS = 32
CLUSTER_STD = 0.18
N_QUERIES = 20
K = 10
SEED = 20260814


def make_clustered(n: int, rng: np.random.RandomState) -> np.ndarray:
    """Mixture of Gaussians on the unit sphere: centers ~ N(0,1)
    normalized, points = center + std * noise, then re-normalized."""
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, N_CLUSTERS, size=n)
    pts = centers[assign] + CLUSTER_STD * rng.randn(n, DIM)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def run_text_corpus(fast: bool = False) -> None:
    """IVF / residual-IVF+PQ recall over hashed-text embeddings.

    ``fast`` (--text-fast): evaluate the IVF recall/scan curve
    numpy-side instead of one Spark job per (query, probe) pair. The
    index geometry is identical — centroids still come from the REAL
    Spark ``train_centroids`` operator, and exact-in-cell top-k is by
    definition what ``ivf_topk`` computes (pinned by goldens and
    re-validated here on 3 queries against the live Spark path) — so
    recall and scan fraction are the same numbers ~100x faster. Use
    for large corpora / high cell counts (the 512-cell 10x-corpus
    sweep); the default Spark path remains the end-to-end
    measurement. Fast mode skips the PQ rerank rows (shown lossless
    vs exact-in-cell IVF at 32 and 128 cells in SCALE.md)."""
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    n_cells = int(sys.argv[5]) if len(sys.argv) > 5 else N_CLUSTERS

    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators import similarity
    from cybersecurity_miw_spark.operators.textstats import hashed_embedding
    from cybersecurity_miw_spark.session import get_spark

    spark = get_spark("ann-recall-text")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(n_docs)
    )
    df = (
        hashed_embedding(docs, dim=DIM)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .repartition(32)
        .persist()
    )
    rows = sorted(
        ((r["vec_id"], r["embedding"]) for r in df.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    vecs = np.array([t[1] for t in rows])
    n = len(ids)

    rng = np.random.RandomState(SEED)
    qpos = rng.choice(n, N_QUERIES, replace=False)
    queries = vecs[qpos]
    sims = queries @ vecs.T
    truth = ids[np.argsort(-sims, axis=1)[:, :K]]

    results = []

    def record(method, cfg, recalls, fractions):
        row = {
            "method": method, "corpus": "hashed_text", **cfg, "n": n,
            "recall_at_10": round(float(np.mean(recalls)), 3),
            "recall_min": round(float(np.min(recalls)), 3),
            "scan_fraction": round(float(np.mean(fractions)), 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    def recall_of(got_ids, qi) -> float:
        return len(set(got_ids) & set(truth[qi].tolist())) / K

    centroids = similarity.train_centroids(
        df, n_cells=n_cells, dim=DIM, iters=3
    )
    cents = np.asarray(centroids)
    assigned = np.argmin(
        np.sum(cents * cents, axis=1)[None, :] - 2 * (vecs @ cents.T),
        axis=1,
    )
    cell_sizes = np.bincount(assigned, minlength=n_cells)

    # at high cell counts the interesting regime is deeper probe sets:
    # equal-recall comparisons across n_cells need probe counts that
    # admit comparable scan fractions (512 cells @ 32 probes ~ 128
    # cells @ 8 probes)
    probe_set = (1, 2, 4, 8, 16) if n_cells <= 128 else (4, 8, 16, 32, 64)

    def numpy_ivf_topk(q: np.ndarray, n_probes: int) -> list:
        d2 = np.sum((cents - q) ** 2, axis=1)
        cells = np.argsort(d2)[:n_probes]
        mask = np.isin(assigned, cells)
        cand_ids, cand = ids[mask], vecs[mask]
        cos = (cand @ q) / (
            np.linalg.norm(cand, axis=1) * np.linalg.norm(q) + 1e-12
        )
        return cand_ids[np.argsort(-cos)[:K]].tolist()

    if fast:
        # validate the numpy replica against the live Spark operator
        # on 3 queries before trusting it for the sweep
        for qi in range(3):
            got_spark = {
                r["vec_id"]
                for r in similarity.ivf_topk(
                    df, centroids, queries[qi].tolist(), k=K, n_probes=4
                ).collect()
            }
            got_np = set(numpy_ivf_topk(queries[qi], 4))
            overlap = len(got_spark & got_np)
            assert overlap >= K - 1, (qi, got_spark, got_np)

    for n_probes in probe_set:
        recalls, fracs = [], []
        for qi, q in enumerate(queries):
            d2 = np.sum((cents - q) ** 2, axis=1)
            cells = np.argsort(d2)[:n_probes]
            if fast:
                got = numpy_ivf_topk(q, n_probes)
            else:
                got = [
                    r["vec_id"]
                    for r in similarity.ivf_topk(
                        df, centroids, q.tolist(), k=K, n_probes=n_probes
                    ).collect()
                ]
            recalls.append(recall_of(got, qi))
            fracs.append(int(cell_sizes[cells].sum()) / n)
        record("ivf", {"n_cells": n_cells, "n_probes": n_probes},
               recalls, fracs)

    if fast:
        if out_path:
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
        spark.stop()
        return

    res_df = similarity.residual_vectors(df, centroids)
    res_books = similarity.train_pq_codebooks(
        res_df, dim=DIM, m=8, k=16, iters=3, vec_col="residual"
    )
    res_index = similarity.ivf_pq_index(
        df, centroids, res_books, residual=True
    ).persist()
    res_index.count()
    rerank_set = (
        ((1, 100), (2, 100), (4, 200), (8, 200), (16, 200))
        if n_cells <= 128
        else ((4, 100), (8, 200), (16, 200), (32, 200), (64, 200))
    )
    for n_probes, shortlist in rerank_set:
        recalls, fracs = [], []
        for qi, q in enumerate(queries):
            d2 = np.sum((cents - q) ** 2, axis=1)
            cells = np.argsort(d2)[:n_probes]
            top = similarity.ann_shortlist_rerank(
                df, res_index, centroids, res_books, q.tolist(),
                k=K, shortlist=shortlist, n_probes=n_probes,
                residual=True,
            ).collect()
            recalls.append(recall_of([r["vec_id"] for r in top], qi))
            fracs.append(int(cell_sizes[cells].sum()) / n)
        record(
            "ivf_pq_residual_rerank",
            {"n_cells": n_cells, "n_probes": n_probes,
             "shortlist": shortlist, "m": 8},
            recalls, fracs,
        )
    res_index.unpersist()

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


def run_text_live_point() -> None:
    """ONE live-Spark anchor for the high-cell frontier (VERDICT r8
    #7): the actual ``ivf_topk`` and ``ann_shortlist_rerank``
    operators end-to-end at --text-live [sf_dir] [n_docs] [n_cells]
    [n_probes] — wall-clock (min-of-2 warm per query) + recall + scan
    fraction, so the numpy-evaluated frontier table has a
    Spark-measured point at the same geometry."""
    import time

    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators import similarity
    from cybersecurity_miw_spark.operators.textstats import hashed_embedding
    from cybersecurity_miw_spark.session import get_spark

    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    n_cells = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    n_probes = int(sys.argv[5]) if len(sys.argv) > 5 else 32

    spark = get_spark("ann-live-point")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(n_docs)
    )
    df = (
        hashed_embedding(docs, dim=DIM)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .repartition(32)
        .persist()
    )
    rows = sorted(
        ((r["vec_id"], r["embedding"]) for r in df.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    vecs = np.array([t[1] for t in rows])
    n = len(ids)
    rng = np.random.RandomState(SEED)
    qpos = rng.choice(n, N_QUERIES, replace=False)
    queries = vecs[qpos]
    sims = queries @ vecs.T
    truth = ids[np.argsort(-sims, axis=1)[:, :K]]

    t0 = time.perf_counter()
    centroids = similarity.train_centroids(
        df, n_cells=n_cells, dim=DIM, iters=3
    )
    train_s = round(time.perf_counter() - t0, 2)
    cents = np.asarray(centroids)
    assigned = np.argmin(
        np.sum(cents * cents, axis=1)[None, :] - 2 * (vecs @ cents.T),
        axis=1,
    )
    cell_sizes = np.bincount(assigned, minlength=n_cells)

    def one(method, run_query):
        recalls, fracs, walls = [], [], []
        run_query(queries[0])  # warm the plan
        for qi, q in enumerate(queries):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                got = run_query(q)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            d2 = np.sum((cents - q) ** 2, axis=1)
            cells = np.argsort(d2)[:n_probes]
            recalls.append(
                len(set(got) & set(truth[qi].tolist())) / K
            )
            fracs.append(int(cell_sizes[cells].sum()) / n)
            walls.append(best)
        print(json.dumps({
            "method": method, "live_spark": True, "n": n,
            "n_cells": n_cells, "n_probes": n_probes,
            "recall_at_10": round(float(np.mean(recalls)), 3),
            "scan_fraction": round(float(np.mean(fracs)), 4),
            "wall_per_query_s": round(float(np.median(walls)), 3),
            "centroid_train_s": train_s,
        }), flush=True)

    one("ivf", lambda q: [
        r["vec_id"]
        for r in similarity.ivf_topk(
            df, centroids, q.tolist(), k=K, n_probes=n_probes
        ).collect()
    ])

    res_df = similarity.residual_vectors(df, centroids)
    res_books = similarity.train_pq_codebooks(
        res_df, dim=DIM, m=8, k=16, iters=3, vec_col="residual"
    )
    res_index = similarity.ivf_pq_index(
        df, centroids, res_books, residual=True
    ).persist()
    res_index.count()
    one("ivf_pq_residual_rerank", lambda q: [
        r["vec_id"]
        for r in similarity.ann_shortlist_rerank(
            df, res_index, centroids, res_books, q.tolist(),
            k=K, shortlist=200, n_probes=n_probes, residual=True,
        ).collect()
    ])
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--text-fast":
        run_text_corpus(fast=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--text-live":
        run_text_live_point()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--text":
        run_text_corpus()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators import similarity
    from cybersecurity_miw_spark.session import get_spark

    rng = np.random.RandomState(SEED)
    vecs = make_clustered(n, rng)
    # queries: perturbed corpus points (realistic near-duplicate query
    # distribution), re-normalized
    qidx = rng.choice(n, N_QUERIES, replace=False)
    queries = vecs[qidx] + 0.05 * rng.randn(N_QUERIES, DIM)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # exact ground truth (cosine == dot on unit vectors)
    sims = queries @ vecs.T
    truth = np.argsort(-sims, axis=1)[:, :K]

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    ).repartition(32).persist()
    df.count()

    results = []

    def record(method, cfg, recalls, fractions):
        row = {
            "method": method, **cfg, "n": n,
            "recall_at_10": round(float(np.mean(recalls)), 3),
            "scan_fraction": round(float(np.mean(fractions)), 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    def recall_of(ids, qi) -> float:
        return len(set(ids) & set(truth[qi].tolist())) / K

    # --- LSH (hyperplane) ---
    for n_planes, probe_list in ((8, [1, 5, 9]), (6, [1, 3, 7])):
        bucketed = df.withColumn(
            "_b",
            similarity.hyperplane_bucket(
                F.col("embedding"), DIM, n_planes
            ),
        ).persist()
        bucket_sizes = {
            r["_b"]: r["c"]
            for r in bucketed.groupBy("_b").agg(
                F.count(F.lit(1)).alias("c")
            ).collect()
        }
        for n_probes in probe_list:
            recalls, fracs = [], []
            for qi, q in enumerate(queries):
                qb = similarity.bucket_value(q.tolist(), n_planes)
                probes = ([qb] + [qb ^ (1 << p) for p in range(n_planes)])[
                    : max(1, n_probes)
                ]
                scanned = sum(bucket_sizes.get(b, 0) for b in probes)
                top = similarity.lsh_ann_topk(
                    df, q.tolist(), DIM, k=K,
                    n_planes=n_planes, n_probes=n_probes,
                ).collect()
                recalls.append(recall_of([r["vec_id"] for r in top], qi))
                fracs.append(scanned / n)
            record(
                "lsh", {"n_planes": n_planes, "n_probes": n_probes},
                recalls, fracs,
            )
        bucketed.unpersist()

    # --- IVF (exact within probed cells) ---
    centroids = similarity.train_centroids(
        df, n_cells=N_CLUSTERS, dim=DIM, iters=3
    )
    cents = np.asarray(centroids)
    assigned = np.argmin(
        np.sum(cents * cents, axis=1)[None, :] - 2 * (vecs @ cents.T),
        axis=1,
    )
    cell_sizes = np.bincount(assigned, minlength=N_CLUSTERS)
    for n_probes in (1, 2, 4, 8):
        recalls, fracs = [], []
        for qi, q in enumerate(queries):
            d2 = np.sum((cents - q) ** 2, axis=1)
            cells = np.argsort(d2)[:n_probes]
            top = similarity.ivf_topk(
                df, centroids, q.tolist(), k=K, n_probes=n_probes
            ).collect()
            recalls.append(recall_of([r["vec_id"] for r in top], qi))
            fracs.append(int(cell_sizes[cells].sum()) / n)
        record("ivf", {"n_cells": N_CLUSTERS, "n_probes": n_probes},
               recalls, fracs)

    # --- IVF+PQ shortlist -> exact rerank ---
    books = similarity.train_pq_codebooks(df, dim=DIM, m=8, k=16, iters=3)
    index = similarity.ivf_pq_index(df, centroids, books).persist()
    index.count()
    for n_probes, shortlist in ((1, 100), (2, 100), (4, 200), (8, 200)):
        recalls, fracs = [], []
        for qi, q in enumerate(queries):
            d2 = np.sum((cents - q) ** 2, axis=1)
            cells = np.argsort(d2)[:n_probes]
            top = similarity.ann_shortlist_rerank(
                df, index, centroids, books, q.tolist(),
                k=K, shortlist=shortlist, n_probes=n_probes,
            ).collect()
            recalls.append(recall_of([r["vec_id"] for r in top], qi))
            # code bytes scanned for the probed cells + full vectors
            # for the shortlist
            fracs.append(int(cell_sizes[cells].sum()) / n)
        record(
            "ivf_pq_rerank",
            {"n_cells": N_CLUSTERS, "n_probes": n_probes,
             "shortlist": shortlist, "m": 8},
            recalls, fracs,
        )
    index.unpersist()

    # --- residual IVF+PQ (FAISS IVFPQ encoding) -> exact rerank ---
    res_df = similarity.residual_vectors(df, centroids)
    res_books = similarity.train_pq_codebooks(
        res_df, dim=DIM, m=8, k=16, iters=3, vec_col="residual"
    )
    res_index = similarity.ivf_pq_index(
        df, centroids, res_books, residual=True
    ).persist()
    res_index.count()
    for n_probes, shortlist in ((1, 100), (2, 100), (4, 200), (8, 200)):
        recalls, fracs = [], []
        for qi, q in enumerate(queries):
            d2 = np.sum((cents - q) ** 2, axis=1)
            cells = np.argsort(d2)[:n_probes]
            top = similarity.ann_shortlist_rerank(
                df, res_index, centroids, res_books, q.tolist(),
                k=K, shortlist=shortlist, n_probes=n_probes,
                residual=True,
            ).collect()
            recalls.append(recall_of([r["vec_id"] for r in top], qi))
            fracs.append(int(cell_sizes[cells].sum()) / n)
        record(
            "ivf_pq_residual_rerank",
            {"n_cells": N_CLUSTERS, "n_probes": n_probes,
             "shortlist": shortlist, "m": 8},
            recalls, fracs,
        )
    res_index.unpersist()

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
