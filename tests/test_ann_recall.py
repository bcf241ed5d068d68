"""ANN quality goldens on CLUSTERED synthetic embeddings — the
regime bench_ann_recall.py measures and SCALE.md documents. Uniform
random vectors (the sf tables) are the worst case for any
space-partitioning index; clustered corpora are what training-data
pipelines actually index, and recall claims must hold there.

Deterministic: numpy RandomState(seed), no wall-clock dependence.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import similarity

DIM = 32
N = 2000
N_CLUSTERS = 16
K = 10
SEED = 1234


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(SEED)
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.randint(0, N_CLUSTERS, size=N)] + 0.15 * rng.randn(
        N, DIM
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id bigint, embedding array<double>",
    ).persist()
    df.count()
    queries = pts[rng.choice(N, 5, replace=False)] + 0.03 * rng.randn(
        5, DIM
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    truth = np.argsort(-(queries @ pts.T), axis=1)[:, :K]
    yield df, queries, truth
    df.unpersist()


@pytest.fixture(scope="module")
def index(clustered):
    df, _, _ = clustered
    centroids = similarity.train_centroids(
        df, n_cells=N_CLUSTERS, dim=DIM, iters=2
    )
    books = similarity.train_pq_codebooks(df, dim=DIM, m=4, k=16, iters=2)
    idx = similarity.ivf_pq_index(df, centroids, books).persist()
    idx.count()
    yield centroids, books, idx
    idx.unpersist()


def test_rerank_with_all_probes_and_full_shortlist_is_exact(
    clustered, index
):
    """ann_shortlist_rerank degenerates to exact brute-force search
    when nothing is pruned — same ids, same scores."""
    df, queries, _ = clustered
    centroids, books, idx = index
    q = queries[0].tolist()
    exact = similarity.brute_force_topk(df, q, k=K).collect()
    two_stage = similarity.ann_shortlist_rerank(
        df, idx, centroids, books, q,
        k=K, shortlist=N, n_probes=N_CLUSTERS,
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in two_stage] == [
        (r["vec_id"], r["cos_sim"]) for r in exact
    ]


def test_ivf_recall_floor_on_clustered_data(clustered):
    """The SCALE.md claim: on clustered data IVF with a small probe
    budget reaches >=0.9 mean recall@10 (vs 0.1-0.4 on the uniform
    worst case). 4/16 cells probed = ~25% scan."""
    df, queries, truth = clustered
    centroids = similarity.train_centroids(
        df, n_cells=N_CLUSTERS, dim=DIM, iters=2
    )
    recalls = []
    for qi, q in enumerate(queries):
        top = similarity.ivf_topk(
            df, centroids, q.tolist(), k=K, n_probes=4
        ).collect()
        got = {r["vec_id"] for r in top}
        recalls.append(len(got & set(truth[qi].tolist())) / K)
    assert float(np.mean(recalls)) >= 0.9, recalls


def test_rerank_recall_matches_ivf_at_same_probes(clustered, index):
    """The exact-rerank stage must recover ALL of PQ's quantization
    loss: recall of (ADC shortlist -> exact rerank) equals recall of
    exact-within-probed-cells IVF at the same probe budget, provided
    the shortlist comfortably exceeds k."""
    df, queries, truth = clustered
    centroids, books, idx = index
    for qi, q in enumerate(queries):
        ivf_ids = {
            r["vec_id"]
            for r in similarity.ivf_topk(
                df, centroids, q.tolist(), k=K, n_probes=2
            ).collect()
        }
        rr_ids = {
            r["vec_id"]
            for r in similarity.ann_shortlist_rerank(
                df, idx, centroids, books, q.tolist(),
                k=K, shortlist=100, n_probes=2,
            ).collect()
        }
        t = set(truth[qi].tolist())
        assert len(rr_ids & t) >= len(ivf_ids & t) - 1, (
            qi, len(rr_ids & t), len(ivf_ids & t)
        )


def test_ivf_assign_arrow_equals_expression_path(spark):
    """The Arrow matmul assignment (high-cell-count path) must agree
    cell-for-cell with the literal-expression argmin, including tie
    handling and null/wrong-length vectors."""
    import numpy as np

    from cybersecurity_miw_spark.operators import similarity

    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 8).round(3)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [(900, None), (901, [1.0, 2.0])]  # unassignable
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cents = [[float(x) for x in c] for c in rng.randn(10, 8).round(3)]
    expr = {
        r["vec_id"]: r["_cell"]
        for r in similarity.ivf_assign(df, cents).collect()
    }
    arrow = {
        r["vec_id"]: r["_cell"]
        for r in similarity.ivf_assign_arrow(df, cents).collect()
    }
    valid = {i for i, _ in rows[:200]}
    assert {k: expr[k] for k in valid} == {k: arrow[k] for k in valid}
    assert arrow[900] is None and arrow[901] is None
