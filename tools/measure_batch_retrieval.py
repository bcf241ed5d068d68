"""Batched-retrieval amortization at the 10x corpus (r12): N queries
through hybrid_rrf_topk_batch (one BM25 corpus pass + one IVF index
scan for the whole batch) vs N separate hybrid_rrf_topk(dense="ann")
jobs — the retrieval twin of the measured 24x ivf_topk_batch point.
Writes one JSON line; transcribe into SCALE.md."""

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

SCALE = "/root/repo/.tmp/scale/sf1.0-plaindoc"
N_QUERIES = int(sys.argv[1]) if len(sys.argv) > 1 else 25
DIM = 64


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("r12-batch-retrieval")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SCALE}/documents.parquet").select(
        "doc_id", "text"
    ).persist()
    emb = spark.read.parquet(f"{SCALE}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).persist()
    n_docs, n_vecs = docs.count(), emb.count()
    cents = similarity.train_centroids(
        emb, similarity.suggested_cells(n_vecs), DIM, iters=2
    )

    # query battery: terms drawn from the corpus, vectors from rows
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.limit(N_QUERIES).collect()
    }
    term_pool = [
        r["w"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).groupBy("w").count()
        .orderBy(F.desc("count")).limit(3 * N_QUERIES).collect()
    ]
    # the synthetic vocabulary is small (~31 words) — cycle it so
    # every query gets 3 real terms
    queries = [
        (
            qid,
            [term_pool[(3 * i + j) % len(term_pool)] for j in range(3)],
            qvecs[qid],
        )
        for i, qid in enumerate(sorted(qvecs))
    ]
    qdf = spark.createDataFrame(
        queries,
        "query_id long, terms array<string>, query_vec array<double>",
    )

    # warm both paths once
    force(retrieval.hybrid_rrf_topk_batch(
        docs, emb, qdf, cents, k=10, pool=50, n_probes=16))
    force(retrieval.hybrid_rrf_topk(
        docs, emb, queries[0][1], queries[0][2], k=10, pool=50,
        dense="ann", centroids=cents, n_probes=16))

    t0 = time.perf_counter()
    force(retrieval.hybrid_rrf_topk_batch(
        docs, emb, qdf, cents, k=10, pool=50, n_probes=16))
    t_batch = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _, terms, qv in queries:
        force(retrieval.hybrid_rrf_topk(
            docs, emb, terms, qv, k=10, pool=50,
            dense="ann", centroids=cents, n_probes=16))
    t_loop = time.perf_counter() - t0

    print(json.dumps({
        "measure": "hybrid_batch_amortization",
        "n_docs": n_docs, "n_vectors": n_vecs, "n_queries": N_QUERIES,
        "wall_batch_s": round(t_batch, 3),
        "wall_per_query_loop_s": round(t_loop, 3),
        "speedup": round(t_loop / max(t_batch, 1e-9), 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
