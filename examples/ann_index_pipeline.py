"""End-to-end embedding index build + query over the embeddings table:

    raw vectors
      → L2 normalize
      → train IVF coarse centroids (bounded driver state)
      → train PQ codebooks (per-subspace integer Lloyd's)
      → build the IVF+PQ index (one Arrow pass: cell + codes,
        ~5 B/vector at m=4 — write it partitioned by _cell)
      → query: probe-pruned ADC shortlist → exact cosine rerank

The shortlist-then-rerank composition is the standard two-stage ANN
pipeline: PQ distances rank a cheap candidate set from code bytes,
exact cosine re-scores only the shortlist. Run against any sf dir:

    python examples/ann_index_pipeline.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    from cybersecurity_miw_spark.operators import similarity
    from cybersecurity_miw_spark.session import get_spark
    from cybersecurity_miw_spark.sources.tables import load_table

    spark = get_spark("ann-index-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    emb = similarity.l2_normalize(load_table(spark, sf_dir, "embeddings"))
    emb = emb.select("vec_id", F.col("embedding_unit").alias("embedding"))

    # --- write side (once per corpus) ---
    # RESIDUAL encoding (codebooks trained on v - centroid[cell]):
    # on clustered corpora raw-vector PQ loses within-cluster
    # resolution and the shortlist dilutes — measured in SCALE.md,
    # residual reaches the IVF-exact recall ceiling at the same cost
    centroids = similarity.train_centroids(emb, n_cells=8, dim=64, iters=2)
    books = similarity.train_pq_codebooks(
        similarity.residual_vectors(emb, centroids),
        dim=64, m=4, k=16, iters=2, vec_col="residual",
    )
    index = similarity.ivf_pq_index(
        emb, centroids, books, residual=True
    ).persist()
    print(f"index rows: {index.count()} (cells + 4-byte PQ codes)")

    # --- query side (per query) ---
    qvec = list(
        emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )
    rerank = similarity.ann_shortlist_rerank(
        emb, index, centroids, books, qvec,
        k=10, shortlist=50, n_probes=2, residual=True,
    )
    print("top-10 after exact rerank of the 50-row ADC shortlist:")
    rerank.show(10, truncate=False)

    # --- day-2: incremental maintenance (no rebuild) ---
    # new vectors append to the persisted cell-partitioned layout
    # with the FROZEN quantizers (FAISS add-after-train); hot cells
    # are later compacted atomically, one partition at a time
    idx_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", "ann_index_example",
    )
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    arriving = emb.filter(F.col("vec_id") % 5 == 0)
    similarity.ivf_pq_index(
        hist, centroids, books, residual=True
    ).write.mode("overwrite").partitionBy("_cell").parquet(idx_dir)
    similarity.append_to_ivf_index(
        arriving, centroids, books, idx_dir, residual=True
    )
    disk = spark.read.parquet(idx_dir)
    print(f"persisted index after append: {disk.count()} rows")
    from cybersecurity_miw_spark.sources.maintain import compact_partition

    n_before = compact_partition(spark, idx_dir, "_cell=0", target_files=1)
    print(f"compacted _cell=0: {n_before} files -> 1")

    # --- text side: no model needed ---
    # the feature-hashing embedding turns raw documents into unit
    # vectors deterministically, so the SAME index machinery serves
    # text near-dup / retrieval without an encoder container
    from cybersecurity_miw_spark.operators.textstats import hashed_embedding

    docs = load_table(spark, sf_dir, "documents")
    text_vecs = hashed_embedding(docs, dim=64).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    tq = list(
        text_vecs.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )
    top = similarity.brute_force_topk(text_vecs, tq, k=5)
    print("text-query top-5 via hashed embeddings (doc 0 as query):")
    top.show(5, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
