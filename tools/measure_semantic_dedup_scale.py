"""10× scale evidence for the r11 embedding-family queries
(semantic_dedup, hybrid_rrf_topk).

Embeddings ×10 derivation: per-copy DIMENSION ROTATION (roll the
array by the copy index). Norms are preserved, hashed-text embeddings
are near-random, so cross-copy cosines sit near 0 and near-dup pairs
stay WITHIN copies — the rotated-alphabet trick of the documents
derivation, in embedding space. Plain duplication would plant n-copy
identical clusters and measure a quadratic artifact, not a 10×
workload. Hybrid's dense branch has no self-join, so its 10× corpus
uses plain vec_id-offset copies next to the plain-duplicated
documents (the BM25-correct derivation — see the BM25 sweep note).

semantic_dedup is measured TWO ways at 10×:
* n_planes FIXED (4): bucket occupancy grows 10×, the within-bucket
  pair join grows ~100× — the fixed-parameter cliff, reported on
  purpose;
* n_planes OCCUPANCY-CONSTANT (4 + log2(10) ≈ 7): buckets grow 8×,
  occupancy ~flat, the join stays ~linear — the documented operating
  rule (planes scale with corpus, exactly the IVF cells×corpus
  contract in SCALE.md "ANN cells×probes frontier").
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

BASE = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROT_DIR = f"{ROOT}/.tmp/scale/sf1.0/embeddings.parquet"
PLAIN_DIR = f"{ROOT}/.tmp/scale/sf1.0-plaindoc/embeddings.parquet"
PLAIN_DOCS = f"{ROOT}/.tmp/scale/sf1.0-plaindoc/documents.parquet"
COPIES = 10
DIM = 64


def build(spark) -> None:
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = emb.count()
    vec_t = emb.schema["embedding"].dataType
    rot_parts, plain_parts = [], []
    for i in range(COPIES):
        shifted = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
        plain_parts.append(shifted)
        rolled = (
            shifted.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, DIM - i),
                    F.slice("embedding", 1, i),
                ).cast(vec_t),
            )
            if i
            else shifted
        )
        rot_parts.append(rolled)
    rot, plain = rot_parts[0], plain_parts[0]
    for p in rot_parts[1:]:
        rot = rot.unionByName(p)
    for p in plain_parts[1:]:
        plain = plain.unionByName(p)
    rot.repartition(32).write.mode("overwrite").parquet(ROT_DIR)
    plain.repartition(32).write.mode("overwrite").parquet(PLAIN_DIR)


def timed(fn):
    fn()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    spark = get_spark("semantic-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{ROT_DIR}/_SUCCESS"):
        build(spark)

    base_emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    rot_emb = spark.read.parquet(ROT_DIR)
    plain_emb = spark.read.parquet(PLAIN_DIR)
    base_docs = spark.read.parquet(f"{BASE}/documents.parquet")
    plain_docs = spark.read.parquet(PLAIN_DOCS)
    qvec = [
        float(x)
        for x in base_emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]

    def sd(df, planes):
        return lambda: similarity.semantic_dedup(
            df, dim=DIM, threshold=0.5, n_planes=planes
        ).count()

    def rrf(docs, emb):
        return lambda: retrieval.hybrid_rrf_topk(
            docs, emb, ["table", "join", "window"], qvec, k=20, pool=50
        ).count()

    out = {
        "semantic_dedup_base_p4": timed(sd(base_emb, 4)),
        "semantic_dedup_10x_p4_fixed": timed(sd(rot_emb, 4)),
        "semantic_dedup_10x_p7_occupancy_const": timed(sd(rot_emb, 7)),
        "hybrid_rrf_base": timed(rrf(base_docs, base_emb)),
        "hybrid_rrf_10x_plain": timed(rrf(plain_docs, plain_emb)),
    }
    out["sd_ratio_fixed"] = round(
        out["semantic_dedup_10x_p4_fixed"]
        / (out["semantic_dedup_base_p4"] * COPIES), 3,
    )
    out["sd_ratio_scaled_planes"] = round(
        out["semantic_dedup_10x_p7_occupancy_const"]
        / (out["semantic_dedup_base_p4"] * COPIES), 3,
    )
    out["rrf_ratio"] = round(
        out["hybrid_rrf_10x_plain"] / (out["hybrid_rrf_base"] * COPIES), 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
