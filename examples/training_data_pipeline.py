"""End-to-end training-data curation over the documents table:

    raw docs
      → text profile (language ID, quality, token counts)
      → quality floor filter
      → exact dedup (md5 fingerprint, min-id survivor)
      → MinHash/LSH near-dedup (banded candidates → Jaccard confirm)
      → TF-IDF top terms (feature preview)

Every stage is a JVM DataFrame plan from
``cybersecurity_miw_spark.operators``; run it against any sf dir:

    python examples/training_data_pipeline.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, sf_dir: str, quality_floor: float = 0.3) -> DataFrame:
    from cybersecurity_miw_spark.operators import dedup, textstats
    from cybersecurity_miw_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    profiled = textstats.profile(docs)
    quality_ok = profiled.filter(F.col("quality") >= quality_floor)

    exact_unique = dedup.exact_dedup(quality_ok)
    survivors = dedup.near_dedup_minhash(
        exact_unique, threshold=0.8, num_hashes=16, bands=4, shingle_k=3
    )
    return survivors.select(
        "doc_id", "lang_guess", "n_tokens", "quality", "fingerprint"
    )


def main() -> None:
    from cybersecurity_miw_spark.operators import textstats
    from cybersecurity_miw_spark.session import get_spark
    from cybersecurity_miw_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    survivors = curate(spark, sf_dir)
    n_in, n_out = docs.count(), survivors.count()
    print(f"{n_in} docs in -> {n_out} curated "
          f"({n_in - n_out} removed by quality/dedup)")
    survivors.show(5, truncate=False)

    terms = textstats.tfidf_top_terms(
        survivors.join(docs.select("doc_id", "text"), "doc_id"), n=3
    )
    terms.show(9, truncate=False)


if __name__ == "__main__":
    main()
