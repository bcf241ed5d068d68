"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of repeated joins/aggregations on the same
key (dedup candidate joins, per-user rollups) is the exchange. Writing
the table bucketed by that key moves the shuffle to WRITE TIME, once;
every subsequent join or groupBy on the bucket key is then
exchange-free (Spark reads each bucket as one partition and both sides
line up).

Spark bucketing requires a saved table (``saveAsTable``), not a bare
parquet path — the bucket metadata lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-bucketed)
    catalog table. ``n_buckets`` should be sized so one bucket fits an
    executor's working memory at the target scale."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata applies automatically)."""
    return spark.table(table)
