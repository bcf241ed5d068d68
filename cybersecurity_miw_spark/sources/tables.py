"""Parquet table loaders for the synthetic benchmark tables
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.

``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
rejects by default (PARQUET_TYPE_ILLEGAL); we flip the documented
``spark.sql.legacy.parquet.nanosAsLong`` escape hatch and rebuild a
proper timestamp from the nano count with integer arithmetic (``div``,
not ``/`` — double division loses precision on ~1.7e18 nanos). The
session timezone is pinned to UTC so date rendering is deterministic
regardless of the caller's session defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a real TimestampType column."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
