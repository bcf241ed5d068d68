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

# Tables that feed compute-heavy projections (regex profiling,
# minhash, shingling, cosine folds): there the one-off exchange is
# repaid many times over by parallelizing the per-row work above it.
# orders/lineitem deliberately stay out — they only feed columnar
# scan+agg/join plans where partial aggregation above a narrow scan is
# already cheaper than shuffling full rows (measured: widening lineitem
# at sf0.1 took tpch_q1 from 0.54 s to 2.98 s). Dimension tables stay
# un-widened: they are broadcast sides.
_WIDE_TABLES = frozenset({"events", "documents", "embeddings"})


# memoized parquet row-group counts: repeated query construction over
# the same table must not re-pay metadata reads
_ROW_GROUPS: dict[str, int] = {}


def _parquet_row_groups(path: str) -> int | None:
    """Total row groups across the parquet file/directory at ``path``
    (local filesystem only), via footer metadata — no Spark job, no
    py4j. Returns None when the layout can't be inspected (remote FS,
    odd extensions); callers then skip the widening decision."""
    if path in _ROW_GROUPS:
        return _ROW_GROUPS[path]
    try:
        import os

        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        else:
            files = [path]
        n = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
    except Exception:
        return None
    _ROW_GROUPS[path] = n
    return n


def ensure_parallelism(
    df: DataFrame, path: str, min_parts: int | None = None
) -> DataFrame:
    """Round-robin repartition IF the scan yields fewer splits than the
    cluster has cores.

    Parquet split planning is row-group bound: a single file written as
    one row group scans as ONE task no matter how many cores exist, so
    every expression above it runs single-threaded (the local testdata
    files are exactly this shape). One cheap exchange of the raw bytes
    restores full parallelism for the expensive projections above.
    On a real cluster reading many files/row groups the scan already
    has >= defaultParallelism splits and this is a no-op — the analog
    of the reference's memory-aware autosplit (miw/mr_job.cc splitter),
    expressed as Spark partitioning instead of a custom reader.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    groups = _parquet_row_groups(path)
    if groups is not None and groups < target:
        return df.repartition(target)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = True
) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(path)
    if widen and name in _WIDE_TABLES:
        df = ensure_parallelism(df, path)
    return df


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
