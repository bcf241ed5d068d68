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

import os

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

# A widening repartition only pays when the per-row work above it is
# expensive; "auto" additionally requires the table to be big enough
# that a single-threaded scan would dominate (measured at sf0.1:
# widening took minhash_signatures 1.83 s -> 0.93 s but wc_wordcount
# 0.36 s -> 0.79 s — the query, not the table, knows which side it is
# on, hence the tri-state below).
_WIDEN_AUTO_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_WIDEN_MIN_BYTES", str(64 * 1024 * 1024))
)


# memoized parquet footer stats: repeated query construction over the
# same table must not re-pay metadata reads
_PARQUET_STATS: dict[str, tuple[int, int]] = {}

# memoized parquet READER plans, keyed by (applicationId, path): a
# session-level table registry (what spark.table() gives catalog
# tables). spark.read.parquet re-runs driver-side footer/schema
# inference on every call (~0.1 s per table locally; listing-bound on
# object stores) even though the benchmark tables are immutable for
# the life of a session. The memo stores the LAZY DataFrame plan only
# — no rows are cached or persisted; every action still scans the
# parquet files in full (same PushedFilters/ReadSchema, same plan).
_READER_MEMO: dict[str, DataFrame] = {}
# single-app dict cleared on app change (the derive.memo_for_app
# discipline, ADVICE r18): per-app keys never evicted dead
# applications' plans in a driver that restarts sessions
_READER_MEMO_APP: str | None = None


def _read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    global _READER_MEMO_APP
    from cybersecurity_miw_spark.operators.derive import memo_for_app

    app = spark.sparkContext.applicationId
    _READER_MEMO_APP = memo_for_app(_READER_MEMO, _READER_MEMO_APP, app)
    df = _READER_MEMO.get(path)
    if df is None:
        df = spark.read.parquet(path)
        _READER_MEMO[path] = df
    return df


def _parquet_stats(path: str) -> tuple[int, int] | None:
    """(total row groups, total bytes) for the parquet file/directory
    at ``path`` (local filesystem only), via footer metadata — no
    Spark job, no py4j. None when the layout can't be inspected
    (remote FS, odd extensions); callers then skip the widening
    decision."""
    if path in _PARQUET_STATS:
        return _PARQUET_STATS[path]
    try:
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
        size = sum(os.path.getsize(f) for f in files)
    except Exception:
        return None
    _PARQUET_STATS[path] = (n, size)
    return n, size


def ensure_parallelism(
    df: DataFrame,
    path: str,
    min_parts: int | None = None,
    min_bytes: int = 0,
) -> DataFrame:
    """Round-robin repartition IF the scan yields fewer splits than the
    cluster has cores (and the input exceeds ``min_bytes``).

    Parquet split planning is row-group bound: a single file written as
    one row group scans as ONE task no matter how many cores exist, so
    every expression above it runs single-threaded (the local testdata
    files are exactly this shape). One exchange of the raw bytes
    restores full parallelism for the expensive projections above.
    On a real cluster reading many files/row groups the scan already
    has >= defaultParallelism splits and this is a no-op — the analog
    of the reference's memory-aware autosplit (miw/mr_job.cc splitter),
    expressed as Spark partitioning instead of a custom reader.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    stats = _parquet_stats(path)
    if stats is not None and stats[0] < target and stats[1] >= min_bytes:
        return df.repartition(target)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool | None = None
) -> DataFrame:
    """Load a benchmark table.

    ``widen`` controls the under-split protection of
    :func:`ensure_parallelism`:

    * ``True`` — force when row groups < cores. For callers about to
      run expensive per-row work (hash families, shingling, vector
      folds) where a serial scan loses even on small inputs.
    * ``None`` (auto, default) — widen only when the table ALSO
      exceeds ``SPARK_GRAFT_WIDEN_MIN_BYTES`` (64 MB): a giant
      single-row-group file must never serialize a 1000-core cluster,
      but shuffling a few MB to save a sub-second serial scan is a
      pure tax.
    * ``False`` — never (broadcast sides, plain scan+aggs whose
      partial aggregation is already cheaper than a full-row
      exchange).
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = load_events(spark, sf_dir)
    else:
        df = _read_parquet_memo(spark, path)
    if widen is True:
        df = ensure_parallelism(df, path)
    elif widen is None:
        df = ensure_parallelism(df, path, min_bytes=_WIDEN_AUTO_MIN_BYTES)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a real TimestampType column."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, f"{sf_dir}/events.parquet#ts")
    memo = _READER_MEMO.get(key)
    if memo is not None:
        return memo
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _READER_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
