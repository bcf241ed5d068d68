"""Window-function operators: gap-based sessionization and top-N per
key — the two window shapes a large-scale log/training pipeline
actually runs (the reference has no window operators, SURVEY §2 W1;
these are part of the beyond-reference surface).

Both are single-shuffle plans: one hash exchange on the partition key,
then sorted evaluation within partitions — Spark's WindowExec with
rank/lag is the exact physical analog of the reference's per-key
sorted merge, but distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_s(c: Column) -> Column:
    """Epoch seconds for TIMESTAMP or TIMESTAMP_NTZ input (the parquet
    writer controls which one the scan infers; NTZ forbids a direct
    long cast). The session timezone is pinned UTC (session.py), so
    the NTZ→LTZ hop is the identity mapping DuckDB's epoch() uses."""
    return c.cast("timestamp_ltz").cast("long")


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-breaks formulation — one window
    partition per key, no self-join. Adds ``session_id`` (0-based per
    key, in time order)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(ts_col).over(w)
    is_break = (
        prev_ts.isNull()
        | (
            _epoch_s(F.col(ts_col)) - _epoch_s(prev_ts)
            > gap_minutes * 60
        )
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_summary(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per (key, session): event count and start/end epoch
    seconds. Downstream of :func:`sessionize`; the groupBy reuses the
    session window's hash partitioning on the key."""
    s = sessionize(df, key_col, ts_col, gap_minutes, tiebreak_col)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_epoch_s(F.col(ts_col))).alias("start_s"),
        F.max(_epoch_s(F.col(ts_col))).alias("end_s"),
    )


def top_n_per_key(
    df: DataFrame,
    n: int,
    key_col: str,
    order_col: str,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The newest/largest N rows per key via row_number — the
    distributed "latest N events per user" primitive. Deterministic
    under ties via ``tiebreak_col``."""
    oc: Column = F.desc(order_col) if descending else F.asc(order_col)
    order = [oc] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Backward (inclusive) as-of join: each left row picks the right
    row with the greatest ``right_ts <= left_ts`` for the same key —
    point-in-time enrichment (latest config snapshot, latest price,
    latest model version at event time).

    Spark has no AsofJoin operator; the naive range-condition join
    degenerates to a per-key cross product. The scalable shape is the
    union + sorted carry-forward: tag both sides, union them, and in
    ONE window pass over (key, ts) carry the most recent right-side
    values forward with last(ignorenulls) — exactly one hash exchange
    on the key, no range explosion, no skew beyond the key's own
    cardinality. Ties at equal ts order the right row first, so a
    snapshot AT the event time is visible (inclusive semantics,
    matching DuckDB's ASOF ``>=``); multiple right rows sharing
    (key, ts) are broken by the last right column set in sort order.

    Returns every left row plus ``right_cols`` (null when no earlier
    right row exists).
    """
    if not right_cols:
        raise ValueError("right_cols must name the columns to carry")
    lcols = [c for c in left.columns]
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_c_{c}").alias(f"asof_{c}") for c in right_cols],
    )
