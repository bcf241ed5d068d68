"""Snapshot reconciliation: the CDC-shaped diff of two table
versions — which keys were added, removed, or changed between
yesterday's snapshot and today's. The audit primitive behind
"what did this ingestion run actually change" and the validation
step after a backfill or migration.

One full outer join on the key (both sides shuffle-partitioned the
same way — co-partitioned at scale if the snapshots share a bucketed
layout), then a null-pattern classification. Compare columns are
checked null-safely (``<=>``), so NULL→value and value→NULL count as
changes while NULL→NULL does not.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Rows keyed by ``key_cols`` classified as ``added`` (key only
    in ``new``), ``removed`` (only in ``old``), or ``changed`` (in
    both, any ``compare_cols`` differing under null-safe equality).
    Unchanged keys are dropped — the diff is the output, and at scale
    it is vastly smaller than either snapshot. Output: key columns,
    ``change_type``, and ``old_<c>`` / ``new_<c>`` per compare
    column."""
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=list(key_cols), how="full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    change = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~same, "changed")
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
