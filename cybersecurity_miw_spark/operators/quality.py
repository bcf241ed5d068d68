"""Data-quality profiling: the ANALYZE/expectations stage a pipeline
runs before trusting a new data drop — per-column null/distinct/range
stats in ONE scan, plus declarative expectation checks over the
profile. All aggregates are algebraic or sketch-based (approx
distinct), so the pass is a single map-side-combined aggregation at
any scale; the profile itself is #columns rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """One-pass per-column profile: rows, nulls, exact distincts,
    min/max (rendered as strings so mixed types share one schema).
    ONE aggregation job computes every column's stats together
    (count_distinct is expanded per column by Catalyst's
    expand-for-distinct — still a single scan); the result is
    #columns rows, unpivoted client-side from the single agg row."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stacks = []
    for c in cols:
        stacks.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").alias("n_rows"),
                (F.col("_rows") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_str"),
                F.col(f"_mx_{c}").alias("max_str"),
            )
        )
    return (
        row.select(F.explode(F.array(*stacks)).alias("s"))
        .select("s.*")
    )


@dataclass(frozen=True)
class Expectation:
    """A declarative check over one column's profile row."""

    column: str
    check: str  # not_null | unique | max_null_fraction | distinct_at_most
    threshold: float | None = None


def check_expectations(
    profile: DataFrame, expectations: list[Expectation]
) -> list[tuple[Expectation, bool, str]]:
    """Evaluate expectations against a :func:`profile_table` result.
    Driver-side over #columns rows (bounded by schema width, never by
    data). Returns (expectation, passed, detail) triples; unknown
    checks and missing columns fail loudly."""
    rows = {r["column"]: r for r in profile.collect()}
    out = []
    for e in expectations:
        if e.column not in rows:
            raise ValueError(f"no profile row for column {e.column!r}")
        r = rows[e.column]
        if e.check == "not_null":
            ok = r["n_null"] == 0
            detail = f"{r['n_null']} nulls"
        elif e.check == "unique":
            ok = r["n_distinct"] == r["n_rows"] - r["n_null"]
            detail = f"{r['n_distinct']} distinct of {r['n_rows']}"
        elif e.check == "max_null_fraction":
            if e.threshold is None:
                raise ValueError("max_null_fraction needs a threshold")
            frac = r["n_null"] / r["n_rows"] if r["n_rows"] else 0.0
            ok = frac <= e.threshold
            detail = f"null fraction {frac:.6f}"
        elif e.check == "distinct_at_most":
            if e.threshold is None:
                raise ValueError("distinct_at_most needs a threshold")
            ok = r["n_distinct"] <= e.threshold
            detail = f"{r['n_distinct']} distinct"
        else:
            raise ValueError(f"unknown check {e.check!r}")
        out.append((e, bool(ok), detail))
    return out
