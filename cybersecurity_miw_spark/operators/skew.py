"""Skew-handling utilities: salted join and salted two-phase
aggregation.

AQE's skew-join splitting (on in session.py) handles most hot-key
joins at runtime, but it only splits *partitions*, post-shuffle, and
only for sort-merge joins it can see. These utilities are the explicit
form for the cases AQE can't reach — a single key so hot it dominates
its partition (one IP scanning a /8, one null-ish default user_id), or
an aggregation whose per-key state is heavy enough that one reducer
becomes the straggler.

The mechanics are the textbook ones, expressed as narrow Spark
transforms:

* **salted_join** — the big side gets a per-row salt in [0, n), the
  small side is replicated n times (one copy per salt), and the join
  key becomes (key, salt): the hot key's rows now land on n reducers
  instead of one. Replication multiplies the small side by n, so keep
  it for genuinely small-but-over-broadcast-threshold sides.
* **salted_aggregate** — algebraic aggregations pre-reduce on
  (keys, salt), then combine on keys. Spark's hash-aggregate already
  partially combines map-side, so this pays only when per-key state
  is too big for one reducer (huge count-distinct sketches, wide
  collect buffers); for plain sums prefer a bare groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Uniform per-row salt in [0, n_salts). rand(seed) keeps the
    column deterministic per task for retries; the salt value never
    reaches results, so distribution uniformity is all that matters."""
    return df.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a small side by spreading
    every key over ``n_salts`` reducers.

    The small side is exploded once per salt (a narrow `explode` of a
    literal range — no shuffle added beyond the join's own), so its
    shuffled volume is n_salts * |small|: use when the small side
    overflows the broadcast threshold but a hot key still melts one
    reducer. Result columns match ``big.join(small, on, how)``."""
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, n_salts)
    s = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return b.join(s, [*keys, SALT_COL], how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase algebraic aggregation with an explicit salt stage:
    groupBy(keys + salt) partial-reduces each hot key on n_salts
    reducers, then groupBy(keys) combines the partials.

    ``aggs`` maps output column name -> partial aggregation expression;
    supported combiners are inferred from the expression's function
    (sum/count -> sum, min -> min, max -> max). count becomes a sum of
    partial counts in phase 2 — the standard algebraic decomposition.
    """
    partial = with_salt(df, n_salts).groupBy(*keys, SALT_COL).agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )

    def combiner(name: str, col: Column) -> Column:
        fn = _combiner_fn(col)
        return fn(F.col(f"_p_{name}")).alias(name)

    return partial.groupBy(*keys).agg(
        *[combiner(name, c) for name, c in aggs.items()]
    )


def _combiner_fn(partial_expr: Column):
    """Pick the phase-2 combiner from the phase-1 expression."""
    text = str(partial_expr).lower()
    if text.startswith("column<'min("):
        return F.min
    if text.startswith("column<'max("):
        return F.max
    if text.startswith(("column<'sum(", "column<'count(")):
        return F.sum
    raise ValueError(
        f"salted_aggregate only combines algebraic sum/count/min/max "
        f"partials; got {text!r} — decompose mean/variance into "
        "sum+count first (the format compiler does exactly this)"
    )
