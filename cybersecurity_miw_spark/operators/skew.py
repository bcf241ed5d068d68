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
    if SALT_COL in df.columns:
        raise ValueError(
            f"input already has a {SALT_COL!r} column — salting would "
            "silently overwrite and then drop it; rename it first"
        )
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
    reducer. Result columns match ``big.join(small, on, how)``.

    Only join types whose unmatched-row semantics survive small-side
    replication are allowed (inner/left/semi/anti): a right or full
    join would emit every unmatched small-side row once PER SALT."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "left_semi", "leftsemi", "anti", "left_anti",
               "leftanti"}
    if how.lower() not in allowed:
        # 'cross' is also rejected: a caller wanting a cross join has
        # no equi-keys to salt, and passing it here would silently
        # execute as an inner join on [keys, salt]
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating "
            "the small side would duplicate its unmatched rows "
            "n_salts times for right/full joins — use AQE skew "
            "handling or swap the sides"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if SALT_COL in small.columns:
        raise ValueError(
            f"small side already has a {SALT_COL!r} column — rename it "
            "before salting"
        )
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


def _is_distinct(partial_expr: Column) -> bool:
    """Structural DISTINCT detection: Spark 4's Column repr renders
    count_distinct('v') as plain "count(v)", so string sniffing alone
    would silently admit it — ask the unresolved function node
    directly (isDistinct), with the repr check kept as a fallback for
    Column implementations without ``_jc``."""
    try:
        return bool(partial_expr._jc.node().isDistinct())
    except Exception:
        return "distinct" in str(partial_expr).lower()


def _combiner_fn(partial_expr: Column):
    """Pick the phase-2 combiner from the phase-1 expression."""
    text = str(partial_expr).lower()
    if _is_distinct(partial_expr):
        # sum-of-per-salt-distinct-counts double-counts values that
        # appear under multiple salts — DISTINCT is not algebraic
        # over a salt split
        raise ValueError(
            f"salted_aggregate cannot combine DISTINCT aggregates "
            f"({text!r}): a value seen under several salts would be "
            "counted once per salt — pre-deduplicate, then aggregate"
        )
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
