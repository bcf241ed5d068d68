"""Event-sequence pattern matching: the CEP/MATCH_RECOGNIZE-shaped
operators a security/product analytics pipeline runs on ordered
per-entity event streams — contiguous-sequence detection (lead-based)
and skip-till-next funnel staging (sequential conditional minima).
The reference has no ordered-event operators (its aggregation model
is orderless merge — SURVEY §2.4); both are beyond-reference surface,
designed for the single-hash-exchange shapes Spark executes well.

Contiguous match: "A immediately followed by B (immediately followed
by C...) within T" — one WindowExec pass per key (lead(type, i),
lead(ts, n-1)), no joins, no state beyond the window frame. The
per-key sort is the same cost sessionization already pays.

Funnel: "first A, then first B strictly after it (within T of it),
then first C..." — skip-till-next-match semantics. Implemented as a
narrow type pre-filter (only the stage types survive the scan),
repartitioned ONCE on the key, then one conditional-min aggregation
per stage joined back co-partitioned: memory stays bounded per key
(no collect_list of a user's whole history — a power user with 10^7
events would OOM an array fold; the agg shape never materializes
per-key arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cybersecurity_miw_spark.cache import tracked_persist
from cybersecurity_miw_spark.operators.windows import _epoch_s


def match_contiguous_sequence(
    df: DataFrame,
    pattern: tuple[str, ...],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """Occurrences of ``pattern`` as CONSECUTIVE events of one key in
    (ts, id) order, optionally bounded by ``within_seconds`` from
    first to last event. Emits one row per match start: key, the
    starting ``id_col``, and start/end epoch seconds.

    Ties at equal ts are broken by ``id_col`` — the same total order
    sessionize uses, so "consecutive" is well-defined.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    n = len(pattern)
    cond = F.col(type_col) == pattern[0]
    for i in range(1, n):
        cond = cond & (F.lead(type_col, i).over(w) == pattern[i])
    end_ts = F.lead(ts_col, n - 1).over(w)
    if within_seconds is not None:
        cond = cond & (
            _epoch_s(end_ts) - _epoch_s(F.col(ts_col)) <= within_seconds
        )
    return (
        df.select(key_col, ts_col, id_col, type_col)
        .withColumn("_hit", cond)
        .withColumn("_end", end_ts)
        .where(F.col("_hit"))
        .select(
            key_col,
            F.col(id_col),
            _epoch_s(F.col(ts_col)).alias("start_s"),
            _epoch_s(F.col("_end")).alias("end_s"),
        )
    )


def funnel_stages(
    df: DataFrame,
    stages: tuple[str, ...],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    stage_within_seconds: int | None = None,
) -> DataFrame:
    """Skip-till-next-match funnel: per key, stage 0 reaches at its
    first event of ``stages[0]``; stage i reaches at the first event
    of ``stages[i]`` STRICTLY after stage i-1's reach time (and within
    ``stage_within_seconds`` of it, when set). Emits one row per key
    that reached stage 0: ``<stage>_s`` epoch seconds per stage (null
    when unreached; duplicate stage names get a positional suffix)
    and ``depth`` = stages reached.

    Scale shape: events filter to the stage types (narrow projection,
    three columns), repartition on the key, and PERSIST — without the
    persist Catalyst pushes each stage's type filter below the
    repartition, turning the shared subtree into one raw scan per
    stage (3x the read at 100 TB). Each stage is then a
    conditional-min agg over the cached co-partitioned rows joined
    back on the key — the stage tables only shrink, and no per-key
    history is ever materialized.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    names = []
    for i, s in enumerate(stages):
        names.append(f"{s}_s" if s not in stages[:i] else f"{s}_{i}_s")

    ev = tracked_persist(
        df.where(F.col(type_col).isin(list(stages)))
        .select(
            F.col(key_col).alias("_k"),
            _epoch_s(F.col(ts_col)).alias("_t"),
            F.col(type_col).alias("_ty"),
        )
        .repartition("_k")
    )
    reached = (
        ev.where(F.col("_ty") == stages[0])
        .groupBy("_k")
        .agg(F.min("_t").alias(names[0]))
    )
    for i in range(1, len(stages)):
        prev = names[i - 1]
        nxt = (
            ev.where(F.col("_ty") == stages[i])
            .join(reached.select("_k", prev), on="_k")
            .where(
                (F.col("_t") > F.col(prev))
                & (
                    F.lit(True)
                    if stage_within_seconds is None
                    else F.col("_t") <= F.col(prev) + stage_within_seconds
                )
            )
            .groupBy("_k")
            .agg(F.min("_t").alias(names[i]))
        )
        reached = reached.join(nxt, on="_k", how="left")
    depth = sum(
        (F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in names),
        F.lit(0),
    )
    return reached.select(
        F.col("_k").alias(key_col), *names, depth.cast("long").alias("depth")
    )


def match_star_sequence(
    df: DataFrame,
    first: str,
    middle: str,
    last: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Kleene-star pattern ``first middle* last`` over each key's
    (ts, id)-ordered stream: a ``first`` event followed by ZERO OR
    MORE contiguous ``middle`` events and then a ``last`` event —
    the variable-length CEP shape fixed-lead matching can't express
    (MATCH_RECOGNIZE's ``A B* C``).

    Islands technique, no iteration: per key, each row gets its
    position ``rn`` and the position of the NEXT non-``middle`` row
    (a conditional min over the unbounded-following frame — one
    WindowExec pass). A match is a ``first`` row whose next
    non-middle row is a ``last`` row; everything between is middle by
    construction. The confirm is a self-join on (key, rn) —
    co-partitioned with the window's own hash exchange.

    Emits (key, start id, end id, n_middle).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    o = df.select(
        key_col, id_col, type_col, F.row_number().over(w).alias("_rn")
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("_rn")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nb = o.withColumn(
        "_next_nonmid",
        F.min(
            F.when(F.col(type_col) != middle, F.col("_rn"))
        ).over(wf),
    )
    a = nb.where(F.col(type_col) == first).select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("start_id"),
        F.col("_rn").alias("_a_rn"),
        "_next_nonmid",
    )
    c = nb.where(F.col(type_col) == last).select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("end_id"),
        F.col("_rn").alias("_c_rn"),
    )
    return (
        a.join(
            c,
            (a["_k"] == c["_k"]) & (a["_next_nonmid"] == c["_c_rn"]),
        )
        .select(
            a["_k"].alias(key_col),
            "start_id",
            "end_id",
            (F.col("_c_rn") - F.col("_a_rn") - 1)
            .cast("long")
            .alias("n_middle"),
        )
    )
