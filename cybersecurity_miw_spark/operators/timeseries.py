"""Time-series operators: bucketed range (interval) join and
multi-resolution time rollup — the two time-dimension shapes beyond
sessionization (operators/windows.py) that a log/metrics pipeline
runs constantly. The reference has no time-interval operators
(SURVEY §2: its time handling stops at per-field bucketing,
`miw/log_format.cc` date/time derivations); both are part of the
beyond-reference surface, designed Spark-first.

Range join
----------
`events.ts BETWEEN iv.start AND iv.end` expressed directly is a
non-equi join: Spark plans BroadcastNestedLoopJoin (a per-key cross
product when the build side doesn't fit memory — the classic 100 TB
cliff). The scalable shape is the *bucketed* range join (the same
strategy Databricks' range-join hint and KDB's window join use):
quantize time into fixed buckets, explode each interval over the
buckets it covers (bounded fan-out: len/bucket + 1 rows), equi-join
on (key, bucket) — a plain uniform hash shuffle — then refine with
the exact predicate. Shuffle volume scales linearly with data and
fan-out is a tunable constant; no nested-loop anywhere.

Time rollup
-----------
The hypertable / continuous-aggregate shape: aggregate raw data ONCE
at the finest resolution, then derive every coarser level by
re-aggregating the finest partials (all aggregates here are algebraic:
count→sum, sum→sum, min→min, max→max). Raw data is scanned exactly
once; the hour and day levels read a table ~#buckets×#keys rows wide —
at 100 TB that's the difference between three full scans and one
full scan plus two trivial ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cybersecurity_miw_spark.cache import tracked_persist
from cybersecurity_miw_spark.operators.windows import _epoch_s


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_seconds: int = 3600,
    end_inclusive: bool = False,
    max_buckets_per_interval: int = 10_000,
    overflow: str = "error",
) -> DataFrame:
    """Inner join of point rows (``left``, at ``left_ts``) to interval
    rows (``right``, spanning ``[right_start, right_end)`` — or
    closed when ``end_inclusive``) via the bucketed equi-join shape.

    Every left column and every right column survives; name
    collisions are the caller's problem (alias before calling), except
    the join key ``on`` which is emitted once.

    Mechanics: both sides map time to integer buckets
    ``floor(epoch_s / bucket_seconds)``; the interval side explodes
    into all covered buckets via ``sequence()`` (fan-out
    ``len/bucket + 1`` — pick ``bucket_seconds`` near the typical
    interval length to keep it small while keeping bucket population
    low); the join is a hash equi-join on ``(on, bucket)``; the exact
    range predicate then drops same-bucket non-overlaps. Bucketing
    uses second precision; the refine compares the full-precision
    timestamps, so sub-second boundaries stay exact.

    Intervals with ``end < start`` or a null endpoint match nothing
    (sequence() on a reversed/null range yields no buckets).

    Fan-out guard: one pathological interval (a year-long row in a
    table bucketed for minutes) would otherwise explode into millions
    of build-side rows. Any interval covering more than
    ``max_buckets_per_interval`` buckets either fails the job with a
    row-identifying message (``overflow="error"``, the default — a
    bad row should be visible, not silently mis-joined) or is clamped
    to the first ``max_buckets_per_interval`` buckets
    (``overflow="clamp"`` — points beyond
    ``start + cap*bucket_seconds`` then do NOT match that interval;
    use only when tail truncation is acceptable). The guard is a
    row-local expression — no extra pass over the data.
    """
    if overflow not in ("error", "clamp"):
        raise ValueError(f"overflow must be 'error' or 'clamp', got {overflow!r}")
    lb = F.floor(_epoch_s(F.col(left_ts)) / bucket_seconds)
    rs = F.floor(_epoch_s(F.col(right_start)) / bucket_seconds).cast("long")
    re_ = F.floor(_epoch_s(F.col(right_end)) / bucket_seconds).cast("long")

    n_buckets = re_ - rs + F.lit(1)
    if overflow == "error":
        seq_end = F.when(
            n_buckets <= max_buckets_per_interval, re_
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join: interval spans more than "
                        f"{max_buckets_per_interval} buckets of "
                        f"{bucket_seconds}s (start="
                    ),
                    F.col(right_start).cast("string"),
                    F.lit(", end="),
                    F.col(right_end).cast("string"),
                    F.lit(
                        ") — raise bucket_seconds or "
                        "max_buckets_per_interval, or pass "
                        "overflow='clamp'"
                    ),
                )
            ).cast("long")
        )
    else:
        seq_end = F.least(rs + F.lit(max_buckets_per_interval - 1), re_)

    l_tag = left.withColumn("_rj_bucket", lb.cast("long"))
    r_tag = right.withColumn(
        "_rj_bucket",
        F.explode(
            F.when(
                F.col(right_end) >= F.col(right_start),
                F.sequence(rs, seq_end),
            )
        ),
    )
    keys = ["_rj_bucket"] if on is None else [on, "_rj_bucket"]
    cmp_end: Column = (
        F.col(left_ts) <= F.col(right_end)
        if end_inclusive
        else F.col(left_ts) < F.col(right_end)
    )
    joined = l_tag.join(r_tag, on=keys, how="inner").where(
        (F.col(left_ts) >= F.col(right_start)) & cmp_end
    )
    return joined.drop("_rj_bucket")


_LEVEL_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}

# the public partial schema shared by the batch and streaming rollup
# paths: `bucket` (truncated TIMESTAMP of the bucket start), the
# grouping keys, then the four mergeable measures
_MEASURES = ("n_events", "value_sum_c", "value_min_c", "value_max_c")


def rollup_partials(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    level: str = "minute",
    cents_scale: int = 100,
) -> DataFrame:
    """One aggregation of raw rows to ``level`` buckets — the only
    scan of raw data in the rollup family. Values are cents-scaled to
    integers (`round(v*scale)` as BIGINT) so sums are associative and
    hash-exact across engines. Output schema: ``bucket`` (truncated
    timestamp), ``*keys``, n_events, value_sum_c, value_min_c,
    value_max_c — the same shape `streaming_minute_rollup` appends to
    its sink, so both feed :func:`rollup_from_partials`."""
    cents = F.round(F.col(value_col) * cents_scale, 0).cast("long")
    return (
        df.select(
            F.date_trunc(level, F.col(ts_col)).alias("bucket"),
            *keys,
            cents.alias("_c"),
        )
        .groupBy("bucket", *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_c").cast("long").alias("value_sum_c"),
            F.min("_c").alias("value_min_c"),
            F.max("_c").alias("value_max_c"),
        )
    )


def rollup_from_partials(
    partials: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Derive every level from ``levels[0]`` partials (schema of
    :func:`rollup_partials`) by algebraic merge — count/sum re-sum,
    min/max re-min/max. Never touches raw data: this is what makes a
    continuous aggregate cheap to maintain (the streaming job appends
    minute partials; hour/day views re-aggregate a table that is
    ~#buckets×#keys rows, not the event stream)."""
    unknown = [lv for lv in levels if lv not in _LEVEL_SECONDS]
    if unknown:
        raise ValueError(f"unknown rollup level(s): {unknown}")
    if list(levels) != sorted(levels, key=_LEVEL_SECONDS.__getitem__):
        raise ValueError("levels must be ordered finest to coarsest")

    def _emit(agg: DataFrame, level: str) -> DataFrame:
        return agg.select(
            F.lit(level).alias("resolution"),
            _epoch_s(F.col("bucket")).alias("bucket_s"),
            *keys,
            *_MEASURES,
        )

    out = _emit(partials, levels[0])
    for lv in levels[1:]:
        coarser = (
            partials.select(
                F.date_trunc(lv, F.col("bucket")).alias("bucket"),
                *keys,
                *_MEASURES,
            )
            .groupBy("bucket", *keys)
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("value_sum_c").cast("long").alias("value_sum_c"),
                F.min("value_min_c").alias("value_min_c"),
                F.max("value_max_c").alias("value_max_c"),
            )
        )
        out = out.unionByName(_emit(coarser, lv))
    return out


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    levels: tuple[str, ...] = ("minute", "hour", "day"),
    cents_scale: int = 100,
) -> DataFrame:
    """Multi-resolution rollup: one raw scan at ``levels[0]``
    (:func:`rollup_partials`), every coarser level re-aggregated from
    the finest partials (:func:`rollup_from_partials` — identical
    results to aggregating raw data, proven by the oracle twin which
    DOES aggregate raw per level).

    Output: ``resolution`` (level name), ``bucket_s`` (epoch seconds
    of the truncated bucket start, BIGINT), ``*keys``, ``n_events``,
    ``value_sum_c``, ``value_min_c``, ``value_max_c``.

    ``levels`` must be ordered finest→coarsest and each coarser level
    must be a multiple of the finest (minute/hour/day are); the
    truncation of a truncated timestamp equals the truncation of the
    raw one, so re-truncating the finest bucket start is exact.
    """
    # validate before the scan so bad levels fail fast
    unknown = [lv for lv in levels if lv not in _LEVEL_SECONDS]
    if unknown:
        raise ValueError(f"unknown rollup level(s): {unknown}")
    if list(levels) != sorted(levels, key=_LEVEL_SECONDS.__getitem__):
        raise ValueError("levels must be ordered finest to coarsest")

    finest = rollup_partials(
        df, ts_col, value_col, keys, levels[0], cents_scale
    )
    # the finest aggregate is read once per coarser level — persist so
    # the raw scan (the expensive part at scale) runs exactly once
    if len(levels) > 1:
        finest = tracked_persist(finest)
    return rollup_from_partials(finest, keys, levels)


def window_agg_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ts: str,
    window_seconds: int,
    aggs: list[Column],
    on: str | None = None,
    right_ts: str = "ts",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Window-aggregate join (the kdb ``wj`` shape): for every left
    anchor row, aggregate the right rows of the same key whose
    timestamp falls in ``[left_ts, left_ts + window_seconds)`` —
    "how many events / how much volume followed each anchor".

    Built on :func:`range_join` by flipping roles: the LEFT side
    becomes the interval set (anchor ts + window), the right rows are
    the points, the bucketed equi-join pairs them, and one
    aggregation per anchor id folds the pairs. Anchors with zero
    matches are restored by a left join against the (small,
    anchor-sized) aggregate — so the output has exactly one row per
    left row, with nulls/zeros where nothing followed.

    ``aggs`` are aggregate Columns over the joined right columns
    (e.g. ``F.count(F.lit(1)).alias("n")``); alias each one.
    ``bucket_seconds`` defaults to the window length (fan-out ≤ 2
    buckets per anchor).
    """
    if bucket_seconds is None:
        bucket_seconds = max(window_seconds, 1)
    iv = left.select(
        F.col(left_id).alias("_anchor"),
        *( [F.col(on)] if on else [] ),
        F.col(left_ts).alias("_w_start"),
        (
            F.col(left_ts)
            + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        ).alias("_w_end"),
    )
    pairs = range_join(
        right,
        iv,
        left_ts=right_ts,
        right_start="_w_start",
        right_end="_w_end",
        on=on,
        bucket_seconds=bucket_seconds,
    )
    folded = pairs.groupBy("_anchor").agg(*aggs)
    return (
        left.join(
            folded, on=left[left_id] == folded["_anchor"], how="left"
        )
        .drop("_anchor")
    )


def time_rollup_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    keys: tuple[str, ...] = ("event_type",),
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Approx-DISTINCT rollup via mergeable HLL sketches (Spark's
    datasketches functions): minute-level ``hll_sketch_agg`` per
    (bucket, keys), coarser levels ``hll_union_agg`` over the finest
    sketches — the one rollup the algebraic path CANNOT do, because
    distinct counts don't sum (the same user in two minutes must
    count once in the hour). Sketch union is exactly as mergeable as
    sum, so the continuous-aggregate shape carries over: raw data is
    scanned once, each coarser level unions a #buckets×#keys-row
    sketch table, and a stored sketch column would let a streaming
    sink feed the same re-aggregation.

    Output: ``resolution``, ``bucket_s``, ``*keys``,
    ``n_distinct_approx`` (BIGINT estimate; rows-only verification by
    design — sketch estimates are engine-specific)."""
    unknown = [lv for lv in levels if lv not in _LEVEL_SECONDS]
    if unknown:
        raise ValueError(f"unknown rollup level(s): {unknown}")
    if list(levels) != sorted(levels, key=_LEVEL_SECONDS.__getitem__):
        raise ValueError("levels must be ordered finest to coarsest")

    finest = (
        df.select(
            F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"),
            *keys,
            F.col(id_col).alias("_id"),
        )
        .groupBy("bucket", *keys)
        .agg(F.expr("hll_sketch_agg(_id)").alias("_sk"))
    )
    if len(levels) > 1:
        finest = tracked_persist(finest)

    def _emit(agg: DataFrame, level: str) -> DataFrame:
        return agg.select(
            F.lit(level).alias("resolution"),
            _epoch_s(F.col("bucket")).alias("bucket_s"),
            *keys,
            F.expr("hll_sketch_estimate(_sk)")
            .cast("long")
            .alias("n_distinct_approx"),
        )

    out = _emit(finest, levels[0])
    for lv in levels[1:]:
        coarser = (
            finest.select(
                F.date_trunc(lv, F.col("bucket")).alias("bucket"),
                *keys,
                "_sk",
            )
            .groupBy("bucket", *keys)
            .agg(F.expr("hll_union_agg(_sk)").alias("_sk"))
        )
        out = out.unionByName(_emit(coarser, lv))
    return out


def rollup_distinct_from_sketches(
    sketches: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    levels: tuple[str, ...] = ("minute", "hour", "day"),
    sketch_col: str = "user_sketch",
) -> DataFrame:
    """Derive every level's approx-distinct estimates from stored
    finest-level HLL sketch rows (``bucket`` timestamp, ``*keys``,
    ``sketch_col`` binary — the `streaming_minute_distinct_rollup`
    sink schema): coarser levels union the sketches, estimates are
    taken at the end. Same output schema as
    :func:`time_rollup_distinct`."""
    unknown = [lv for lv in levels if lv not in _LEVEL_SECONDS]
    if unknown:
        raise ValueError(f"unknown rollup level(s): {unknown}")
    if list(levels) != sorted(levels, key=_LEVEL_SECONDS.__getitem__):
        raise ValueError("levels must be ordered finest to coarsest")

    base = sketches.select(
        "bucket", *keys, F.col(sketch_col).alias("_sk")
    )

    def _emit(agg: DataFrame, level: str) -> DataFrame:
        return agg.select(
            F.lit(level).alias("resolution"),
            _epoch_s(F.col("bucket")).alias("bucket_s"),
            *keys,
            F.expr("hll_sketch_estimate(_sk)")
            .cast("long")
            .alias("n_distinct_approx"),
        )

    # the finest level may hold several sketch rows per bucket (e.g.
    # a streaming sink plus a batch backfill) — union them first
    finest = base.groupBy("bucket", *keys).agg(
        F.expr("hll_union_agg(_sk)").alias("_sk")
    )
    if len(levels) > 1:
        finest = tracked_persist(finest)
    out = _emit(finest, levels[0])
    for lv in levels[1:]:
        coarser = (
            finest.select(
                F.date_trunc(lv, F.col("bucket")).alias("bucket"),
                *keys,
                "_sk",
            )
            .groupBy("bucket", *keys)
            .agg(F.expr("hll_union_agg(_sk)").alias("_sk"))
        )
        out = out.unionByName(_emit(coarser, lv))
    return out


def ohlc(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    level: str = "hour",
    cents_scale: int = 100,
    order_col: Column | None = None,
) -> DataFrame:
    """Open/high/low/close bars per (bucket, keys): the candlestick /
    metrics-resample aggregation. open/close are ``min_by``/``max_by``
    on ``order_col`` (default: ``unix_micros(ts)`` — pass a combined
    key when timestamps can collide within a bucket, e.g.
    ``unix_micros(ts) * 2^20 + id`` kept inside int64); high/low are
    plain max/min. All five measures compute in ONE hash aggregation
    with map-side partials — min_by/max_by are algebraic, so this is
    rollup-shaped, not a window sort."""
    if level not in _LEVEL_SECONDS:
        raise ValueError(f"unknown level {level!r}")
    if order_col is None:
        # NTZ forbids unix_micros directly; the UTC-pinned ltz hop is
        # the identity (windows._epoch_s)
        order_col = F.unix_micros(
            F.col(ts_col).cast("timestamp_ltz")
        )
    cents = F.round(F.col(value_col) * cents_scale, 0).cast("long")
    return (
        df.select(
            F.date_trunc(level, F.col(ts_col)).alias("bucket"),
            *keys,
            cents.alias("_c"),
            order_col.alias("_ord"),
        )
        .groupBy("bucket", *keys)
        .agg(
            F.min_by("_c", "_ord").alias("open_c"),
            F.max("_c").alias("high_c"),
            F.min("_c").alias("low_c"),
            F.max_by("_c", "_ord").alias("close_c"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            _epoch_s(F.col("bucket")).alias("bucket_s"),
            *keys,
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "n_events",
        )
    )


def gap_fill_locf(
    partials: DataFrame,
    value_cols: tuple[str, ...],
    keys: tuple[str, ...] = ("event_type",),
    level: str = "hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Dense-grid resample with last-observation-carried-forward: per
    key, generate EVERY ``level`` bucket between its first and last
    observed bucket, left-join the sparse partials, and carry each
    value column forward over the gaps — the locf/gap-fill operator a
    metrics store applies before plotting or differencing irregular
    series.

    Shapes: bounds are one tiny agg (#keys rows); the grid explodes
    #keys × (range/level) rows — bounded by calendar time, not data
    volume; the join is co-partitioned on (key, bucket); the fill is
    one window pass (last ignorenulls over the cumulative frame).
    Leading gaps before a key's first observation stay null by
    construction (the grid starts at the first observation).

    Output: ``bucket_s``, keys, ``<c>_filled`` per value column, and
    ``was_gap`` (true where the grid row had no observation)."""
    step = _LEVEL_SECONDS[level]
    bounds = partials.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                _epoch_s(F.col("_lo")),
                _epoch_s(F.col("_hi")),
                F.lit(step),
            )
        ).alias("_bs"),
    )
    # explicit observation marker: was_gap must flag MISSING grid rows,
    # not rows whose first value column is legitimately NULL
    obs = partials.select(
        *keys,
        _epoch_s(F.col(bucket_col)).alias("_bs"),
        *[F.col(c) for c in value_cols],
        F.lit(True).alias("_obs"),
    )
    j = grid.join(obs, on=[*keys, "_bs"], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("_bs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("_bs").alias("bucket_s"),
        *keys,
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{c}_filled")
            for c in value_cols
        ],
        F.col("_obs").isNull().alias("was_gap"),
    )


def repair_rollup_partials(
    raw: DataFrame,
    partials_dir: str,
    days: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    level: str = "minute",
    cents_scale: int = 100,
) -> None:
    """Late-data repair for the continuous-aggregate family: events
    that arrive AFTER the streaming rollup's watermark closed their
    buckets never reach the partials sink — the production fix is a
    periodic batch repair that recomputes the affected days from raw
    and replaces ONLY those days' partial rows.

    Mechanics: filter raw to ``days`` (partition-prunable predicate
    when raw is day-partitioned), recompute the ``level`` partials
    with the exact streaming schema (:func:`rollup_partials`), add a
    ``day`` partition column, and dynamic-partition-overwrite the
    partials sink (sources/maintain.py semantics: untouched days'
    files are never rewritten). Coarser levels need no repair of
    their own — :func:`rollup_from_partials` re-derives hour/day from
    the corrected finest level on read. At 100 TB this rewrites
    #affected-days × #keys × #buckets-per-day partial rows, never the
    table and never the raw history."""
    from cybersecurity_miw_spark.sources.maintain import overwrite_partitions

    day_col = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    sliced = raw.where(day_col.isin(list(days)))
    fixed = rollup_partials(
        sliced, ts_col, value_col, keys, level, cents_scale
    ).withColumn(
        "day", F.date_format(F.col("bucket"), "yyyy-MM-dd")
    )
    overwrite_partitions(fixed, partials_dir, ("day",))


def merge_intervals(
    df: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: tuple[str, ...] = (),
    min_gap_seconds: int = 0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Coalesce overlapping (or within ``min_gap_seconds``-adjacent)
    intervals per key into maximal disjoint spans — the
    gaps-and-islands primitive behind incident-window consolidation,
    uptime/downtime merging, and detection-window dedup before a
    range join (fewer, wider build-side intervals = smaller fan-out).

    Plan: ONE window pass per key — a new span starts where this
    interval's start exceeds the running max of all previous ends
    (+ gap); the span id is the running count of such starts; one
    hash aggregation then emits each span's bounds. No self-join, no
    explosion: cost is a per-key sort + two narrow window columns,
    the same shape as sessionization.

    Output: ``*keys``, ``span_start_s``/``span_end_s`` (epoch
    seconds), ``n_merged`` (input intervals absorbed into the span).
    Intervals with null or reversed bounds are dropped."""
    s = _epoch_s(F.col(start_col))
    e = _epoch_s(F.col(end_col))
    base = df.select(
        *keys, s.alias("_s"), e.alias("_e")
    ).where(F.col("_s").isNotNull() & (F.col("_e") >= F.col("_s")))

    order = (
        [F.col("_s"), F.col("_e")]
        if tiebreak_col is None
        else [F.col("_s"), F.col("_e"), F.col(tiebreak_col)]
    )
    w_prev = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    new_span = F.when(
        F.col("_s") > F.max("_e").over(w_prev) + F.lit(min_gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    # the first row per key has a null running max -> when() yields 0,
    # which is correct: span ids are 0-based cumulative NEW flags and
    # the first row always opens span 0
    spans = base.withColumn("_new", new_span).withColumn(
        "_span", F.sum("_new").over(w_run)
    )
    return spans.groupBy(*keys, "_span").agg(
        F.min("_s").alias("span_start_s"),
        F.max("_e").alias("span_end_s"),
        F.count(F.lit(1)).alias("n_merged"),
    ).drop("_span")


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    level: str = "hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per (bucket, keys) for IRREGULARLY
    sampled values: each sample is weighted by how long it was the
    current value — microseconds until the key's next sample, clamped
    to the bucket end (the last sample of a bucket covers through
    bucket end). A plain avg() over-weights bursts; TWA is what a
    gauge metric (queue depth, temperature, session count) actually
    means over time.

    Scope: weights are IN-BUCKET only — a value does not carry into
    later empty buckets (compose with :func:`gap_fill_locf` for
    that). One lead() window pass on the key order + one hash
    aggregation; ppm-scaled output for exact cross-engine compare.
    """
    if level not in _LEVEL_SECONDS:
        raise ValueError(f"unknown level {level!r}")
    step = _LEVEL_SECONDS[level]
    order = [ts_col] if tiebreak_col is None else [ts_col, tiebreak_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    us = lambda c: F.unix_micros(c.cast("timestamp_ltz"))  # noqa: E731
    bkt = F.date_trunc(level, F.col(ts_col))
    o = df.select(
        *keys,
        F.col(ts_col),
        F.col(value_col).alias("_v"),
        bkt.alias("bucket"),
        F.lead(ts_col).over(w).alias("_nts"),
    )
    bucket_end_us = us(F.col("bucket")) + F.lit(step * 1_000_000)
    w_us = (
        F.least(
            F.coalesce(us(F.col("_nts")), bucket_end_us), bucket_end_us
        )
        - us(F.col(ts_col))
    )
    return (
        o.select(
            *keys, "bucket", "_v", w_us.alias("_w")
        )
        .groupBy("bucket", *keys)
        .agg(
            F.round(
                F.sum(F.col("_v") * F.col("_w")) / F.sum("_w") * 1_000_000,
                0,
            )
            .cast("long")
            .alias("twa_ppm")
        )
        .select(
            _epoch_s(F.col("bucket")).alias("bucket_s"), *keys, "twa_ppm"
        )
    )


def rolling_active_users(
    ev: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Trailing-window distinct actives per day (the 7-day-active-
    users dashboard metric): for each observed day d, the count of
    distinct users with ANY event in [d-window_days+1, d].

    The scalable form is a BOUNDED FAN-OUT, not a sliding window
    distinct: the fact first collapses to distinct (user, day)
    activity rows (the big shuffle, uniform key), each activity row
    then covers the ``window_days`` days it keeps the user active for
    (explode of a window_days-element sequence — narrow, bounded),
    and a second distinct + per-day count finishes. A per-day window
    with a running DISTINCT would centralize O(window × users) state
    per partition boundary and cannot map-side combine; this shape is
    three uniform-key exchanges with combiners all the way down.
    Days outside the observed activity range are not emitted
    (semi-join against the observed day roster)."""
    day_s = _epoch_s(F.date_trunc("day", F.col(ts_col)))
    act = ev.select(
        day_s.alias("day_s"), F.col(user_col).alias("user_id")
    ).distinct()
    covered = (
        act.select(
            F.explode(
                F.sequence(
                    F.col("day_s"),
                    F.col("day_s") + F.lit(86400 * (window_days - 1)),
                    F.lit(86400),
                )
            ).alias("day_s"),
            "user_id",
        )
        .distinct()
    )
    days = act.select("day_s").distinct()
    return (
        covered.join(days, on="day_s", how="left_semi")
        .groupBy("day_s")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


def rolling_active_users_approx(
    ev: DataFrame,
    window_days: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Trailing-window actives per day via mergeable HLL sketches —
    the 100 TB form of :func:`rolling_active_users` for LONG windows:
    the exact path's fan-out is ``window_days`` rows per (user, day)
    activity (fine at 7, 4× heavier at 30), while this one builds ONE
    daily sketch per day (#days rows total after the first exchange)
    and unions ``window_days`` sketches per output day — the
    replicated stage is days×window sketch rows, independent of user
    count. Same shape as :func:`time_rollup_distinct`: sketch union
    is exactly as mergeable as sum, and persisting the daily-sketch
    table turns every later window query into a #days-row scan.

    Output: day_s, n_active_users_approx (BIGINT estimate; rows-only
    verification by design — sketch binaries are engine-specific; the
    relative-error bound vs the exact path is golden-pinned)."""
    day_s = _epoch_s(F.date_trunc("day", F.col(ts_col)))
    daily = (
        ev.select(day_s.alias("day_s"), F.col(user_col).alias("_id"))
        .groupBy("day_s")
        .agg(F.expr("hll_sketch_agg(_id)").alias("_sk"))
    )
    covered = daily.select(
        F.explode(
            F.sequence(
                F.col("day_s"),
                F.col("day_s") + F.lit(86400 * (window_days - 1)),
                F.lit(86400),
            )
        ).alias("day_s"),
        "_sk",
    )
    days = daily.select("day_s")
    return (
        covered.join(days, on="day_s", how="left_semi")
        .groupBy("day_s")
        .agg(F.expr("hll_union_agg(_sk)").alias("_u"))
        .select(
            "day_s",
            F.expr("hll_sketch_estimate(_u)")
            .cast("long")
            .alias("n_active_users_approx"),
        )
    )
