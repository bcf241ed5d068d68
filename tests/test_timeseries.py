"""Unit tests for operators/timeseries.py: bucketed range join edge
cases (boundary inclusivity, multi-bucket spans, degenerate
intervals) and time_rollup level algebra. The catalog queries
(`range_join_event_windows`, `time_rollup_multires`) carry the
full-hash DuckDB oracles; these tests pin the semantics the oracle
data never exercises."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.timeseries import (
    range_join,
    time_rollup,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:00:00")),
            (2, "a", _ts("2024-01-01 00:59:59.999999")),
            (3, "a", _ts("2024-01-01 01:00:00")),
            (4, "a", _ts("2024-01-01 07:30:00")),
            (5, "b", _ts("2024-01-01 00:30:00")),
        ],
        "pid INT, k STRING, ts TIMESTAMP",
    )


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [
            # [00:00, 01:00) on key a — spans 2 one-hour buckets
            ("a", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), 10),
            # [06:00, 09:00) on key a — catches pid 4 across buckets
            ("a", _ts("2024-01-01 06:00:00"), _ts("2024-01-01 09:00:00"), 11),
            # reversed interval: must match nothing
            ("a", _ts("2024-01-01 05:00:00"), _ts("2024-01-01 04:00:00"), 12),
            # key b
            ("b", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), 13),
        ],
        "k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP, wid INT",
    )


def _matches(df):
    return sorted((r["pid"], r["wid"]) for r in df.collect())


def test_range_join_half_open_and_keys(points, intervals):
    out = range_join(
        points, intervals, "ts", "start_ts", "end_ts", on="k",
        bucket_seconds=3600,
    )
    # pid 1 at start (inclusive), pid 2 just inside, pid 3 AT the
    # half-open end (excluded), pid 4 mid-interval, pid 5 on key b;
    # reversed window 12 matches nothing
    assert _matches(out) == [(1, 10), (2, 10), (4, 11), (5, 13)]


def test_range_join_end_inclusive(points, intervals):
    out = range_join(
        points, intervals, "ts", "start_ts", "end_ts", on="k",
        bucket_seconds=3600, end_inclusive=True,
    )
    assert (3, 10) in _matches(out)


def test_range_join_bucket_size_invariance(points, intervals):
    """The bucket width is a physical knob only — results are
    identical for any width (fan-out and shuffle shape change, the
    refined predicate doesn't)."""
    base = None
    for w in (60, 900, 3600, 86400):
        got = _matches(
            range_join(
                points, intervals, "ts", "start_ts", "end_ts", on="k",
                bucket_seconds=w,
            )
        )
        base = got if base is None else base
        assert got == base, f"bucket_seconds={w}"


def test_range_join_no_key_global_intervals(spark, points):
    iv = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:45:00"), 99)],
        "start_ts TIMESTAMP, end_ts TIMESTAMP, wid INT",
    )
    out = range_join(
        points, iv, "ts", "start_ts", "end_ts", on=None,
        bucket_seconds=3600,
    )
    assert _matches(out) == [(1, 99), (5, 99)]


def test_range_join_fanout_guard_trips_on_pathological_interval(
    spark, points
):
    """A year-long interval in a minute-bucketed join (>500k buckets)
    must FAIL the job with an identifying message, not silently
    explode the build side."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    iv = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), _ts("2025-01-01 00:00:00"), 1)],
        "start_ts TIMESTAMP, end_ts TIMESTAMP, wid INT",
    )
    with pytest.raises(SparkRuntimeException, match="range_join: interval spans"):
        range_join(
            points, iv, "ts", "start_ts", "end_ts", on=None,
            bucket_seconds=60,
        ).collect()


def test_range_join_fanout_clamp_truncates_tail_only(spark, points):
    """overflow='clamp': the oversized interval keeps matching within
    its first max_buckets_per_interval buckets and silently stops
    matching beyond — and normal-sized intervals are untouched."""
    iv = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), _ts("2025-01-01 00:00:00"), 1)],
        "start_ts TIMESTAMP, end_ts TIMESTAMP, wid INT",
    )
    out = range_join(
        points, iv, "ts", "start_ts", "end_ts", on=None,
        bucket_seconds=60, max_buckets_per_interval=90,
        overflow="clamp",
    )
    # cap = 90 minute-buckets => matches through 01:29:59; pids 1, 2,
    # 3, 5 are inside, pid 4 (07:30) is past the clamped tail
    assert _matches(out) == [(1, 1), (2, 1), (3, 1), (5, 1)]


def test_range_join_guard_admits_normal_intervals(points, intervals):
    """The default guard never fires for sane data: same result as the
    unguarded baseline assertions."""
    out = range_join(
        points, intervals, "ts", "start_ts", "end_ts", on="k",
        bucket_seconds=3600, max_buckets_per_interval=4,
    )
    assert _matches(out) == [(1, 10), (2, 10), (4, 11), (5, 13)]


def test_time_rollup_levels_algebra(spark):
    rows = [
        ("x", _ts("2024-01-01 00:00:10"), 1.00),
        ("x", _ts("2024-01-01 00:00:50"), 2.00),
        ("x", _ts("2024-01-01 00:59:00"), 4.00),
        ("x", _ts("2024-01-01 01:01:00"), 8.00),
        ("y", _ts("2024-01-02 12:00:00"), 0.50),
    ]
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP, value DOUBLE")
    out = time_rollup(df).collect()
    by = {(r["resolution"], r["bucket_s"], r["event_type"]): r for r in out}

    # minute 00:00 merges the first two rows
    m = by[("minute", 1704067200, "x")]
    assert (m["n_events"], m["value_sum_c"], m["value_min_c"], m["value_max_c"]) == (
        2, 300, 100, 200,
    )
    # hour 00 re-aggregates three rows from two minute buckets
    h = by[("hour", 1704067200, "x")]
    assert (h["n_events"], h["value_sum_c"], h["value_min_c"], h["value_max_c"]) == (
        3, 700, 100, 400,
    )
    # day bucket spans both hours of key x
    d = by[("day", 1704067200, "x")]
    assert (d["n_events"], d["value_sum_c"]) == (4, 1500)
    # key y lives on its own day
    assert by[("day", 1704153600, "y")]["value_sum_c"] == 50
    # every level partitions the data: n_events sums match per level
    for lv in ("minute", "hour", "day"):
        assert sum(r["n_events"] for r in out if r["resolution"] == lv) == 5


def test_time_rollup_rejects_bad_levels(spark):
    df = spark.range(1).select(
        F.lit("x").alias("event_type"),
        F.current_timestamp().alias("ts"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(ValueError, match="unknown"):
        time_rollup(df, levels=("minute", "fortnight"))
    with pytest.raises(ValueError, match="finest"):
        time_rollup(df, levels=("day", "minute"))


def test_window_agg_join_counts_and_zero_match_anchors(spark):
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators.timeseries import (
        window_agg_join,
    )

    anchors = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),
            (2, "a", _ts("2024-01-01 20:00:00")),  # nothing follows
            (3, "b", _ts("2024-01-01 10:00:00")),
        ],
        "aid INT, k STRING, ts TIMESTAMP",
    )
    points = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:10:00"), 5.0),
            ("a", _ts("2024-01-01 10:59:59"), 7.0),
            ("a", _ts("2024-01-01 11:00:00"), 9.0),  # at window end: out
            ("b", _ts("2024-01-01 10:30:00"), 1.0),
            ("b", _ts("2024-01-01 09:59:59"), 1.0),  # before anchor
        ],
        "k STRING, ts TIMESTAMP, v DOUBLE",
    )
    out = window_agg_join(
        anchors,
        points.withColumnRenamed("ts", "pts"),
        left_id="aid",
        left_ts="ts",
        window_seconds=3600,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
        ],
        on="k",
        right_ts="pts",
    )
    got = {r["aid"]: (r["n"], r["v_sum"]) for r in out.collect()}
    assert got[1] == (2, 12.0)
    assert got[2] == (None, None)  # zero-match anchor survives
    assert got[3] == (1, 1.0)
    assert len(got) == 3


def test_range_join_matches_python_model_on_random_data(spark):
    """400 random points x 60 random intervals over 10 keys, odd
    bucket width (701 s) so bucket boundaries never align with the
    data — compared against the brute-force python containment
    model."""
    import random

    rng = random.Random(20260814)
    base = dt.datetime(2024, 1, 1)
    keys = [f"k{i}" for i in range(10)]
    pts = [
        (i, rng.choice(keys), base + dt.timedelta(seconds=rng.randint(0, 86400)))
        for i in range(400)
    ]
    ivs = []
    for j in range(60):
        s = rng.randint(0, 86400)
        # include zero-length and reversed intervals
        e = s + rng.randint(-600, 7200)
        ivs.append(
            (rng.choice(keys), base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=e), j)
        )
    left = spark.createDataFrame(pts, "pid INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        ivs, "k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP, wid INT"
    )
    got = sorted(
        (r["pid"], r["wid"])
        for r in range_join(
            left, right, "ts", "start_ts", "end_ts", on="k",
            bucket_seconds=701,
        ).collect()
    )
    want = sorted(
        (pid, wid)
        for pid, pk, pts_ in pts
        for ik, s, e, wid in ivs
        if pk == ik and s <= pts_ < e
    )
    assert got == want


def test_time_rollup_distinct_merges_without_double_count(spark, sf_dir):
    """The property sums can't give: a user active in many minutes
    counts ONCE per hour/day. Sketch estimates must track exact
    distincts within 5% at every level."""
    from cybersecurity_miw_spark.operators.timeseries import (
        time_rollup_distinct,
    )
    from cybersecurity_miw_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    approx = {
        (r["resolution"], r["bucket_s"], r["event_type"]): r[
            "n_distinct_approx"
        ]
        for r in time_rollup_distinct(ev).collect()
    }
    for lv in ("minute", "hour", "day"):
        exact = {
            (lv, r["b"], r["event_type"]): r["n"]
            for r in ev.groupBy(
                F.date_trunc(lv, "ts")
                .cast("timestamp_ltz")
                .cast("long")
                .alias("b"),
                "event_type",
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(k for k in approx if k[0] == lv) == set(exact)
        for k, n in exact.items():
            assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)
    # day-level totals are far below the sum of minute counts when
    # users span minutes — the reason sketches are needed at all
    day_total = sum(v for k, v in approx.items() if k[0] == "day")
    minute_total = sum(v for k, v in approx.items() if k[0] == "minute")
    assert day_total < minute_total


def test_builtin_session_window_agrees_with_gap_sessionize(spark, sf_dir):
    """Two independent session definitions — Spark's built-in
    session_window and the windows.py lag/cumsum sessionize — must
    partition events identically for the same 30-min gap: same
    session count per user, same (n_events, start_s) multisets."""
    from cybersecurity_miw_spark.operators.windows import session_summary
    from cybersecurity_miw_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    ours = {}
    for r in session_summary(ev, gap_minutes=30).collect():
        ours.setdefault(r["user_id"], []).append(
            (r["n_events"], r["start_s"])
        )
    builtin = {}
    rows = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", "n",
            F.col("w.start").cast("timestamp_ltz").cast("long").alias("s"),
        )
        .collect()
    )
    for r in rows:
        builtin.setdefault(r["user_id"], []).append((r["n"], r["s"]))
    assert set(ours) == set(builtin)
    for u in ours:
        assert sorted(ours[u]) == sorted(builtin[u]), u


def test_ohlc_and_gapfill_semantics(spark):
    from cybersecurity_miw_spark.operators.timeseries import (
        gap_fill_locf,
        ohlc,
    )

    df = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 10:00:01"), 5.0),
            ("x", _ts("2024-01-01 10:30:00"), 1.0),
            ("x", _ts("2024-01-01 10:59:59"), 3.0),
            # hour 11 empty; hour 12 has one event
            ("x", _ts("2024-01-01 12:10:00"), 9.0),
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    bars = {r["bucket_s"]: r for r in ohlc(df, level="hour").collect()}
    b10 = bars[1704103200]
    assert (b10["open_c"], b10["high_c"], b10["low_c"], b10["close_c"],
            b10["n_events"]) == (500, 500, 100, 300, 4 - 1)
    assert bars[1704110400]["open_c"] == 900  # hour 12
    assert 1704106800 not in bars  # empty hour absent from bars

    hour = ohlc(df, level="hour").select(
        F.timestamp_seconds("bucket_s").alias("bucket"),
        "event_type",
        F.col("close_c").alias("avg_c"),
    )
    filled = {
        r["bucket_s"]: (r["avg_c_filled"], r["was_gap"])
        for r in gap_fill_locf(
            hour, value_cols=("avg_c",), level="hour"
        ).collect()
    }
    assert filled[1704103200] == (300, False)
    # the empty hour 11 exists in the grid, carries hour 10's close
    assert filled[1704106800] == (300, True)
    assert filled[1704110400] == (900, False)


def test_gapfill_observed_null_is_not_a_gap(spark):
    """An observed partial whose (first) value column is legitimately
    NULL must NOT be flagged was_gap — gap means the grid row had no
    observation at all (explicit _obs marker, not value-NULL-ness)."""
    from cybersecurity_miw_spark.operators.timeseries import gap_fill_locf

    partials = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 10:00:00"), 7.0),
            ("x", _ts("2024-01-01 11:00:00"), None),  # observed, NULL
            # hour 12 missing entirely
            ("x", _ts("2024-01-01 13:00:00"), 9.0),
        ],
        "event_type STRING, bucket TIMESTAMP, avg_c DOUBLE",
    )
    rows = {
        r["bucket_s"]: (r["avg_c_filled"], r["was_gap"])
        for r in gap_fill_locf(
            partials, value_cols=("avg_c",), level="hour"
        ).collect()
    }
    assert rows[1704103200] == (7.0, False)
    # observed NULL: locf still carries the last value, but NOT a gap
    assert rows[1704106800] == (7.0, False)
    # truly missing hour: carried value AND flagged as gap
    assert rows[1704110400] == (7.0, True)
    assert rows[1704114000] == (9.0, False)


def test_time_weighted_avg_hand_computed(spark):
    from cybersecurity_miw_spark.operators.timeseries import (
        time_weighted_avg,
    )

    # value 10 current for 30 min, then 20 for the remaining 30 min:
    # TWA = 15 regardless of how long each "burst" of samples is
    df = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 10:00:00"), 10.0, 1),
            ("x", _ts("2024-01-01 10:30:00"), 20.0, 2),
            # plain avg would say (10+20)/2 = 15 here too; add a burst
            # of 20s in the last minute: plain avg -> 17.5, TWA stays
            # pinned near the durations
            ("x", _ts("2024-01-01 10:59:00"), 20.0, 3),
            ("x", _ts("2024-01-01 10:59:30"), 20.0, 4),
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE, event_id LONG",
    )
    out = time_weighted_avg(df, level="hour", tiebreak_col="event_id")
    r = out.collect()[0]
    # 10*1800s + 20*1800s over 3600s = 15 exactly
    assert (r["bucket_s"], r["twa_ppm"]) == (1704103200, 15_000_000)
    # the burst-insensitive property: plain avg is 17.5
    from pyspark.sql import functions as FF

    plain = df.agg(FF.avg("value")).collect()[0][0]
    assert plain == 17.5


def test_merge_intervals_hand_computed(spark):
    from cybersecurity_miw_spark.operators.timeseries import merge_intervals

    df = spark.createDataFrame(
        [
            # key a: [0,10) and [5,20) overlap; [20,30) adjacent
            # (gap 0, start == prev end -> NOT > -> merges); [40,50)
            # separate
            ("a", 0, 10), ("a", 5, 20), ("a", 20, 30), ("a", 40, 50),
            # containment: [100,200) swallows [110,120)
            ("a", 100, 200), ("a", 110, 120),
            # key b: single interval
            ("b", 7, 9),
            # reversed interval dropped
            ("b", 100, 90),
        ],
        "k STRING, s LONG, e LONG",
    ).select(
        "k",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    got = sorted(
        (r["k"], r["span_start_s"], r["span_end_s"], r["n_merged"])
        for r in merge_intervals(
            df, "start_ts", "end_ts", keys=("k",)
        ).collect()
    )
    assert got == [
        ("a", 0, 30, 3),
        ("a", 40, 50, 1),
        ("a", 100, 200, 2),
        ("b", 7, 9, 1),
    ]


def test_merge_intervals_min_gap_bridges_small_holes(spark):
    from cybersecurity_miw_spark.operators.timeseries import merge_intervals

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 15, 20), ("a", 100, 110)],
        "k STRING, s LONG, e LONG",
    ).select(
        "k",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    got = sorted(
        (r["span_start_s"], r["span_end_s"], r["n_merged"])
        for r in merge_intervals(
            df, "start_ts", "end_ts", keys=("k",), min_gap_seconds=5
        ).collect()
    )
    # the 5s hole [10,15) is bridged; the 80s hole is not
    assert got == [(0, 20, 2), (100, 110, 1)]


def test_merge_intervals_matches_python_model_on_random_input(spark):
    """Random per-key intervals: the one-window-pass plan must equal
    the obvious sequential merge."""
    import random

    rng = random.Random(20260814)
    rows = []
    for k in ("a", "b", "c"):
        for _ in range(60):
            s = rng.randint(0, 500)
            rows.append((k, s, s + rng.randint(0, 40)))

    def model(intervals, gap=0):
        out = []
        for s, e in sorted(intervals):
            if out and s <= out[-1][1] + gap:
                out[-1][1] = max(out[-1][1], e)
                out[-1][2] += 1
            else:
                out.append([s, e, 1])
        return {tuple(x) for x in out}

    from cybersecurity_miw_spark.operators.timeseries import merge_intervals

    df = spark.createDataFrame(rows, "k STRING, s LONG, e LONG").select(
        "k",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    for gap in (0, 7):
        got = {}
        for r in merge_intervals(
            df, "start_ts", "end_ts", keys=("k",), min_gap_seconds=gap
        ).collect():
            got.setdefault(r["k"], set()).add(
                (r["span_start_s"], r["span_end_s"], r["n_merged"])
            )
        for k in ("a", "b", "c"):
            want = model(
                [(s, e) for kk, s, e in rows if kk == k], gap
            )
            assert got[k] == want, (k, gap)


def test_repair_rollup_partials_fixes_late_day_only(spark, tmp_path):
    """Late-data repair: a day whose watermark already closed gets
    recomputed from raw and dynamic-overwritten in the partials sink;
    other days' files are untouched; hour/day views read correct
    totals from the repaired finest level."""
    import glob
    import os

    from cybersecurity_miw_spark.operators.timeseries import (
        repair_rollup_partials,
        rollup_from_partials,
        rollup_partials,
    )

    partials_dir = str(tmp_path / "partials")

    # initial ingest: day 1 missing a late event, day 2 complete
    initial = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 10:00:00"), 1.0),
            ("x", _ts("2024-01-02 10:00:00"), 2.0),
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    (
        rollup_partials(initial)
        .withColumn("day", F.date_format("bucket", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(partials_dir)
    )
    d2_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{partials_dir}/day=2024-01-02/*.parquet")
    }

    # the full raw table now includes the late day-1 event
    raw = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 10:00:00"), 1.0),
            ("x", _ts("2024-01-01 10:00:30"), 10.0),  # late arrival
            ("x", _ts("2024-01-02 10:00:00"), 2.0),
        ],
        "event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    repair_rollup_partials(raw, partials_dir, days=["2024-01-01"])

    healed = spark.read.parquet(partials_dir).drop("day")
    views = rollup_from_partials(healed)
    by = {
        (r["resolution"], r["bucket_s"]): (r["n_events"], r["value_sum_c"])
        for r in views.where(F.col("event_type") == "x").collect()
    }
    # repaired minute bucket now carries both day-1 events
    assert by[("minute", 1704103200)] == (2, 1100)
    # day totals: day 1 corrected, day 2 unchanged
    assert by[("day", 1704067200)] == (2, 1100)
    assert by[("day", 1704153600)] == (1, 200)
    # day 2's files were never rewritten
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{partials_dir}/day=2024-01-02/*.parquet")
    } == d2_files


def test_rolling_active_users_exact_and_approx(spark):
    """rolling_active_users: trailing-window distinct actives via the
    bounded fan-out; the HLL variant tracks it within the sketch
    error bound on a multi-thousand-user corpus."""
    import datetime as dt

    from cybersecurity_miw_spark.operators.timeseries import (
        rolling_active_users,
        rolling_active_users_approx,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    # 2000 users; user u active on day (u % 10) and day (u % 10) + 5
    for u in range(2000):
        for d in (u % 10, u % 10 + 5):
            rows.append((u, base + dt.timedelta(days=d, hours=1)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    exact = {
        r["day_s"]: r["n_active_users"]
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    # day 0: only users with u%10==0 -> 200; day 9: all residues 0..9
    # seen within the trailing 7 days? days 3..9 residues -> first-day
    # users 3..9 (7 residues x 200) + second-day users (d=u%10+5 in
    # 3..9 -> residues 0..4, but those users are already counted via
    # their first day only if that day is in window; residues 0..2
    # first days are OUT of window, so they count via second day)
    assert exact[int(base.timestamp())] == 200
    day9 = int((base + dt.timedelta(days=9)).timestamp())
    # residues 3..9 via day u%10 (1400) + residues 0..2 whose second
    # day u%10+5 lands in 5..7 (600) -> union since disjoint residues
    assert exact[day9] == 2000
    # every day's count is a multiple of 200 and bounded by 2000
    assert all(0 < v <= 2000 and v % 200 == 0 for v in exact.values())

    approx = {
        r["day_s"]: r["n_active_users_approx"]
        for r in rolling_active_users_approx(ev, window_days=7).collect()
    }
    assert set(approx) == set(exact)
    for d, v in exact.items():
        assert abs(approx[d] - v) / v < 0.05, (d, v, approx[d])
