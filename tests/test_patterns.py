"""Event-sequence operators (operators/patterns.py): contiguity,
time bounds, tie-breaks, skip-till-next funnel semantics — the edge
cases the catalog oracles' organic data never isolates."""

from __future__ import annotations

import datetime as dt

import pytest

from cybersecurity_miw_spark.operators.patterns import (
    funnel_stages,
    match_contiguous_sequence,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_type STRING, event_id LONG"
    )


def test_contiguous_requires_adjacency(spark):
    df = _events(spark, [
        # user 1: A B -> match at id 10
        (1, _ts("2024-01-01 10:00:00"), "A", 10),
        (1, _ts("2024-01-01 10:01:00"), "B", 11),
        # user 2: A x B -> the interposed event breaks the match
        (2, _ts("2024-01-01 10:00:00"), "A", 20),
        (2, _ts("2024-01-01 10:00:30"), "x", 21),
        (2, _ts("2024-01-01 10:01:00"), "B", 22),
    ])
    got = match_contiguous_sequence(df, ("A", "B")).collect()
    assert [(r["user_id"], r["event_id"]) for r in got] == [(1, 10)]


def test_contiguous_within_bound_and_three_steps(spark):
    df = _events(spark, [
        (1, _ts("2024-01-01 10:00:00"), "A", 1),
        (1, _ts("2024-01-01 10:01:00"), "B", 2),
        (1, _ts("2024-01-01 10:02:00"), "C", 3),  # A->B->C in 120 s
        (2, _ts("2024-01-01 10:00:00"), "A", 4),
        (2, _ts("2024-01-01 10:01:00"), "B", 5),
        (2, _ts("2024-01-01 12:00:00"), "C", 6),  # C too late
    ])
    got = match_contiguous_sequence(
        df, ("A", "B", "C"), within_seconds=300
    ).collect()
    assert [(r["user_id"], r["event_id"], r["start_s"], r["end_s"])
            for r in got] == [(1, 1, 1704103200, 1704103320)]


def test_contiguous_tie_break_by_id(spark):
    """Equal timestamps order by event_id — the same total order as
    sessionize, so A(id=1),B(id=2) at one instant IS adjacent."""
    t = _ts("2024-01-01 10:00:00")
    df = _events(spark, [(1, t, "A", 1), (1, t, "B", 2)])
    got = match_contiguous_sequence(df, ("A", "B")).collect()
    assert [(r["user_id"], r["event_id"]) for r in got] == [(1, 1)]


def test_contiguous_rejects_single_step(spark):
    df = _events(spark, [(1, _ts("2024-01-01 10:00:00"), "A", 1)])
    with pytest.raises(ValueError, match="at least 2"):
        match_contiguous_sequence(df, ("A",))


def test_funnel_skip_till_next_and_depth(spark):
    df = _events(spark, [
        # user 1 reaches all 3 stages; stage 2 skips an interposed A
        (1, _ts("2024-01-01 10:00:00"), "A", 1),
        (1, _ts("2024-01-01 11:00:00"), "A", 2),  # later A ignored
        (1, _ts("2024-01-01 12:00:00"), "B", 3),
        (1, _ts("2024-01-01 13:00:00"), "C", 4),
        # user 2: B before its first A doesn't count -> depth 1
        (2, _ts("2024-01-01 09:00:00"), "B", 5),
        (2, _ts("2024-01-01 10:00:00"), "A", 6),
        # user 3: never does A -> absent from the result
        (3, _ts("2024-01-01 10:00:00"), "B", 7),
    ])
    got = {r["user_id"]: r for r in funnel_stages(df, ("A", "B", "C")).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["A_s"], r1["B_s"], r1["C_s"], r1["depth"]) == (
        1704103200, 1704110400, 1704114000, 3,
    )
    r2 = got[2]
    assert (r2["A_s"], r2["B_s"], r2["C_s"], r2["depth"]) == (
        1704103200, None, None, 1,
    )


def test_funnel_strictly_after_and_stage_bound(spark):
    df = _events(spark, [
        # B at the SAME second as A: not strictly after -> unreached
        (1, _ts("2024-01-01 10:00:00"), "A", 1),
        (1, _ts("2024-01-01 10:00:00"), "B", 2),
        # user 2: B 2h after A, outside a 1h stage bound
        (2, _ts("2024-01-01 10:00:00"), "A", 3),
        (2, _ts("2024-01-01 12:00:00"), "B", 4),
        # user 3: B 30min after A, inside the bound
        (3, _ts("2024-01-01 10:00:00"), "A", 5),
        (3, _ts("2024-01-01 10:30:00"), "B", 6),
    ])
    got = {
        r["user_id"]: (r["B_s"], r["depth"])
        for r in funnel_stages(df, ("A", "B"), stage_within_seconds=3600).collect()
    }
    assert got[1] == (None, 1)
    assert got[2] == (None, 1)
    assert got[3] == (1704105000, 2)


def test_funnel_duplicate_stage_names_get_suffix(spark):
    df = _events(spark, [
        (1, _ts("2024-01-01 10:00:00"), "A", 1),
        (1, _ts("2024-01-01 11:00:00"), "A", 2),
    ])
    out = funnel_stages(df, ("A", "A"))
    assert "A_s" in out.columns and "A_1_s" in out.columns
    r = out.collect()[0]
    # second A must be strictly after the first
    assert (r["A_s"], r["A_1_s"], r["depth"]) == (1704103200, 1704106800, 2)


def test_star_sequence_zero_and_many_middles(spark):
    from cybersecurity_miw_spark.operators.patterns import (
        match_star_sequence,
    )

    df = _events(spark, [
        # user 1: A C (zero middles) -> match, n_middle 0
        (1, _ts("2024-01-01 10:00:00"), "A", 1),
        (1, _ts("2024-01-01 10:01:00"), "C", 2),
        # user 2: A B B B C -> match, n_middle 3
        (2, _ts("2024-01-01 10:00:00"), "A", 3),
        (2, _ts("2024-01-01 10:01:00"), "B", 4),
        (2, _ts("2024-01-01 10:02:00"), "B", 5),
        (2, _ts("2024-01-01 10:03:00"), "B", 6),
        (2, _ts("2024-01-01 10:04:00"), "C", 7),
        # user 3: A B x C -> the interposed x breaks the star run
        (3, _ts("2024-01-01 10:00:00"), "A", 8),
        (3, _ts("2024-01-01 10:01:00"), "B", 9),
        (3, _ts("2024-01-01 10:02:00"), "x", 10),
        (3, _ts("2024-01-01 10:03:00"), "C", 11),
        # user 4: A B B (stream ends mid-star) -> no match
        (4, _ts("2024-01-01 10:00:00"), "A", 12),
        (4, _ts("2024-01-01 10:01:00"), "B", 13),
        # user 5: A B A C -> the first A's next non-middle is the
        # SECOND A (no match); the second A's next non-middle is C
        # immediately after it (match, zero middles)
        (5, _ts("2024-01-01 10:00:00"), "A", 14),
        (5, _ts("2024-01-01 10:01:00"), "B", 15),
        (5, _ts("2024-01-01 10:02:00"), "A", 16),
        (5, _ts("2024-01-01 10:03:00"), "C", 17),
    ])
    got = sorted(
        (r["user_id"], r["start_id"], r["end_id"], r["n_middle"])
        for r in match_star_sequence(df, "A", "B", "C").collect()
    )
    assert got == [
        (1, 1, 2, 0),
        (2, 3, 7, 3),
        (5, 16, 17, 0),
    ]
