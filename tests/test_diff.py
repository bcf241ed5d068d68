"""Snapshot diff (operators/diff.py): classification matrix including
null-safe compares and multi-column keys/compares."""

from __future__ import annotations

from cybersecurity_miw_spark.operators.diff import snapshot_diff


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged -> dropped
            (2, "a", 20.0),   # changed value
            (3, "b", 30.0),   # removed
            (4, "b", None),   # NULL -> value = changed
            (5, "c", None),   # NULL -> NULL = unchanged, dropped
        ],
        "k INT, g STRING, v DOUBLE",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 21.0),
            (4, "b", 40.0),
            (5, "c", None),
            (6, "d", 60.0),   # added
        ],
        "k INT, g STRING, v DOUBLE",
    )
    out = snapshot_diff(old, new, key_cols=("k", "g"), compare_cols=("v",))
    got = {(r["k"], r["g"]): (r["change_type"], r["old_v"], r["new_v"])
           for r in out.collect()}
    assert got == {
        (2, "a"): ("changed", 20.0, 21.0),
        (3, "b"): ("removed", 30.0, None),
        (4, "b"): ("changed", None, 40.0),
        (6, "d"): ("added", None, 60.0),
    }


def test_snapshot_diff_no_changes_empty(spark):
    df = spark.createDataFrame([(1, 1.0)], "k INT, v DOUBLE")
    assert snapshot_diff(df, df, ("k",), ("v",)).count() == 0
