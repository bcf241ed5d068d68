"""Fuzzy join (operators/fuzzy.py): q-gram blocking must lose NO pair
the naive quadratic model finds (the recall guarantee), with typo,
short-string, and null coverage."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.fuzzy import fuzzy_join


def _pairs(df, lcol, rcol):
    return sorted(
        (r[lcol], r[rcol], r["edit_distance"]) for r in df.collect()
    )


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def test_typo_matching(spark):
    hosts = spark.createDataFrame(
        [("webserver01",), ("db-primary",), ("cache-node",)], "name STRING"
    )
    seen = spark.createDataFrame(
        [("webserver01",), ("websrver01",), ("db-primray",),
         ("unrelated-host",), (None,)],
        "observed STRING",
    )
    got = _pairs(
        fuzzy_join(hosts, seen, "name", "observed", max_distance=2),
        "name", "observed",
    )
    assert got == [
        ("db-primary", "db-primray", 2),
        ("webserver01", "webserver01", 0),
        ("webserver01", "websrver01", 1),
    ]


def test_matches_naive_model_on_random_strings(spark):
    """200x200 random strings (alphabet small so near-misses are
    common; lengths 1-12 so the short-string path is exercised):
    blocking + refine must equal the exact quadratic model."""
    rng = random.Random(20260814)
    alpha = "abcd"
    mk = lambda: "".join(
        rng.choice(alpha) for _ in range(rng.randint(1, 12))
    )
    ls = sorted({mk() for _ in range(200)})
    rs = sorted({mk() for _ in range(200)})
    left = spark.createDataFrame([(s,) for s in ls], "a STRING")
    right = spark.createDataFrame([(s,) for s in rs], "b STRING")
    got = _pairs(fuzzy_join(left, right, "a", "b", max_distance=2), "a", "b")
    want = sorted(
        (a, b, _lev(a, b)) for a in ls for b in rs if _lev(a, b) <= 2
    )
    assert got == want
    assert len(want) > 50  # the fixture actually exercises matches


def test_duplicate_rows_keep_multiplicity(spark):
    """Two identical left rows each pair with a matching right row:
    the candidate distinct() dedups only the gram fan-out, never input
    rows (each side is row-id-tagged before explosion). Covers both
    the gram path (long strings) and the short-string cross path."""
    left = spark.createDataFrame(
        [("webserver01",), ("webserver01",), ("ab",), ("ab",)], "a STRING"
    )
    right = spark.createDataFrame([("websrver01",), ("ac",)], "b STRING")
    got = _pairs(fuzzy_join(left, right, "a", "b", max_distance=1), "a", "b")
    assert got == [
        ("ab", "ac", 1),
        ("ab", "ac", 1),
        ("webserver01", "websrver01", 1),
        ("webserver01", "websrver01", 1),
    ]


def test_short_side_cap(spark):
    import pytest

    from cybersecurity_miw_spark.operators import fuzzy as fz

    old = fz.MAX_SHORT
    fz.MAX_SHORT = 5
    try:
        left = spark.createDataFrame([(f"a{i}",) for i in range(10)], "a STRING")
        right = spark.createDataFrame([("xy",)], "b STRING")
        with pytest.raises(ValueError, match="broadcast-sized"):
            fuzzy_join(left, right, "a", "b", max_distance=1).collect()
    finally:
        fz.MAX_SHORT = old
