"""Data-quality profiling (operators/quality.py): one-pass profile
values and declarative expectation evaluation."""

from __future__ import annotations

import pytest

from cybersecurity_miw_spark.operators.quality import (
    Expectation,
    check_expectations,
    profile_table,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "a", None),
            (3, None, 7.0),
            (3, "b", 7.0),
        ],
        "id LONG, tag STRING, v DOUBLE",
    )


def test_profile_values(df):
    p = {r["column"]: r for r in profile_table(df).collect()}
    assert p["id"]["n_rows"] == 4 and p["id"]["n_null"] == 0
    assert p["id"]["n_distinct"] == 3
    assert (p["id"]["min_str"], p["id"]["max_str"]) == ("1", "3")
    assert p["tag"]["n_null"] == 1 and p["tag"]["n_distinct"] == 2
    assert p["v"]["n_null"] == 1 and p["v"]["n_distinct"] == 2


def test_expectations(df):
    prof = profile_table(df)
    results = check_expectations(prof, [
        Expectation("id", "not_null"),
        Expectation("id", "unique"),                      # dup id=3
        Expectation("tag", "max_null_fraction", 0.5),
        Expectation("tag", "max_null_fraction", 0.1),     # 25% > 10%
        Expectation("v", "distinct_at_most", 10),
    ])
    got = [(e.column, e.check, ok) for e, ok, _ in results]
    assert got == [
        ("id", "not_null", True),
        ("id", "unique", False),
        ("tag", "max_null_fraction", True),
        ("tag", "max_null_fraction", False),
        ("v", "distinct_at_most", True),
    ]


def test_expectation_errors(df):
    prof = profile_table(df)
    with pytest.raises(ValueError, match="no profile row"):
        check_expectations(prof, [Expectation("nope", "not_null")])
    with pytest.raises(ValueError, match="threshold"):
        check_expectations(prof, [Expectation("id", "max_null_fraction")])
    with pytest.raises(ValueError, match="unknown check"):
        check_expectations(prof, [Expectation("id", "frobnicate")])


def test_profile_single_job(df, spark):
    """The profile is ONE aggregation plan — no per-column jobs."""
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") <= 6  # expand-for-distinct tiers
    assert "CartesianProduct" not in plan
