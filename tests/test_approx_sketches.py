"""Accuracy goldens for the sketch-based scale twins
(`approx_distinct_users_per_type`, `approx_value_percentiles`): no
SQL oracle can pin engine-specific sketch estimates, so pin the thing
that matters instead — the estimate's distance from the exact
operator on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_miw_spark.catalog import QUERIES
from cybersecurity_miw_spark.sources.tables import load_events


def test_hll_distinct_within_5pct_of_exact(spark, sf_dir):
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in QUERIES["approx_distinct_users_per_type"](
            spark, sf_dir
        ).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        rel = abs(approx[etype] - n) / max(n, 1)
        assert rel <= 0.05, (etype, approx[etype], n)


def test_percentile_sketch_rank_accurate(spark, sf_dir):
    """percentile_approx returns an ACTUAL data value (no
    interpolation), so the honest accuracy statement is about rank:
    the fraction of the group's values at or below the returned value
    must bracket the target quantile within the sketch's rank error
    (~1/accuracy) plus tie slack."""
    approx = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"], r["p99_approx"])
        for r in QUERIES["approx_value_percentiles"](spark, sf_dir).collect()
    }
    values = {}
    for r in load_events(spark, sf_dir).select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(values)
    eps = 0.01
    for etype, (p50, p90, p99) in approx.items():
        vs = sorted(values[etype])
        n = len(vs)
        for q, a in ((0.5, p50), (0.9, p90), (0.99, p99)):
            assert a in values[etype], (etype, q, a)  # real data value
            le = sum(1 for v in vs if v <= a) / n
            lt = sum(1 for v in vs if v < a) / n
            # the returned value's rank interval must contain a point
            # within eps of the target quantile
            assert lt - eps <= q <= le + eps, (etype, q, a, lt, le)


def test_sketches_are_deterministic(spark, sf_dir):
    a1 = sorted(
        map(tuple, QUERIES["approx_distinct_users_per_type"](spark, sf_dir).collect())
    )
    a2 = sorted(
        map(tuple, QUERIES["approx_distinct_users_per_type"](spark, sf_dir).collect())
    )
    assert a1 == a2
    p1 = sorted(map(tuple, QUERIES["approx_value_percentiles"](spark, sf_dir).collect()))
    p2 = sorted(map(tuple, QUERIES["approx_value_percentiles"](spark, sf_dir).collect()))
    assert p1 == p2
