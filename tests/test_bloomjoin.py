"""Bloom-filter join pruning (operators/bloomjoin.py): no false
negatives ever, measured false-positive rate near the configured fpp,
exact end-to-end semi-join semantics, and the plan property that
justifies the whole exercise — the prune is a pre-shuffle Filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.bloomjoin import (
    build_bloom,
    bloom_prune,
    bloom_semi_join,
    might_contain,
)


@pytest.fixture(scope="module")
def model(spark):
    small = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    return build_bloom(small, "k", fpp=0.03)


def test_no_false_negatives(spark, model):
    """Every inserted key MUST pass — the property that makes the
    follow-up exact join sufficient for exactness."""
    small = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    n = small.where(might_contain(model, F.col("k"))).count()
    assert n == 500


def test_false_positive_rate_near_fpp(spark, model):
    """Probe 20k keys disjoint from the build set: the pass rate is
    the FP rate. Allow 3x headroom over the configured 3% — seeded
    xxhash64 probes are not mathematically independent."""
    probes = spark.range(0, 20000).select(
        (F.col("id") * 7 + 1).alias("k")  # never ≡ 0 mod 7·id pattern
    )
    fp = probes.where(might_contain(model, F.col("k"))).count()
    assert fp / 20000 < 0.09, f"FP rate {fp / 20000:.4f}"


def test_null_keys_never_pass(spark, model):
    df = spark.range(3).select(F.lit(None).cast("long").alias("k"))
    assert df.where(might_contain(model, F.col("k"))).count() == 0


def test_bloom_semi_join_exact(spark):
    """bloom_semi_join ≡ plain leftsemi join, row for row — the
    sketch moves work out of the shuffle, never changes the answer."""
    big = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 100).select((F.col("id") * 3).alias("k"))
    got = sorted(
        (r["k"], r["v"]) for r in bloom_semi_join(big, small, "k").collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in big.join(small.distinct(), "k", "leftsemi").collect()
    )
    assert got == want
    assert len(got) > 0


def test_prune_keeps_all_matches_and_most_nonmatches_die(spark):
    big = spark.range(0, 10000).select((F.col("id") % 1000).alias("k"))
    small = spark.range(0, 50).select((F.col("id") * 2).alias("k"))
    model = build_bloom(small, "k", fpp=0.01)
    pruned = bloom_prune(big, model, "k")
    # all 500 true matches survive (50 keys x 10 rows each)
    true_matches = big.join(small, "k", "leftsemi").count()
    kept = pruned.count()
    assert kept >= true_matches == 500
    # and the prune killed the bulk of the 9500 non-matching rows
    assert kept < 500 + 0.05 * 9500


def test_oversized_dim_rejected(spark):
    huge = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="shuffle semi join"):
        build_bloom(huge, "k", n_items=50_000_000, fpp=0.001)


def test_prune_is_preshuffle_filter(spark):
    """The prune must be a narrow Filter in the scan stage: zero
    exchanges in its plan (the literal model travels with the task,
    not through a join)."""
    big = spark.range(0, 1000).select((F.col("id") % 97).alias("k"))
    small = spark.range(0, 20).select(F.col("id").alias("k"))
    model = build_bloom(small, "k")
    plan = (
        bloom_prune(big, model, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
