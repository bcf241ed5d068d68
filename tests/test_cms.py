"""Count-min sketch goldens: the CMS guarantees (never underestimate;
bounded overestimate), exactness in the no-collision regime,
mergeability across shards, and Spark/Python hash agreement."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.textstats import (
    cms_estimate,
    count_min_table,
)


def _word_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "w string")


def test_cms_never_underestimates_and_bounds_overestimate(spark):
    rng = random.Random(6)
    words = [f"tok{rng.randint(0, 199)}" for _ in range(5000)]
    truth = Counter(words)
    table = count_min_table(_word_df(spark, words), depth=4, width=1024)
    n = len(words)
    overs = []
    for w, c in truth.items():
        est = cms_estimate(table, w)
        assert est >= c, (w, est, c)  # the deterministic CMS guarantee
        overs.append(est - c)
    # the overestimate bound e*N/width holds with prob 1 - e^-depth
    # PER QUERY — assert it as the quantile statement it is
    bound = 2.72 * n / 1024
    violations = sum(1 for o in overs if o > bound)
    assert violations <= 0.05 * len(overs), (violations, len(overs), bound)
    assert max(overs) <= 5 * bound  # no pathological collision pile-up


def test_cms_exact_when_vocab_far_below_width(spark):
    words = ["a"] * 7 + ["b"] * 3 + ["c"]
    table = count_min_table(_word_df(spark, words), depth=4, width=2048)
    assert cms_estimate(table, "a") == 7
    assert cms_estimate(table, "b") == 3
    assert cms_estimate(table, "c") == 1
    assert cms_estimate(table, "absent") == 0


def test_cms_merges_by_addition(spark):
    w1 = ["x"] * 5 + ["y"] * 2
    w2 = ["x"] * 4 + ["z"] * 3
    t1 = count_min_table(_word_df(spark, w1), depth=3, width=512)
    t2 = count_min_table(_word_df(spark, w2), depth=3, width=512)
    merged = [
        [a + b for a, b in zip(r1, r2)] for r1, r2 in zip(t1, t2)
    ]
    whole = count_min_table(_word_df(spark, w1 + w2), depth=3, width=512)
    assert merged == whole  # mergeable: shard-and-sum == one pass
    assert cms_estimate(merged, "x") == 9


def test_cms_total_mass_per_row_equals_token_count(spark):
    words = [f"t{i % 37}" for i in range(999)]
    table = count_min_table(_word_df(spark, words), depth=4, width=256)
    for row in table:
        assert sum(row) == 999
