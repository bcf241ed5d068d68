"""Skew utilities: salted join/aggregate produce exactly the unsalted
results while spreading each key over n_salts reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.skew import (
    SALT_COL,
    salted_aggregate,
    salted_join,
    with_salt,
)


def skewed_df(spark):
    # 900 rows of one hot key + 100 spread rows
    rows = [(7, i * 1.0) for i in range(900)] + [
        (i % 10 + 100, i * 1.0) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_join_matches_plain_join(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame(
        [(7, "hot"), (100, "a"), (101, "b"), (999, "absent")], ["k", "name"]
    )
    plain = {
        (r.k, r.v, r.name)
        for r in big.join(small, "k").collect()
    }
    salted = {
        (r.k, r.v, r.name)
        for r in salted_join(big, small, "k", n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 920  # 900 hot + 20 spread


def test_salted_join_left_outer(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame([(7, "hot")], ["k", "name"])
    out = salted_join(big, small, "k", n_salts=4, how="left")
    got = out.groupBy("name").count().collect()
    counts = {r["name"]: r["count"] for r in got}
    assert counts == {"hot": 900, None: 100}


def test_salt_spreads_hot_key(spark):
    big = skewed_df(spark)
    per_salt = (
        with_salt(big, 8)
        .filter(F.col("k") == 7)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    # the hot key lands on every salt, no salt holds more than half
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 450


def test_salted_aggregate_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r.k): (r.n, r.s, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "n": F.count(F.lit(1)),
                "s": F.sum("v"),
                "mx": F.max("v"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_algebraic(spark):
    import pytest

    df = skewed_df(spark)
    with pytest.raises(ValueError, match="algebraic"):
        salted_aggregate(df, ["k"], {"m": F.avg("v")}, n_salts=4)


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    big = skewed_df(spark)
    small = spark.createDataFrame([(7, "hot")], ["k", "name"])
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", n_salts=4, how=how)


def test_salted_aggregate_rejects_distinct(spark):
    import pytest

    df = skewed_df(spark)
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_aggregate(
            df, ["k"], {"d": F.count_distinct("v")}, n_salts=4
        )
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_aggregate(
            df, ["k"], {"d": F.sum_distinct("v")}, n_salts=4
        )
