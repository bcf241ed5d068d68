"""Bucketed co-located joins: joining two tables bucketed on the same
key must produce an exchange-free plan (the 100 TB repeated-join
pattern — shuffle paid once at write time)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources.bucketed import read_bucketed, save_bucketed


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    save_bucketed(a, "t_bucketed_a", ["k"], n_buckets=8)
    save_bucketed(b, "t_bucketed_b", ["k"], n_buckets=8)
    try:
        ta = read_bucketed(spark, "t_bucketed_a")
        tb = read_bucketed(spark, "t_bucketed_b")
        # force a non-broadcast join so the exchange question is real
        joined = ta.join(tb.hint("merge"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        assert joined.count() == 1000

        # and a groupBy on the bucket key is exchange-free too
        agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", aplan), aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
