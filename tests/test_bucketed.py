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


def test_band_store_bucketed_join_shuffles_batch_side_only(spark):
    """The incremental-LSH production layout: the persisted band store
    is bucketed on the join keys (band, band_hash), so each ingest
    batch's candidate join shuffles ONLY the (small) batch side — the
    100 TB store is read bucket-aligned, no store-side exchange,
    proving the lsh_band_store docstring's claim."""
    from cybersecurity_miw_spark.operators.dedup import lsh_band_store

    history = spark.createDataFrame(
        [(i, f"shared shingle text block variant {i % 3}") for i in range(60)],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [(100, "shared shingle text block variant 1")],
        "doc_id LONG, text STRING",
    )
    save_bucketed(
        lsh_band_store(history),
        "t_band_store",
        ["band", "band_hash"],
        n_buckets=8,
    )
    try:
        store = read_bucketed(spark, "t_band_store").withColumnRenamed(
            "doc_id", "stored_id"
        )
        nb = lsh_band_store(batch).withColumnRenamed("doc_id", "new_id")
        # force the sort-merge form (the at-scale shape; broadcast of
        # the batch side would hide the exchange question)
        cand = nb.hint("merge").join(store, on=["band", "band_hash"])
        plan = cand._jdf.queryExecution().executedPlan().toString()
        # every hash exchange in the plan must be on the batch side's
        # lineage — the bucketed store contributes none; with one join
        # key set that means AT MOST ONE hash exchange total
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges <= 1, plan
        got = {
            (r["new_id"], r["stored_id"])
            for r in cand.select("new_id", "stored_id").distinct().collect()
        }
        assert got  # batch doc matches its history near-dups
        assert all(n == 100 for n, _ in got)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_band_store")
