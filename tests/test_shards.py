"""Goldens for the training-shard writer (sources/shards.py):
size bounds, global order across files, content determinism across
re-writes, and exact row preservation."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources.shards import write_shards


@pytest.fixture(scope="module")
def corpus(spark):
    # deliberately skewed upstream partitioning: one partition holds
    # 90% of rows — the range exchange must still bound shard sizes
    a = spark.range(0, 900).withColumn("part", F.lit("big"))
    b = spark.range(900, 1000).withColumn("part", F.lit("small"))
    return (
        a.coalesce(1).unionByName(b.coalesce(1))
        .select(F.col("id").alias("doc_id"), "part")
        .withColumn("mix_key", (F.col("doc_id") * 37 % 1000).cast("double"))
    )


def _files(out):
    return sorted(glob.glob(f"{out}/part-*.parquet"))


def test_shards_bounded_ordered_and_complete(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    n_parts = write_shards(corpus, out, shard_rows=128)
    files = _files(out)
    assert n_parts == 8  # ceil(1000/128)
    assert len(files) >= n_parts

    seen = []
    prev_last = None
    for f in files:
        t = pq.read_table(f)
        assert t.num_rows <= 128
        keys = list(
            zip(t.column("mix_key").to_pylist(), t.column("doc_id").to_pylist())
        )
        assert keys == sorted(keys)  # sorted within the file
        if prev_last is not None:
            assert keys[0] >= prev_last  # global order across files
        prev_last = keys[-1]
        seen.extend(t.column("doc_id").to_pylist())
    assert sorted(seen) == list(range(1000))  # nothing lost or duplicated


def test_shards_rewrite_is_deterministic(spark, corpus, tmp_path):
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_shards(corpus, out1, shard_rows=200, n_rows=1000)
    write_shards(corpus, out2, shard_rows=200, n_rows=1000)
    f1, f2 = _files(out1), _files(out2)
    assert len(f1) == len(f2)
    for a, b in zip(f1, f2):
        ta, tb = pq.read_table(a), pq.read_table(b)
        assert ta.column("doc_id").to_pylist() == tb.column("doc_id").to_pylist()


def test_shards_rejects_bad_budget(spark, corpus, tmp_path):
    with pytest.raises(ValueError):
        write_shards(corpus, str(tmp_path / "x"), shard_rows=0)


# ---- verify_shards: the writer's read-back monitor ----


def test_verify_shards_green_on_written_layout(spark, corpus, tmp_path):
    """A fresh write_shards layout passes every check, with the exact
    file/row tallies."""
    from cybersecurity_miw_spark.sources.shards import verify_shards

    out = str(tmp_path / "shards")
    write_shards(corpus, out, shard_rows=128)
    rep = verify_shards(
        spark, out, shard_rows=128, n_rows=1000
    )
    assert rep["ok"]
    assert rep["n_rows"] == 1000
    assert rep["n_files"] == len(_files(out))
    assert rep["max_file_rows"] <= 128
    assert rep["ordered_within_files"] and rep["ranges_disjoint"]
    assert rep["filename_order_matches"]
    assert rep["size_bounded"] and rep["rows_match"]


def test_verify_shards_catches_tampering(spark, corpus, tmp_path):
    """Each failure mode trips its own named check: an unsorted file
    (order violation + overlapping range), an oversized file, and a
    row-count mismatch."""
    import pyarrow as pa

    from cybersecurity_miw_spark.sources.shards import verify_shards

    out = str(tmp_path / "shards")
    write_shards(corpus, out, shard_rows=128)

    # graft a file whose rows are UNSORTED and whose key range spans
    # the whole corpus (overlaps every real shard)
    bad = pa.table(
        {
            "doc_id": [999_999, 999_998],
            "part": ["zz", "zz"],
            "mix_key": [999.0, 1.5],
        }
    )
    pq.write_table(bad, f"{out}/part-99999-tampered.parquet")

    rep = verify_shards(spark, out, shard_rows=128, n_rows=1000)
    assert not rep["ok"]
    assert not rep["ordered_within_files"]
    assert not rep["ranges_disjoint"]
    assert not rep["rows_match"]  # 1002 != 1000
    assert rep["size_bounded"]  # 2-row graft is within budget

    # unknown order column fails fast
    with pytest.raises(ValueError, match="order_cols"):
        verify_shards(spark, out, order_cols=("nope",))


def test_verify_shards_flags_oversized_file(spark, corpus, tmp_path):
    """A budget tighter than the actual files trips size_bounded (and
    only it) — the check a trainer with a hard memory budget runs."""
    from cybersecurity_miw_spark.sources.shards import verify_shards

    out = str(tmp_path / "shards")
    write_shards(corpus, out, shard_rows=200)
    rep = verify_shards(spark, out, shard_rows=100)
    assert not rep["ok"] and not rep["size_bounded"]
    assert rep["ordered_within_files"] and rep["ranges_disjoint"]


def test_verify_shards_property_random_corpora(spark, tmp_path):
    """Property: for random corpus sizes, key distributions, and
    shard budgets, a fresh write_shards layout ALWAYS verifies green
    with exact row counts and within-budget files."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cybersecurity_miw_spark.sources.shards import (
        verify_shards,
        write_shards,
    )

    case = [0]

    @settings(max_examples=6, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        shard_rows=st.integers(min_value=1, max_value=150),
        mult=st.integers(min_value=1, max_value=97),
    )
    def check(n, shard_rows, mult):
        case[0] += 1
        out = str(tmp_path / f"s{case[0]}")
        df = (
            spark.range(0, n)
            .selectExpr("id AS doc_id")
            .selectExpr(
                "doc_id",
                f"CAST(doc_id * {mult} % 1000 AS DOUBLE) AS mix_key",
            )
        )
        write_shards(df, out, shard_rows=shard_rows, n_rows=n)
        rep = verify_shards(spark, out, shard_rows=shard_rows, n_rows=n)
        assert rep["ok"], rep
        assert rep["n_rows"] == n
        assert rep["max_file_rows"] <= shard_rows

    check()
