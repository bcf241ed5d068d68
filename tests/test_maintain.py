"""Table maintenance (sources/maintain.py): dynamic partition upsert
must leave untouched partitions' files byte-identical, and compaction
must preserve data while collapsing the file count."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources.maintain import (
    compact_partition,
    overwrite_partitions,
)


def _rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path).select("day", "k", "v").collect())
    )


def test_overwrite_partitions_touches_only_incoming(spark, tmp_path):
    out = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("d1", 1, 10.0), ("d1", 2, 20.0), ("d2", 3, 30.0), ("d3", 4, 40.0)],
        "day STRING, k INT, v DOUBLE",
    )
    overwrite_partitions(base, out, ("day",))
    d2_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{out}/day=d2/*.parquet")
    }
    d3_files = set(glob.glob(f"{out}/day=d3/*.parquet"))

    # re-deliver d1 with corrected values; d2/d3 must be untouched
    fix = spark.createDataFrame(
        [("d1", 1, 11.0), ("d1", 5, 50.0)], "day STRING, k INT, v DOUBLE"
    )
    overwrite_partitions(fix, out, ("day",))

    assert _rows(spark, out) == [
        ("d1", 1, 11.0), ("d1", 5, 50.0),
        ("d2", 3, 30.0), ("d3", 4, 40.0),
    ]
    for f, mtime in d2_files.items():
        assert os.path.getmtime(f) == mtime, "d2 files were rewritten"
    assert set(glob.glob(f"{out}/day=d3/*.parquet")) == d3_files


def test_compact_partition_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        F.lit("d1").alias("day"),
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    # simulate micro-batch appends: many small files in one partition
    for i in range(6):
        (
            df.where((F.col("k") % 6) == i)
            .write.mode("append")
            .partitionBy("day")
            .parquet(out)
        )
    before_rows = _rows(spark, out)
    n_before = compact_partition(spark, out, "day=d1", target_files=1)
    assert n_before >= 6
    files_after = glob.glob(f"{out}/day=d1/*.parquet")
    assert len(files_after) == 1
    assert _rows(spark, out) == before_rows
    # staging root cleaned up after the swap
    assert not os.path.exists(f"{out}/.compaction")


def test_compact_staging_is_invisible_to_table_scans(spark, tmp_path):
    """Files parked under table_dir/.compaction (the in-flight rewrite)
    must never be partition-inferred by a concurrent table-level scan —
    dot-prefixed paths are skipped by Spark's file index, so a scan
    during the staging write can't double-read the partition."""
    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("d1", 1, 10.0), ("d2", 2, 20.0)], "day STRING, k INT, v DOUBLE"
    )
    df.write.partitionBy("day").parquet(out)
    before = _rows(spark, out)
    # simulate an in-flight compaction: a full copy of d1 staged under
    # the hidden root exactly as compact_partition lays it out
    stage = os.path.join(out, ".compaction", "day=d1.tmp")
    spark.read.parquet(f"{out}/day=d1").coalesce(1).write.parquet(stage)
    assert _rows(spark, out) == before  # no double-read, no extra part



def test_publish_partitioned_parallel_and_relative_staging(spark, tmp_path):
    """VERDICT r13 #3/#4 + ADVICE r13: (a) a partitioned publish must
    NOT funnel the table through coalesce(target_files) — the shaped
    frame carries one shuffle partition per grain so the write runs
    with >1 task (the rebuilt-IVF remediation path at 100x would be a
    single-task write otherwise); (b) each partition value's rows
    stay colocated (one file per value — the same layout the normal
    append path produces); (c) a BARE RELATIVE table path stages under
    a cwd-relative .maintenance, not '/.maintenance' at the FS root."""
    import posixpath

    from cybersecurity_miw_spark.sources.maintain import (
        _publish_frame,
        _stage_root,
        publish_table,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("vec_id"), (F.col("id") % 8).alias("_cell")
    )
    shaped = _publish_frame(df, ("_cell",), target_files=1)
    # parallel: a hash repartition on the partition columns (AQE may
    # still right-size the tiny test shuffle down, but at volume it
    # scales the task count up — the opposite of coalesce(1)'s hard
    # single-task cap, which never appears in this plan)
    plan = shaped._jdf.queryExecution().analyzed().toString()
    assert "RepartitionByExpression" in plan and "_cell" in plan
    assert "Repartition 1" not in plan
    # colocated: every _cell's rows land in exactly one task
    per_part = shaped.rdd.mapPartitions(
        lambda it: [tuple(sorted({r["_cell"] for r in it}))]
    ).collect()
    seen: dict[int, int] = {}
    for pi, cells in enumerate(per_part):
        for c in cells:
            assert c not in seen, f"_cell {c} split across tasks"
            seen[c] = pi
    assert len(seen) == 8

    # unpartitioned publish keeps the compaction-style coalesce
    unp = _publish_frame(df, (), target_files=1)
    assert unp.rdd.getNumPartitions() == 1
    assert "RepartitionByExpression" not in (
        unp._jdf.queryExecution().analyzed().toString()
    )

    # end-to-end: the published layout is value-partitioned with one
    # file per cell (pruning survives the swap), replacing prior data
    out = str(tmp_path / "idx")
    publish_table(spark, df, out, partition_by=("_cell",))
    rows = publish_table(
        spark, df.filter(F.col("vec_id") < 100), out,
        keep_sidecars=False, partition_by=("_cell",),
    )
    assert rows == 100
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert "_cell" in got.columns
    import glob as _g

    for cell_dir in _g.glob(f"{out}/_cell=*"):
        assert len(_g.glob(f"{cell_dir}/*.parquet")) == 1

    # relative-path staging anchor (ADVICE r13)
    assert _stage_root(posixpath.split("mystore")[0]) == ".maintenance"
    assert _stage_root("/data") == "/data/.maintenance"
