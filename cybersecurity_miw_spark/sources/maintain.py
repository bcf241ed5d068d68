"""Table maintenance for plain-parquet layouts: partition-scoped
upsert and small-file compaction — the two operations a continuously
ingested table needs that a write-once pipeline doesn't.

Plain parquet has no ACID MERGE; what it DOES have is partition
atomicity-by-directory. ``overwrite_partitions`` leans on Spark's
dynamic partition overwrite (only partitions present in the incoming
batch are replaced; every other partition's files are untouched) —
the "replaceWhere" pattern for late-arriving corrections keyed by a
partition column (a day re-delivered, one source re-ingested). At
100 TB this rewrites the touched day, not the table.

``compact_partition`` rewrites one partition directory into N
right-sized files — streaming sinks append a file per micro-batch,
and a thousand 100 KB files turn every later scan into a
task-scheduling exercise; periodic compaction is what keeps the
read path healthy. The rewrite goes through a temp dir + atomic
directory swap so readers never see a half-compacted partition.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def overwrite_partitions(
    df: DataFrame,
    out_dir: str,
    partition_cols: tuple[str, ...],
) -> None:
    """Write ``df`` into the partitioned layout at ``out_dir``,
    replacing ONLY the partitions the batch contains (dynamic
    partition overwrite). First write creates the layout; later
    writes upsert whole partitions."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(out_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partition(
    spark: SparkSession,
    table_dir: str,
    partition_subdir: str,
    target_files: int = 1,
) -> int:
    """Rewrite ``table_dir/partition_subdir`` (e.g. ``"day=2024-01-02"``)
    into ``target_files`` parquet files. Returns the file count before
    compaction.

    Staging dirs live under ``table_dir/.compaction/`` — a dot-prefixed
    name Spark's file index skips, so a concurrent TABLE-level scan
    never partition-infers the in-flight copy and double-reads the
    data. Atomicity is per-partition-READER only: a reader that lists
    the partition path sees the old file set or the new one, but
    between the two renames the partition directory itself is briefly
    absent — a table-scan landing in that instant misses the partition
    (single-writer maintenance windows are assumed, as in the
    reference's tmp-save design, miw/job.cc:197-226)."""
    part_dir = os.path.join(table_dir, partition_subdir)
    n_before = len(
        [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    )
    # hidden staging root: leading '.' => invisible to Spark's
    # InMemoryFileIndex partition discovery (and to duckdb globs)
    stage_root = os.path.join(table_dir, ".compaction")
    safe_name = partition_subdir.replace(os.sep, "__")
    tmp_dir = os.path.join(stage_root, safe_name + ".tmp")
    old_dir = os.path.join(stage_root, safe_name + ".old")
    for d in (tmp_dir, old_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    (
        spark.read.parquet(part_dir)
        .coalesce(target_files)
        .write.mode("overwrite")
        .parquet(tmp_dir)
    )
    os.rename(part_dir, old_dir)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(old_dir)
    if not os.listdir(stage_root):
        os.rmdir(stage_root)
    return n_before
