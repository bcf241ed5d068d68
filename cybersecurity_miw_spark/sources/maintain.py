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


def rewrite_table(
    spark: SparkSession,
    table_dir: str,
    transform=None,
    target_files: int = 1,
) -> dict:
    """Atomically rewrite an UNPARTITIONED parquet directory —
    optionally applying ``transform`` (DataFrame -> DataFrame) — into
    ``target_files`` files. The maintenance primitive for
    append-per-micro-batch tables (the incremental dedup stores): a
    store that gained one file per trigger turns every ingest join
    into a task-scheduling exercise, and the one crash-loss mode
    (doc re-accepted after a lost store append) leaves duplicate
    index rows that ``transform`` can collapse.

    Same temp-dir + rename dance as :func:`compact_partition`, with
    the same honesty about its limits: staging lives under a
    dot-prefixed sibling so scans never see the in-flight copy, but
    POSIX cannot atomically EXCHANGE two directories — between the
    two renames the table path is briefly absent, and a reader
    landing in that instant errors (or, for the streaming loops'
    try/except store read, treats the store as empty for that one
    trigger). Run maintenance in a single-writer window with the
    readers quiesced — the same assumption the reference's tmp-save
    makes (miw/job.cc:197-226). A crash between the renames strands
    the data under ``.maintenance/<name>.old`` (nothing is deleted
    until the new copy is in place — recovery is one rename back).
    Dot/underscore-prefixed sidecar files (e.g. the streaming loop's
    ``_lsh_params.json``) are carried over to the rewritten table.
    Returns {'files_before', 'files_after', 'rows_before',
    'rows_after'}."""
    df = spark.read.parquet(table_dir)
    rows_before = df.count()
    files_before = len(
        [f for f in os.listdir(table_dir) if f.endswith(".parquet")]
    )
    out = transform(df) if transform is not None else df
    out = out.coalesce(target_files)

    parent, name = os.path.split(os.path.normpath(table_dir))
    stage_root = os.path.join(parent, ".maintenance")
    tmp_dir = os.path.join(stage_root, name + ".tmp")
    old_dir = os.path.join(stage_root, name + ".old")
    for d in (tmp_dir, old_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    out.write.mode("overwrite").parquet(tmp_dir)
    rows_after = spark.read.parquet(tmp_dir).count()
    os.rename(table_dir, old_dir)
    os.rename(tmp_dir, table_dir)
    # carry metadata sidecars (not data, not Spark's _SUCCESS) over
    for f in os.listdir(old_dir):
        if f.startswith("_") and f != "_SUCCESS" and not f.endswith(".crc"):
            shutil.move(
                os.path.join(old_dir, f), os.path.join(table_dir, f)
            )
    shutil.rmtree(old_dir)
    if not os.listdir(stage_root):
        os.rmdir(stage_root)
    files_after = len(
        [f for f in os.listdir(table_dir) if f.endswith(".parquet")]
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows_before": rows_before,
        "rows_after": rows_after,
    }


def publish_table(
    spark: SparkSession,
    df,
    table_dir: str,
    target_files: int = 1,
    keep_sidecars: bool = True,
) -> int:
    """Atomically REPLACE ``table_dir``'s data with ``df`` — the same
    temp-dir + rename dance (and the same brief-absence honesty) as
    :func:`rewrite_table`, but taking the new contents from a
    DataFrame instead of transforming the old ones. The store-rebuild
    primitive: the staleness remediations recompute a frozen artifact
    from CURRENT data and need to publish the result over the live
    directory without readers ever seeing a half-written copy.
    ``keep_sidecars=False`` drops the old ``_``-prefixed sidecars
    (the rebuild case — the caller re-records fresh params/baselines
    afterwards; keeping a stale baseline would defeat the rebuild).
    Returns the row count written. First-publish (no existing dir)
    degrades to a plain write."""
    parent, name = os.path.split(os.path.normpath(table_dir))
    if not os.path.exists(table_dir):
        df.coalesce(target_files).write.parquet(table_dir)
        return spark.read.parquet(table_dir).count()
    stage_root = os.path.join(parent, ".maintenance")
    tmp_dir = os.path.join(stage_root, name + ".tmp")
    old_dir = os.path.join(stage_root, name + ".old")
    for d in (tmp_dir, old_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp_dir)
    rows = spark.read.parquet(tmp_dir).count()
    os.rename(table_dir, old_dir)
    os.rename(tmp_dir, table_dir)
    if keep_sidecars:
        for f in os.listdir(old_dir):
            if (
                f.startswith("_")
                and f != "_SUCCESS"
                and not f.endswith(".crc")
            ):
                shutil.move(
                    os.path.join(old_dir, f), os.path.join(table_dir, f)
                )
    shutil.rmtree(old_dir)
    if os.path.exists(stage_root) and not os.listdir(stage_root):
        os.rmdir(stage_root)
    return rows
