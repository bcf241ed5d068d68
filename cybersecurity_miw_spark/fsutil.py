"""Filesystem-agnostic small-file I/O via the Hadoop FileSystem API.

Store sidecars (``_lsh_params.json`` next to a band store) must work
wherever the store itself lives — local paths, ``hdfs://``,
``s3a://``. Driver-local ``open()``/``os.path`` silently no-ops the
read guard and crashes the write on any non-local URI (ADVICE r8), so
every sidecar touch goes through the same Hadoop FileSystem the
parquet I/O uses. Underscore-prefixed names are ignored by Spark's
file readers (the ``_SUCCESS`` convention), so a sidecar inside the
store directory never pollutes ``spark.read.parquet(store_dir)``.

Driver-side only, O(bytes of one small JSON) — never used on a data
path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists on its own filesystem."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file from any Hadoop-supported filesystem."""
    fs, hpath = _fs_and_path(spark, path)
    stream = fs.open(hpath)
    try:
        chunks = []
        while True:
            b = stream.read()
            if b < 0:
                break
            chunks.append(b)
        return bytes(chunks).decode("utf-8")
    finally:
        stream.close()


def write_text(
    spark: SparkSession, path: str, content: str, overwrite: bool = True
) -> None:
    """Write a small text file to any Hadoop-supported filesystem
    (parent directories are created as needed)."""
    fs, hpath = _fs_and_path(spark, path)
    out = fs.create(hpath, overwrite)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
