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


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete a file or directory tree on its own filesystem. Returns
    False when the path did not exist (Hadoop semantics)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Rename ``src`` to ``dst`` on their (shared) filesystem —
    directories included. Raises when the filesystem refuses (e.g.
    HDFS rename onto an existing destination); the directory-swap
    dances in ``sources.maintain`` only ever rename onto freshly
    cleared destinations, so plain ``FileSystem.rename`` is the right
    primitive (the overwrite variant lives in :func:`write_text` for
    the sidecar case). One atomic namespace op on local/HDFS; on S3A
    a directory rename is a per-object copy+delete — run maintenance
    in the single-writer window the callers already assume."""
    fs, hsrc = _fs_and_path(spark, src)
    hdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not bool(fs.rename(hsrc, hdst)):
        raise IOError(f"rename {src} -> {dst} failed")


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Names (not full paths) of the direct children of a directory
    on its own filesystem — the ``os.listdir`` shape the maintenance
    dances need for sidecar carry-over and file counting."""
    fs, hpath = _fs_and_path(spark, path)
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def list_file_names(spark: SparkSession, path: str) -> list[str]:
    """Like :func:`list_names` but FILES only. The sidecar carry-over
    must use this, not list_names: a partitioned table's
    ``_cell=0/`` partition DIRECTORIES also start with ``_``, and
    renaming one onto an existing destination directory nests it
    INSIDE (Hadoop rename semantics) — old data silently re-enters
    the new layout as a doubled partition level (found by the r14
    prune_ivf_index golden)."""
    fs, hpath = _fs_and_path(spark, path)
    return [
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.isFile()
    ]


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file from any Hadoop-supported filesystem.

    One JVM-side drain of the whole stream (commons-io, on Spark's
    classpath) — not one py4j round trip per byte (ADVICE r9), so
    this stays O(1) JVM calls even if a sidecar grows past a few
    bytes. (A py4j ``readFully(buf)`` would fill a Java-side COPY of
    the Python bytearray — mutations don't propagate back — so the
    drain must happen entirely in the JVM and return the byte[].)"""
    fs, hpath = _fs_and_path(spark, path)
    stream = fs.open(hpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def write_text(
    spark: SparkSession, path: str, content: str, overwrite: bool = True
) -> None:
    """Write a small text file to any Hadoop-supported filesystem
    (parent directories are created as needed).

    Atomic against concurrent readers (ADVICE r9/r10): the bytes land
    in a dot-prefixed temp sibling first (uuid-suffixed, so concurrent
    writers never share a temp name), then a SINGLE rename publishes
    the final path — never delete-then-rename, which opens a window
    where the destination is absent and a racing reader's ``exists()``
    guard silently degrades (and a crash in the window loses the file
    outright). Plain ``FileSystem.rename`` overwrites on local; HDFS
    refuses rename-onto-existing, so that case falls through to
    ``FileContext.rename(…, Options.Rename.OVERWRITE)``, which is a
    single atomic namespace op. (On S3A rename is copy+delete, not
    atomic, but the final object still only appears complete — S3
    PUTs are all-or-nothing.) Dot/underscore-prefixed temp names stay
    invisible to Spark's file readers if a crash strands one."""
    import uuid

    fs, hpath = _fs_and_path(spark, path)
    parent = hpath.getParent()
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(
        parent, "." + hpath.getName() + "." + uuid.uuid4().hex[:12] + ".tmp"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if not overwrite and fs.exists(hpath):
        fs.delete(tmp, False)
        raise IOError(f"{hpath} exists and overwrite=False")
    if bool(fs.rename(tmp, hpath)):
        return
    # HDFS-style filesystems refuse rename-onto-existing; FileContext
    # exposes the explicit-overwrite rename (one atomic namespace op,
    # no absent-destination window)
    try:
        gw = spark._sc._gateway
        rename_enum = jvm.org.apache.hadoop.fs.Options.Rename
        opts = gw.new_array(rename_enum, 1)
        opts[0] = rename_enum.OVERWRITE
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration()
        )
        fc.rename(tmp, hpath, opts)
    except Exception as exc:
        fs.delete(tmp, False)
        raise IOError(f"rename {tmp} -> {hpath} failed") from exc
