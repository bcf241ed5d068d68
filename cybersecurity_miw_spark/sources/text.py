"""Text log sources.

The reference mmaps whole files and carves newline-aligned splits
(reference: metis/defsplitter.hh:23-106); multiple comma-separated
files feed one job (miw/job.cc:35,124-173); a memory-aware autosplit
chunks oversized files (miw/job.cc:269-289). In Spark all of that is
the built-in text source: file listing, split alignment, locality,
spill. What remains of the reference's source surface:

* S3 multi-file input      → spark.read.text([p1, p2, ...])
* S5 in-memory buffer      → createDataFrame of lines
* S6 skip header           → drop the file's first line
* S7 comment-char filter   → filter(~startswith(commentchar))
* S8 blank-line filter     → filter(trim(value) != "")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from cybersecurity_miw_spark.plans.logdef import LogDef

LINE_COL = "value"
_LINE_SCHEMA = StructType([StructField(LINE_COL, StringType())])


FILE_COL = "_file"


def read_logs(
    spark: SparkSession,
    paths: str | list[str],
    ldef: LogDef,
    skip_header: bool = False,
    with_file: bool = False,
) -> DataFrame:
    """Read one or more log files as a line DataFrame with the
    format's comment/blank filtering applied. ``with_file`` rides the
    source file name along as ``_file`` (the reference's per-file
    result mode, miw/job.cc:134-137, becomes an extra group key — one
    job, not one job per file)."""
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    if skip_header:
        # the reference drops line 0 of each file
        # (miw/log_format.cc:194-198). Spark's text source has no row
        # ordinal, but the CSV reader with header=true skips the first
        # line of EVERY file JVM-side. With a delimiter/quote that
        # cannot occur in log text, each remaining line arrives intact
        # as the single `value` column — no driver reads, no shuffle,
        # and data lines that merely equal the header text survive.
        df = (
            spark.read.option("header", True)
            .option("sep", "\u0001")
            .option("quote", "\u0000")
            .option("escape", "\u0000")
            .schema(_LINE_SCHEMA)
            .csv(paths)
        )
    else:
        df = spark.read.text(paths)
    if with_file:
        df = df.withColumn(FILE_COL, F.input_file_name())
    return clean_lines(df, ldef)


def from_lines(spark: SparkSession, lines: list[str], ldef: LogDef) -> DataFrame:
    """In-memory buffer source (reference S5: mr_job over a char*
    buffer, miw/mr_job.h:65-73)."""
    df = spark.createDataFrame([(ln,) for ln in lines], _LINE_SCHEMA)
    return clean_lines(df, ldef)


def clean_lines(df: DataFrame, ldef: LogDef) -> DataFrame:
    """Blank-line and comment-line filters
    (miw/log_format.cc:199-202,217-218)."""
    out = df.filter(F.trim(F.col(LINE_COL)) != "")
    if ldef.commentchar:
        out = out.filter(~F.col(LINE_COL).startswith(ldef.commentchar))
    return out
