"""Log compaction (app/simple_log_compacter.cc:30-37 — the generic
miw job binary shipped as a dedup/compact utility: read log files,
collapse identical lines, write the survivors).

Spark-first this is a single ``dropDuplicates`` over the line column:
hash-partition on the full line (uniform key — identical lines hash
together, everything else spreads), keep one survivor per group. One
shuffle, map-side partial dedup first, no driver involvement — the
shape that compacts a 100 TB log corpus as readily as a directory of
syslog files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources.text import LINE_COL


def compact_lines(lines: DataFrame, line_col: str = LINE_COL) -> DataFrame:
    """Collapse exact-duplicate lines; survivors keep no order (the
    reference's map-reduce output order is unspecified too — callers
    that need stable output sort at the sink)."""
    return lines.select(line_col).dropDuplicates([line_col])


def compact_logs(
    spark: SparkSession,
    paths: str | list[str],
    with_counts: bool = False,
) -> DataFrame:
    """Compact one or more log files. ``with_counts`` additionally
    reports how many raw occurrences each surviving line had (same
    single shuffle — the count rides the dedup aggregation)."""
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    lines = spark.read.text(paths)
    if not with_counts:
        return compact_lines(lines)
    return (
        lines.groupBy(LINE_COL)
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
