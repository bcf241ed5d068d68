"""Output sinks with the reference's output-shape parity.

Reference JSON-lines shape (miw/log_record.cc:649-679): one object per
group with keys ``id`` (composite key), each field's name (scalar when
one value, array when several), ``<name>_counts`` histograms, ``logs``
(group row count), ``format_name``, ``appname`` when set, and
``std_date_dt`` = "<date>T<time>Z" assembled from the first date-typed
and time-typed fields (defaults "0000-00-00" / "00:00:00",
miw/log_record.cc:655,673). CSV flattens the same object with arrays
rendered "[a,b]" (miw/log_record.cc:681-745); console shows the top-K
groups by count (miw/mr_job.cc:74-107).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cybersecurity_miw_spark.functions.cols import qcol
from cybersecurity_miw_spark.operators.aggregate import order_final, top_k
from cybersecurity_miw_spark.plans.logdef import LogDef


def _std_date_dt(ldef: LogDef, df: DataFrame) -> Column:
    """std_date_dt assembly (miw/log_record.cc:556-561,649-679): the
    LAST date-typed and LAST time-typed field values win; an
    hour-processed time expands to HH:00:00 and a minute-processed one
    to HH:MM:00; a date value that already carries a time component
    (hour/minute/second-bucketed, contains 'T') is emitted alone as
    ``<date>Z`` without appending the time part."""
    date_part: Column = F.lit("0000-00-00")
    time_part: Column = F.lit("00:00:00")
    for f in ldef.fields:
        if f.type == "date" and f.name in df.columns:
            date_part = F.coalesce(qcol(f.name).cast("string"), date_part)
    for f in ldef.fields:
        if f.type == "time" and f.name in df.columns:
            t = qcol(f.name).cast("string")
            if f.processing == "hour":
                t = F.concat(t, F.lit(":00:00"))
            elif f.processing == "minute":
                t = F.concat(t, F.lit(":00"))
            time_part = F.coalesce(t, time_part)
    return F.when(
        date_part.contains("T"), F.concat(date_part, F.lit("Z"))
    ).otherwise(F.concat(date_part, F.lit("T"), time_part, F.lit("Z")))


def finalize(df: DataFrame, ldef: LogDef) -> DataFrame:
    """Attach the reference's metadata columns (format_name, appname,
    std_date_dt) and apply the final ordering."""
    out = df.withColumn("format_name", F.lit(ldef.format_name))
    if ldef.appname:
        out = out.withColumn("appname", F.lit(ldef.appname))
    out = out.withColumn("std_date_dt", _std_date_dt(ldef, df))
    return order_final(out)


def write_json(df: DataFrame, ldef: LogDef, path: str, mode: str = "overwrite") -> None:
    """S11 JSON-lines sink (miw/mr_job.cc:118-145)."""
    finalize(df, ldef).write.mode(mode).json(path)


def write_csv(df: DataFrame, ldef: LogDef, path: str, mode: str = "overwrite") -> None:
    """S12 CSV sink — arrays/maps rendered as JSON text
    ("[a,b]"-style, miw/log_record.cc:713-738)."""
    out = finalize(df, ldef)
    cols = []
    for name, dtype in out.dtypes:
        if dtype.startswith(("array", "map", "struct")):
            cols.append(F.to_json(qcol(name)).alias(name))
        else:
            cols.append(qcol(name))
    out.select(*cols).write.mode(mode).option("header", True).csv(path)


def write_text(
    df: DataFrame,
    ldef: LogDef,
    path: str,
    mode: str = "overwrite",
    codec: str | None = None,
) -> None:
    """S10 text sink: "<key> - <count>" per line (miw/mr_job.cc:109-116)."""
    w = finalize(df, ldef).select(
        F.concat_ws(" - ", F.col("id"), F.col("logs").cast("string")).alias("value")
    ).write.mode(mode)
    if codec:
        w = w.option("compression", codec)
    w.text(path)


def show_top(df: DataFrame, ldef: LogDef, k: int = 5) -> list:
    """S9 console top-K sink (miw/mr_job.cc:74-107, default ndisp=5).
    Returns the rows as well so callers can assert on them."""
    rows = top_k(finalize(df, ldef), k).collect()
    for r in rows:
        print(f"{r['id']} - {r['logs']}")
    return rows
