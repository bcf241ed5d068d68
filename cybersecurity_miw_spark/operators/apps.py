"""Companion-app equivalents (§2.8): the reference ships Metis demo
apps alongside the log engine — wordcount (app/wc.cc:59-100), value
histogram (app/hist.cc:110-133, a 256-bucket per-byte-value count),
linear regression via the five moment sums (app/linear_regression.cc:
92-108,178-200), string match, kmeans.

Spark-first: each is a one-liner groupBy/agg over a column — partial
aggregation map-side, one shuffle of at most n_buckets (or 1) rows.
Moment sums are computed in exact integer space (inputs scaled to
cents) so the results are bit-stable across engines and the DuckDB
oracle hash-matches; the slope/intercept division happens once on the
exact sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    col: str | Column,
    n_buckets: int = 256,
    lo: float = 0.0,
    hi: float = 256.0,
) -> DataFrame:
    """Equi-width value histogram (app/hist.cc:110-133 counts exact
    byte values; the general form floors into ``n_buckets`` buckets
    over [lo, hi)). Out-of-range values clamp into the edge buckets.
    One shuffle of ≤ n_buckets rows after map-side partial counts."""
    c = F.col(col) if isinstance(col, str) else col
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def linreg_sums(df: DataFrame, x: str | Column, y: str | Column) -> DataFrame:
    """The five moment sums of simple linear regression
    (app/linear_regression.cc:92-108): one row with n, sx, sy, sxx,
    syy, sxy. Inputs must already be exact integers (cast/scale before
    calling) so sums are order-independent."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(xc * yc).alias("sxy"),
    )


def linreg_fit(df: DataFrame, x: str | Column, y: str | Column) -> DataFrame:
    """Slope/intercept from the exact moment sums
    (app/linear_regression.cc:190-200: a = (n·SXY − SX·SY) /
    (n·SXX − SX²), b = (SY − a·SX) / n).

    Every operand is cast to double BEFORE any arithmetic so the
    expression is a fixed sequence of IEEE-754 ops — an oracle engine
    running the same casts and order produces bit-identical slopes
    (n·SXY overflows int64 at sf≥0.1, so exact integer arithmetic is
    not an option)."""
    sums = linreg_sums(df, x, y)
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    a = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        a.alias("slope"),
        ((sy - a * sx) / n).alias("intercept"),
    )


def word_reverse_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """app/wr.hh word-reverse-index: word → postings list + count. The
    reference emits each word's byte address in the mmap'd input
    (wr.hh:map_function's ``map_emit(k, index, klen)``); the relational
    analog of "where does the word occur" is (doc, position), encoded
    doc_id·2²⁰ + position so the postings stay a flat sorted int64
    array (documents under 1M tokens each).

    Plan: posexplode → groupBy(word) with map-side partial collect;
    ``max_postings`` keeps only the first N postings per word (hot
    stopwords would otherwise grow unbounded arrays — same hazard as
    the A8 union cap)."""
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    )
    posting = (F.col(id_col) * F.lit(1 << 20) + F.col("pos")).cast("long")
    g = words.groupBy("word").agg(
        F.sort_array(F.collect_list(posting)).alias("postings"),
        F.count(F.lit(1)).alias("n"),
    )
    if max_postings is not None:
        g = g.select(
            "word",
            F.slice("postings", 1, max_postings).alias("postings"),
            "n",
        )
    return g


def string_match_count(
    df: DataFrame, col: str | Column, needle: str
) -> DataFrame:
    """app/string_match.cc: count lines containing the needle."""
    c = F.col(col) if isinstance(col, str) else col
    return df.agg(
        F.sum(F.when(c.contains(needle), 1).otherwise(0))
        .cast("bigint")
        .alias("matches")
    )
