"""Companion-app equivalents (§2.8): the reference ships Metis demo
apps alongside the log engine — wordcount (app/wc.cc:59-100), value
histogram (app/hist.cc:110-133, a 256-bucket per-byte-value count),
linear regression via the five moment sums (app/linear_regression.cc:
92-108,178-200), string match, word-reverse-index (app/wr.hh), matrix
multiply (app/matrix_mult.cc), pca row covariance (app/pca.cc), and
integer k-means (app/kmeans.cc).

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


def matrix_multiply(a_cells: DataFrame, b_cells: DataFrame) -> DataFrame:
    """C = A·B over cell-form matrices (app/matrix_mult.cc:105-137
    walks row-blocks of dense in-memory int matrices; the distributed
    form is cells): ``a_cells`` has columns (i, k, a), ``b_cells``
    (k, j, b), result (i, j, c) with c = Σₖ a·b.

    This is the canonical shuffle-join matmul: both sides hash-
    partition on the shared inner dimension k, products partially
    aggregate map-side before the (i, j) shuffle. Catalyst broadcasts
    the B side when it is small (< autoBroadcastJoinThreshold), which
    is the dense-block analog of the reference keeping B resident
    while streaming A. Integer products keep sums order-independent
    and therefore oracle-exact."""
    return (
        a_cells.join(b_cells, "k")
        .select("i", "j", (F.col("a") * F.col("b")).alias("_p"))
        .groupBy("i", "j")
        .agg(F.sum("_p").cast("long").alias("c"))
    )


def matrix_multiply_blocked(
    a_cells: DataFrame, b_cells: DataFrame, block: int = 8
) -> DataFrame:
    """Block-partitioned C = A·B (app/matrix_mult2.cc:84-106 tiles the
    multiply into ``block_len`` squares so each tile's inner loop stays
    in L1 and vectorizes; the distributed analog tiles so each shuffled
    unit is a dense sub-matrix, not a scalar partial product).

    Input/output cell schema matches :func:`matrix_multiply`:
    ``a_cells`` (i, k, a), ``b_cells`` (k, j, b) → (i, j, c).

    Why this is THE scale path: the cell matmul shuffles one row per
    partial product — n³ rows to the (i, j) aggregation. Blocking with
    side L shuffles (1) one row per *block* to the bk-join — n²/L²
    rows, each carrying L² packed cells — and (2) one row per partial
    *cell* of a block pair after the block-local multiply — n³/L rows.
    Every shuffled byte count drops by ~L; at L=32 the 100 TB shuffle
    shrinks 32x. The block-local L×L×L multiply runs as dense int64
    numpy (BLAS-style, Arrow-batched) — the same justified-Python
    pattern as similarity.brute_force_topk_arrow: Spark has no dense
    sub-matrix product built-in, and per-cell expression trees are
    exactly the n³ blow-up blocking exists to avoid.

    Missing cells are treated as zero inside a block (dense scatter;
    duplicate coordinates accumulate, matching the cell path's join
    semantics), so for matrices whose populated cell set is
    rectangular-dense the result set is identical to the cell path.
    Negative coordinates are supported via floor-div/pmod block
    addressing."""
    import numpy as np
    import pandas as pd

    lb = F.lit(block)

    def pack(df, row, col, val):
        # one row per block: parallel pos/val arrays sorted by pos so
        # the two collect_lists can never disagree on element order.
        # floor-div + pmod keep negative coordinates consistent
        # (i == _br*L + i_loc for ANY sign; a plain cast-divide
        # truncates toward zero and pairs with a sign-carrying %,
        # scattering negative cells into the wrong block slot)
        pos = F.pmod(F.col(row), lb) * lb + F.pmod(F.col(col), lb)
        packed = df.select(
            F.floor(F.col(row) / lb).cast("long").alias("_br"),
            F.floor(F.col(col) / lb).cast("long").alias("_bc"),
            F.struct(pos.cast("long").alias("pos"),
                     F.col(val).cast("long").alias("val")).alias("_cell"),
        )
        cells = F.array_sort(F.collect_list("_cell"))
        return (
            packed.groupBy("_br", "_bc")
            .agg(cells.alias("_cells"))
            .select(
                "_br", "_bc",
                F.transform("_cells", lambda c: c["pos"]).alias("_pos"),
                F.transform("_cells", lambda c: c["val"]).alias("_val"),
            )
        )

    ablocks = pack(a_cells, "i", "k", "a").withColumnsRenamed(
        {"_br": "_bi", "_bc": "_bk", "_pos": "_apos", "_val": "_aval"}
    )
    bblocks = pack(b_cells, "k", "j", "b").withColumnsRenamed(
        {"_br": "_bk", "_bc": "_bj", "_pos": "_bpos", "_val": "_bval"}
    )
    paired = ablocks.join(bblocks, "_bk")

    def multiply(batches):
        for pdf in batches:
            outs = []
            for bi, bj, apos, aval, bpos, bval in zip(
                pdf["_bi"], pdf["_bj"],
                pdf["_apos"], pdf["_aval"], pdf["_bpos"], pdf["_bval"],
            ):
                da = np.zeros((block, block), dtype=np.int64)
                # add.at accumulates duplicate coordinates, matching
                # the cell path where a join over duplicated (i, k)
                # rows sums their partial products
                np.add.at(
                    da.reshape(-1),
                    np.asarray(apos, dtype=np.int64),
                    np.asarray(aval, dtype=np.int64),
                )
                db = np.zeros((block, block), dtype=np.int64)
                np.add.at(
                    db.reshape(-1),
                    np.asarray(bpos, dtype=np.int64),
                    np.asarray(bval, dtype=np.int64),
                )
                prod = da @ db
                # emit the full product block (zeros included): on
                # rectangular-dense inputs this keeps the output row
                # set identical to the cell path's join semantics
                ii, jj = np.indices((block, block))
                outs.append(pd.DataFrame({
                    "i": bi * block + ii.ravel(),
                    "j": bj * block + jj.ravel(),
                    "_p": prod.ravel(),
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partial = paired.mapInPandas(multiply, "i long, j long, _p long")
    return partial.groupBy("i", "j").agg(F.sum("_p").cast("long").alias("c"))


def row_covariance(cells: DataFrame, n_cols: int) -> DataFrame:
    """app/pca.cc row-pair covariance (pca_mean::map_function
    pca.cc:161-178, pca_cov::map_function pca.cc:252-288): rows are
    the variables; mean_i = (Σₖ m[i][k]) / n_cols with C integer
    division, and for every upper-triangle pair i ≤ j
    cov(i,j) = (Σₖ (m[i][k]−mean_i)(m[j][k]−mean_j)) / (n_rows−1),
    again C integer division.

    ``cells`` holds (i, k, q) with q a NON-NEGATIVE integer (quantize
    before calling): non-negative row sums make the mean division
    identical under trunc (C, Spark ``div``) and floor (DuckDB ``//``)
    semantics. The centered sum expands to exact-integer Gram form
        dot(i,j) − mean_j·rowsum_i − mean_i·rowsum_j
        + n_cols·mean_i·mean_j
    so the plan is one self-join on the column dimension k (the same
    shuffle-join matmul shape as :func:`matrix_multiply`, computing
    A·Aᵀ) plus a broadcast of the tiny per-row stats — no per-pair
    re-scan of the rows, and partial aggregation bounds every buffer.
    The final signed division replicates C truncation portably as
    sign(x)·(|x| div (n−1)).

    Output: (row_i, row_j, mean_i, mean_j, cov) for i ≤ j. Inherently
    O(n_rows²) pairs — the reference app's own semantics; cap the row
    count upstream (the catalog query does) exactly as the reference
    caps matrix_len."""
    rowstats = cells.groupBy(F.col("i").alias("r")).agg(
        F.sum("q").cast("long").alias("rowsum"),
        (F.sum("q").cast("long") / F.lit(n_cols))
        .cast("long")
        .alias("mean"),
    )
    n_rows = rowstats.select(F.count(F.lit(1)).alias("_n"))
    a = cells.select(F.col("i"), F.col("k"), F.col("q").alias("qa"))
    b = cells.select(
        F.col("i").alias("j"), F.col("k"), F.col("q").alias("qb")
    )
    gram = (
        a.join(b, "k")
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).cast("long").alias("dot"))
    )
    from pyspark.sql.functions import broadcast

    sa = rowstats.select(
        F.col("r"),
        F.col("rowsum").alias("rowsum_i"),
        F.col("mean").alias("mean_i"),
    )
    sb = rowstats.select(
        F.col("r").alias("r2"),
        F.col("rowsum").alias("rowsum_j"),
        F.col("mean").alias("mean_j"),
    )
    num = (
        F.col("dot")
        - F.col("mean_j") * F.col("rowsum_i")
        - F.col("mean_i") * F.col("rowsum_j")
        + F.lit(n_cols) * F.col("mean_i") * F.col("mean_j")
    )
    denom = F.col("_n") - F.lit(1)
    cov = (
        F.signum(num).cast("long")
        * F.floor(F.abs(num) / denom).cast("long")
    ).cast("long")
    return (
        # bcast-bound: sa/sb = matrix row count (gram is O(n^2) pairs, so n
        #   is feasibility-bounded); n_rows = 1 row
        gram.join(broadcast(sa), gram["i"] == sa["r"])
        .join(broadcast(sb), gram["j"] == sb["r2"])
        .crossJoin(broadcast(n_rows))
        .select(
            F.col("i").alias("row_i"),
            F.col("j").alias("row_j"),
            "mean_i",
            "mean_j",
            cov.alias("cov"),
        )
    )


def kmeans_assign_int(
    points: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "q",
    out_col: str = "cell",
) -> DataFrame:
    """Integer Lloyd assignment (app/kmeans.cc:166-199 get_sq_dist /
    find_clusters): nearest centroid by exact integer squared L2,
    ties to the LOWEST centroid index (the reference's strict-< scan
    keeps the first minimum). Centroids are literal arrays —
    constant-folded projection, no join, no shuffle."""
    v = F.col(vec_col)
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(int(x)).cast("long") for x in c]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, d: acc + d,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return points.withColumn(out_col, F.array_min(dists)["cell"])


def kmeans_step(
    points: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "q",
) -> DataFrame:
    """One integer Lloyd update (app/kmeans.cc:201-232
    calc_means: new mean = coordinate sum / cluster size, C integer
    division — exact across engines for non-negative coordinates).
    Returns (cell, dim, n, mean): per-centroid per-dimension new
    means. Scale shape: posexplode to (cell, dim, x) then sum — a
    partial aggregate holds at most k×dim longs, never a cluster's
    member vectors (same staging as similarity.train_centroids)."""
    assigned = kmeans_assign_int(points, centroids, vec_col)
    return (
        assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("dim", "x")
        )
        .groupBy("cell", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("x").cast("long") / F.count(F.lit(1)))
            .cast("long")
            .alias("mean"),
        )
    )


def kmeans_train_int(
    points: DataFrame,
    k: int,
    dim: int,
    vec_col: str = "q",
    max_iters: int = 10,
) -> list[list[int]]:
    """Full integer Lloyd loop (app/kmeans.cc:268-290 iterates until
    no mean moves; ``max_iters`` bounds it). Driver traffic per
    iteration is k×dim longs — the centroids only."""
    rows = points.select(vec_col).limit(k).collect()
    cents = [list(r[0]) for r in rows]
    for _ in range(max_iters):
        stepped = kmeans_step(points, cents, vec_col).collect()
        nxt = [list(c) for c in cents]
        for r in stepped:
            nxt[r["cell"]][r["dim"]] = r["mean"]
        if nxt == cents:
            break
        cents = nxt
    return cents
