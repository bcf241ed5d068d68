"""Z-order (Morton-curve) data layout: cluster a table on MULTIPLE
columns at once so parquet min/max statistics prune files and row
groups for predicates on ANY of them — the write-side companion to
predicate pushdown (a filter can only skip a row group whose stats
exclude it; stats are only tight if the layout co-locates similar
values).

A single-column sort gives perfect pruning on that column and none on
the others. Interleaving the bits of several quantized columns into
one sort key (the Morton / Z-value) gives every participating column
locality proportional to its bit share — the standard multi-dimension
clustering technique of lakehouse OPTIMIZE/CLUSTER BY commands,
expressed here with public Spark pieces: one tiny min/max agg job,
a pure-expression bit interleave, and
``repartitionByRange(z).sortWithinPartitions(z)`` so file AND
row-group boundaries both follow the curve.

Everything is JVM expressions (the interleave compiles to one
``aggregate()`` fold over bit positions inside whole-stage codegen);
the only driver traffic is the per-column min/max pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear map of [lo, hi] onto [0, 2^bits), clamped; nulls → 0
    (they sort first, which keeps them in few row groups)."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(span))
        * F.lit(float((1 << bits) - 1))
    )
    q = F.round(scaled, 0).cast("long")
    return F.coalesce(
        F.greatest(F.lit(0).cast("long"), F.least(q, F.lit((1 << bits) - 1).cast("long"))),
        F.lit(0).cast("long"),
    )


def _zvalue_expr(qcols: list[str], bits: int, d: int) -> str:
    """Morton interleave as one SQL ``aggregate()`` fold over bit
    positions: quantized column i contributes its bit j to output bit
    j*d + i (acc | Σ_i ((q_i >> j) & 1) << (j*d + i)). Shift amounts
    are expressions, fine in SQL — only the pyspark shift wrappers
    require python-int counts."""
    parts = " | ".join(
        f"shiftleft(shiftright({qc}, j) & 1L, cast(j * {d} + {i} as int))"
        for i, qc in enumerate(qcols)
    )
    return f"aggregate(sequence(0, {bits - 1}), cast(0 as long), (acc, j) -> acc | {parts})"


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int | None = None,
    stats: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append a ``_z`` Morton key over ``cols``. ``stats`` maps each
    column to its (min, max) — pass them when known (e.g. from table
    metadata) to skip the one stats job this otherwise runs."""
    d = len(cols)
    if d < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits is None:
        bits = 63 // d
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed long")
    if stats is None:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        stats = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
    qnames = [f"_zq_{i}" for i in range(d)]
    out = df
    for i, c in enumerate(cols):
        lo, hi = stats[c]
        out = out.withColumn(qnames[i], _quantize(F.col(c), lo, hi, bits))
    out = out.withColumn("_z", F.expr(_zvalue_expr(qnames, bits, d)))
    return out.drop(*qnames)


def write_zordered(
    df: DataFrame,
    out_dir: str,
    cols: tuple[str, ...],
    num_files: int = 8,
    bits: int | None = None,
    stats: dict[str, tuple[float, float]] | None = None,
    rows_per_group: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve over
    ``cols``: range-partition by ``_z`` (file boundaries follow the
    curve; sampled bounds keep files balanced under skew), sort
    within partitions (row-group stats tighten inside each file),
    drop the key. ``rows_per_group`` shrinks parquet row groups for
    finer-grained skipping (leave None for the format default)."""
    keyed = zorder_key(df, cols, bits=bits, stats=stats)
    writer = (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    if rows_per_group is not None:
        writer = writer.option("parquet.block.size", 1024 * 1024).option(
            "parquet.page.row.count.limit", rows_per_group
        )
    writer.parquet(out_dir)
