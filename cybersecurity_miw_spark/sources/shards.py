"""Training-shard writer: the last-mile step after curation —
materialize a corpus as size-bounded, deterministically-ordered
parquet shards a trainer can stream.

Scale shape: ONE range exchange (repartitionByRange on the order key
samples range bounds and distributes rows so shard sizes stay bounded
regardless of upstream skew) + an in-partition sort that makes file
contents a pure function of the data — re-running the writer over the
same input yields byte-identical row sequences per shard, which is
what makes shard manifests and resumable training jobs possible.
``maxRecordsPerFile`` is the belt-and-braces cap: even if a range
bound lands badly, no file exceeds the budget."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_shards(
    df: DataFrame,
    out_dir: str,
    shard_rows: int,
    order_cols: tuple[str, ...] = ("mix_key", "doc_id"),
    n_rows: int | None = None,
) -> int:
    """Write ``df`` as ordered parquet shards of at most
    ``shard_rows`` rows each; returns the number of range partitions
    used. ``order_cols`` must be a total order (include a unique id
    as the tiebreak) or file contents are not deterministic.

    ``n_rows`` skips the count job when the caller already knows the
    cardinality (e.g. from the corpus report)."""
    if shard_rows < 1:
        raise ValueError("shard_rows must be >= 1")
    n = df.count() if n_rows is None else n_rows
    n_parts = max(1, math.ceil(n / shard_rows))
    cols = [F.col(c) for c in order_cols]
    (
        df.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions(*cols)
        .write.option("maxRecordsPerFile", shard_rows)
        .mode("overwrite")
        .parquet(out_dir)
    )
    return n_parts
