"""Sequence packing: group documents into fixed-budget bins (context
windows) for training — the step between curation and shard writing.

Bin packing is inherently sequential, so the scalable shape is
partition-local packing: documents are distributed over P worker
partitions by a deterministic hash (uniform in count AND in token
mass, since assignment is independent of length), and each partition
runs first-fit-decreasing over its own documents in one Arrow batch
(`applyInPandas`). No global state, no driver loop: P independent
packers, each emitting bins namespaced by its partition id. FFD's
quality guarantee survives partitioning — within every partition at
most ONE bin can end at most half full (if two were, the later one's
docs would have fitted the earlier), so waste is bounded by
P * budget/2 across the corpus, negligible at corpus scale and
golden-pinned in tests/test_packing.py.

Documents longer than the budget get a single-doc overflow bin
(flagged) rather than being dropped or silently truncated — the
caller decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_packers: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign every row to a bin of total ``weight_col`` ≤ ``budget``.

    Output: input columns + ``packer`` (partition id), ``bin_id``
    (within-packer, 0-based), ``overflow`` (row alone in its bin with
    weight > budget). Global bin identity is (packer, bin_id).
    Deterministic: hash-assigned packer, FFD order (weight desc, md5
    tiebreak) inside each packer."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["_w", "_tie"], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []
        bin_ids = []
        overflow = []
        for w in pdf["_w"]:
            w = int(w)
            if w > budget:
                bin_ids.append(len(fills))
                fills.append(w)
                overflow.append(True)
                continue
            # first fit over open bins
            for i, f in enumerate(fills):
                if f + w <= budget:
                    fills[i] = f + w
                    bin_ids.append(i)
                    break
            else:
                bin_ids.append(len(fills))
                fills.append(w)
            overflow.append(False)
        pdf = pdf.assign(bin_id=bin_ids, overflow=overflow)
        return pdf.drop(columns=["_w", "_tie"])

    prepared = df.withColumn(
        "packer", hash_bucket(F.col(id_col), salt, n_packers).cast("int")
    ).withColumn(
        "_w", F.col(weight_col).cast("long")
    ).withColumn(
        "_tie",
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
    )
    out_schema = ", ".join(
        f"{name} {dt}" for name, dt in prepared.drop("_w", "_tie").dtypes
    ) + ", bin_id int, overflow boolean"
    return prepared.groupBy("packer").applyInPandas(pack, out_schema)


def chunk_documents(
    df: DataFrame,
    window: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking: split each document into fixed-size
    token windows (``window`` whitespace tokens, stepping ``stride``;
    default non-overlapping) — the tokenize-and-chunk step that turns
    variable-length documents into training-sequence candidates
    before packing. The final partial window is kept (callers drop or
    pad it); overlapping strides (stride < window) give the standard
    context-continuation overlap.

    Pure expressions: one split, a ``sequence`` of window starts, a
    ``transform``+``slice`` per start, one ``posexplode`` — no
    shuffle, no Python, linear in document length. Output one row per
    chunk: (id, chunk_id, chunk_text, n_chunk_tokens).
    """
    if stride is None:
        stride = window
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    w = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    staged = df.select(id_col, w.alias("_w"))
    n = F.size("_w")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice("_w", s, window))
    )
    exploded = staged.select(
        id_col,
        n.alias("_n"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    n_tok = F.least(
        F.lit(window),
        F.col("_n") - F.col("chunk_id") * F.lit(stride),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_text",
        n_tok.alias("n_chunk_tokens"),
    )
