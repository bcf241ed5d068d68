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
    weight > budget). Global bin identity is (packer, bin_id). For
    bins sized in REAL model tokens, pass
    ``weight_col="n_tokens_exact"`` from
    tokenizer.token_counts_exact (the shipped frozen BPE vocab).
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


def chunk_by_sentences(
    df: DataFrame,
    budget_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-boundary chunking — the splitter SFT/instruction data
    needs where :func:`chunk_documents`'s fixed token windows would
    cut mid-sentence: split each document at terminal-punctuation
    runs (``[.!?]+`` followed by whitespace), then group consecutive
    sentences into chunks of ~``budget_tokens`` whitespace tokens
    WITHOUT ever splitting a sentence.

    Chunk assignment is QUANTIZED-PREFIX, not reset-greedy: a
    sentence with exclusive token prefix ``p`` lands in chunk
    ``floor(p / budget)``. The two rules differ only in where later
    boundaries fall after an oversized sentence; quantized is chosen
    because it is a pure window expression (reset-greedy needs a
    sequential scan per doc). Guarantees: sentence order preserved,
    every sentence in exactly one chunk, and a chunk's token total
    < budget + its last sentence's tokens. Sentences longer than the
    budget become their own (oversized) chunk — flag or re-split
    those with :func:`chunk_documents` downstream.

    Text case/whitespace is preserved (unlike the lowercasing token
    windows — SFT chunks keep their surface form). Plan: one marker
    regexp + split (no lookbehind, so an ANSI-SQL twin exists), one
    posexplode, one exclusive-prefix window and one (id, chunk)
    group-concat, both clustered on the doc key — a single real
    exchange. Output: (id, chunk_id, chunk_text, n_chunk_tokens,
    n_sentences)."""
    from pyspark.sql import Window

    if budget_tokens < 1:
        raise ValueError(
            f"budget_tokens must be >= 1, got {budget_tokens}"
        )
    # mark sentence ends with \x1e (RS) then split: Java and RE2
    # both lack a portable lookbehind, and the marker form is
    # expressible in DuckDB with identical semantics (chr(30))
    marked = F.regexp_replace(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))),
        r"([.!?]+)\s+",
        "$1\x1e",
    )
    sents = df.select(
        F.col(id_col),
        F.posexplode(F.split(marked, "\x1e")).alias("_pos", "_sent"),
    ).select(
        id_col, "_pos", F.trim(F.col("_sent")).alias("_sent")
    ).filter(F.length("_sent") > 0)
    toks = F.size(
        F.filter(F.split(F.col("_sent"), r"\s+"), lambda x: F.length(x) > 0)
    )
    w_prefix = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_chunk = sents.withColumn("_t", toks).withColumn(
        "chunk_id",
        F.floor(
            F.coalesce(F.sum("_t").over(w_prefix), F.lit(0))
            / F.lit(int(budget_tokens))
        ).cast("int"),
    )
    return (
        with_chunk.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_sent"))
                    ),
                    lambda s: s["_sent"],
                ),
                " ",
            ).alias("chunk_text"),
            F.sum("_t").cast("long").alias("n_chunk_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
        )
    )
