"""Sparse text retrieval: BM25 top-k scoring (Robertson/Spärck Jones,
public Okapi BM25 formula) — the lexical-search counterpart of the
dense ANN family in operators/similarity.py.

No reference analog (the miw engine has no ranking surface); this is
beyond-reference LLM-pipeline surface: corpus triage ("find the docs
about X in 100 TB"), retrieval baselines for dedup/decontamination
audits, and hard-negative mining for embedding training all start
with a BM25 pass.

100 TB shape: the inverted-index discipline without materializing an
index. The term filter (``term IN (query)``) lands BEFORE the
per-(doc, term) aggregation, so only rows matching query terms —
the posting lists — ever shuffle; everything else dies at the scan.
Corpus stats (N, avgdl) are a 1-row broadcast cross (the q22
pattern); per-term document frequencies are a query-terms-sized
broadcast. Final top-k is a TakeOrdered, never a global sort.

Cross-engine exactness: each (doc, term) partial score floors to an
int64 micro-score BEFORE the per-doc sum (the split_word_divergence
convention) — integer addition is order-independent, so the score a
DuckDB oracle computes is bit-identical regardless of either
engine's reduction order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 over whitespace terms. Returns
    (id, score_u) with score_u = sum over query terms of
    floor(idf·tf_norm · 1e6 + 0.5), idf = ln(1 + (N−df+0.5)/(df+0.5))
    (the non-negative Lucene variant). Ties break on ascending id."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    d = df.select(F.col(id_col), words.alias("_w")).select(
        id_col, "_w", F.size("_w").alias("dl")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tok = d.select(
        id_col, "dl", F.explode("_w").alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = tok.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    tf_norm = (
        F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + F.lit(k1)
            * (1 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    term_u = F.floor(idf * tf_norm * 1e6 + 0.5).cast("long")
    return (
        # bcast-bound: dft <= #query terms (tok pre-filtered by isin); stats
        #   = 1 row
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, term_u.alias("_tu"))
        .groupBy(id_col)
        .agg(F.sum("_tu").alias("score_u"))
        .orderBy(F.desc("score_u"), F.asc(id_col))
        .limit(k)
    )
