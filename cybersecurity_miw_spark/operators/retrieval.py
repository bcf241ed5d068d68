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
from pyspark.sql.window import Window


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


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    pool: int = 50,
    k_rrf: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    dense: str = "brute",
    centroids: list[list[float]] | None = None,
    n_probes: int = 2,
) -> DataFrame:
    """Hybrid lexical+dense retrieval fused by Reciprocal Rank Fusion
    (Cormack/Clarke/Buettcher RRF, the public standard): run BM25 and
    exact-cosine retrieval to a ``pool``-deep candidate list each,
    then score every pooled doc by Σ_systems 1/(k_rrf + rank) and
    return the top ``k``. Ranks are 1-based within each system's pool
    (deterministic tie order: score desc, id asc); a doc missing from
    one system's pool contributes 0 for that system and reports
    rank 0.

    Cross-engine exactness: each reciprocal floors to an int64
    micro-score (⌊1e9/(k_rrf+rank)⌋) before the sum — the
    split_word_divergence convention, so a DuckDB twin is
    hash-identical.

    100 TB shape: all corpus-scaled work lives in the two retrieval
    branches (BM25's posting-discipline shuffle; the dense branch's
    scan). ``dense`` picks the dense branch's plan:

    * ``"brute"`` (default) — exact cosine over the whole embedding
      table, a full scan ending in a TakeOrdered. Exact, and fine up
      to mid-size corpora, but the scan is the whole cost at 100 TB.
    * ``"ann"`` — IVF probe-pruned exact cosine
      (:func:`~cybersecurity_miw_spark.operators.similarity.ivf_topk`
      with the supplied ``centroids``/``n_probes``): only the rows
      assigned to the ``n_probes`` nearest cells are scored, so the
      dense branch scans ~n_probes/n_cells of the corpus (measured in
      SCALE.md r12) at the standard IVF recall trade. Same
      (id, cos_sim) contract, so fusion is unchanged; rankings equal
      "brute" whenever the pool fits inside the probed cells.

    The fusion itself touches ≤ 2·pool rows: the rank windows and
    the outer join run on pool-bounded inputs, never on the corpus."""
    from cybersecurity_miw_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    lex = bm25_topk(
        docs, query_terms, k=pool, text_col=text_col, id_col=doc_id_col
    )
    if dense == "brute":
        dense_df = brute_force_topk(
            embeddings, query_vec, k=pool, vec_col=vec_col,
            id_col=vec_id_col,
        )
    elif dense == "ann":
        if centroids is None:
            raise ValueError(
                'dense="ann" needs centroids (seed rows or '
                "similarity.train_centroids output)"
            )
        dense_df = ivf_topk(
            embeddings, centroids, query_vec, k=pool, n_probes=n_probes,
            vec_col=vec_col, id_col=vec_id_col,
        )
    else:
        raise ValueError(f'dense must be "brute" or "ann", got {dense!r}')
    # unpartitioned windows are pool-bounded (<= pool rows) by the
    # limit above — never corpus-sized
    w_lex = Window.orderBy(F.desc("score_u"), F.asc(doc_id_col))
    w_dense = Window.orderBy(F.desc("cos_sim"), F.asc(vec_id_col))
    lex_r = lex.select(
        F.col(doc_id_col).alias("doc_id"),
        F.row_number().over(w_lex).cast("long").alias("lex_rank"),
    )
    dense_r = dense_df.select(
        F.col(vec_id_col).alias("doc_id"),
        F.row_number().over(w_dense).cast("long").alias("dense_rank"),
    )
    def _contrib(rank_col: str):
        # rank 0 = not retrieved by that system: contributes nothing
        return F.when(
            F.col(rank_col) > 0,
            F.floor(
                F.lit(1_000_000_000.0) / (F.lit(k_rrf) + F.col(rank_col))
            ),
        ).otherwise(F.lit(0))

    return (
        lex_r.join(dense_r, on="doc_id", how="full_outer")
        .withColumn("lex_rank", F.coalesce("lex_rank", F.lit(0)).cast("long"))
        .withColumn(
            "dense_rank", F.coalesce("dense_rank", F.lit(0)).cast("long")
        )
        .withColumn(
            "rrf_u",
            (_contrib("lex_rank") + _contrib("dense_rank")).cast("long"),
        )
        .orderBy(F.desc("rrf_u"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
    max_broadcast_terms: int = 100_000,
    max_broadcast_queries: int = 10_000,
) -> DataFrame:
    """BM25 top-``k`` for EVERY row of a query TABLE in one corpus
    pass — the lexical analog of
    :func:`~cybersecurity_miw_spark.operators.similarity.
    ivf_topk_batch`: a retrieval-evaluation run or hard-negative
    mining sweep issues thousands of queries, and one Spark job per
    query is driver-bound long before the cluster is busy.
    ``queries`` is (query_id, terms array<string>); returns
    (query_id, id, score_u) with per-query rank ≤ k (score desc,
    id asc), score_u the same int64 micro-score as
    :func:`bm25_topk` — a 1-row query table reproduces it exactly
    (golden-pinned).

    One corpus pass: the posting filter keeps (doc, term) rows whose
    term occurs in ANY query (semi-join against the distinct term
    union, broadcast — bounded by ``max_broadcast_terms``, raising
    beyond it: a term union that large stops being a filter and the
    caller should shard the query table); per-term df and per-doc tf
    are computed ONCE over that union and fan out to queries through
    a (query_id, term) join — broadcast up to
    ``max_broadcast_queries`` query rows, a plain term-keyed shuffle
    join above it (the :func:`~cybersecurity_miw_spark.operators.
    similarity.ivf_topk_batch` routing contract: evaluation-scale
    query tables must not hard-fail; the shuffled side is the
    posting-bounded tf table, already keyed by term). Corpus-scaled
    work is independent of query count; per-query work is
    posting-bounded. Per-query rank is a window over score rows —
    keyed by query_id, so parallelism scales with the batch."""
    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(terms_col).alias("term"),
        )
        .distinct()
    )
    term_union = qt.select("term").distinct()
    n_terms = term_union.limit(max_broadcast_terms + 1).count()
    if n_terms > max_broadcast_terms:
        raise ValueError(
            f"bm25_topk_batch: {n_terms}+ distinct query terms exceed "
            f"max_broadcast_terms={max_broadcast_terms}; the posting "
            "filter would stop filtering — shard the query table"
        )
    if n_terms == 0:
        raise ValueError("queries must contribute at least one term")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    d = df.select(F.col(id_col), words.alias("_w")).select(
        id_col, "_w", F.size("_w").alias("dl")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # bcast-bound: term_union <= max_broadcast_terms rows (guard above)
    tok = d.select(
        id_col, "dl", F.explode("_w").alias("term")
    ).join(F.broadcast(term_union), "term", "semi")
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
    n_q = queries.limit(max_broadcast_queries + 1).count()
    if n_q <= max_broadcast_queries:
        # bcast-bound: qt <= n_queries x n_terms distinct pairs,
        #   both factors fenced (count check; max_broadcast_terms)
        qt_side = F.broadcast(qt)
    else:
        # evaluation-scale query table: term-keyed shuffle join
        # against the posting-bounded tf side instead of a broadcast
        qt_side = qt
    # bcast-bound: dft <= n_terms; stats = 1 row
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "term", term_u.alias("_tu"))
        .join(qt_side, "term")
        .groupBy("query_id", id_col)
        .agg(F.sum("_tu").alias("score_u"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_u"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def hybrid_rrf_topk_batch(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    pool: int = 50,
    k_rrf: int = 60,
    n_probes: int = 2,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    qvec_col: str = "query_vec",
    max_broadcast_queries: int = 10_000,
) -> DataFrame:
    """Hybrid RRF retrieval for EVERY row of a query TABLE —
    :func:`bm25_topk_batch` (one posting-disciplined corpus pass for
    all lexical pools) fused with
    :func:`~cybersecurity_miw_spark.operators.similarity.
    ivf_topk_batch` (one probe-pruned index scan for all dense
    pools), then per-query RRF over the pool-bounded rank lists.
    ``queries`` is (query_id, terms array<string>,
    query_vec array<double>); returns
    (query_id, doc_id, lex_rank, dense_rank, rrf_u), per-query
    top-``k``. Identical arithmetic to :func:`hybrid_rrf_topk`
    (int64 micro-reciprocals, rank 0 = absent), so a 1-row query
    table reproduces the single-query dense="ann" path exactly
    (golden-pinned).

    100 TB: each branch touches the corpus ONCE regardless of query
    count; the fusion joins and rank windows are keyed by query_id
    over pool-bounded rows, so parallelism scales with the batch.
    The dense branch inherits ivf_topk_batch's broadcast-or-shuffle
    routing at ``max_broadcast_queries``."""
    from cybersecurity_miw_spark.operators.similarity import ivf_topk_batch

    lex = bm25_topk_batch(
        docs,
        queries.select(query_id_col, terms_col),
        k=pool,
        text_col=text_col,
        id_col=doc_id_col,
        query_id_col=query_id_col,
        terms_col=terms_col,
    )
    dense = ivf_topk_batch(
        embeddings,
        queries.select(
            F.col(query_id_col).alias(vec_id_col),
            F.col(qvec_col).cast("array<double>").alias(vec_col),
        ),
        centroids,
        k=pool,
        n_probes=n_probes,
        vec_col=vec_col,
        id_col=vec_id_col,
        max_broadcast_queries=max_broadcast_queries,
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.desc("score_u"), F.asc(doc_id_col)
    )
    w_dense = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(vec_id_col)
    )
    lex_r = lex.select(
        "query_id",
        F.col(doc_id_col).alias("doc_id"),
        F.row_number().over(w_lex).cast("long").alias("lex_rank"),
    )
    dense_r = dense.select(
        "query_id",
        F.col(vec_id_col).alias("doc_id"),
        F.row_number().over(w_dense).cast("long").alias("dense_rank"),
    )

    def _contrib(rank_col: str):
        return F.when(
            F.col(rank_col) > 0,
            F.floor(
                F.lit(1_000_000_000.0) / (F.lit(k_rrf) + F.col(rank_col))
            ),
        ).otherwise(F.lit(0))

    fused = (
        lex_r.join(dense_r, on=["query_id", "doc_id"], how="full_outer")
        .withColumn("lex_rank", F.coalesce("lex_rank", F.lit(0)).cast("long"))
        .withColumn(
            "dense_rank", F.coalesce("dense_rank", F.lit(0)).cast("long")
        )
        .withColumn(
            "rrf_u",
            (_contrib("lex_rank") + _contrib("dense_rank")).cast("long"),
        )
    )
    w_fuse = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_u"), F.asc("doc_id")
    )
    return (
        fused.withColumn("_rk", F.row_number().over(w_fuse))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


# ---- cross-encoder rerank: the second retrieval stage ----------------------
#
# The standard production pipeline is retrieve (BM25 / dense / hybrid,
# pool-deep) -> cross-encoder rerank the pool. The model itself is
# pluggable (no ML runtime in this environment — the multimodal
# DECODERS pattern): scorers take (query, list[str]) and return one
# float per text, and run Arrow-batched inside mapInPandas so a real
# ONNX/torch session loads once per executor, not per row.

from typing import Callable


def _fake_scorer(query: str, texts: list) -> list:
    """Deterministic stand-in for a cross-encoder: distinct-token
    overlap count with the query (a real lexical signal, so rankings
    are meaningful in tests), tie-broken by a stable content hash —
    score = n_overlap · 2³² + first-8-hex(md5(text)). Integer-exact
    (< 2⁵³, so the double carries it losslessly) and reproducible in
    SQL, which is what lets the rows-for-rows DuckDB oracle exist
    for a "model" score."""
    import hashlib

    q = set(query.lower().split())
    out = []
    for t in texts:
        toks = set((t or "").lower().split())
        h = int(hashlib.md5((t or "").encode()).hexdigest()[:8], 16)
        out.append(float(len(q & toks) * 4294967296 + h))
    return out


def _real_scorer(query: str, texts: list) -> list:
    raise NotImplementedError(
        "no cross-encoder runtime (torch/onnxruntime) in this "
        "environment; register one in SCORERS to enable — it will be "
        "called with (query, batch_of_texts) inside each Arrow batch"
    )


SCORERS: dict[str, Callable] = {
    "fake": _fake_scorer,
    "real": _real_scorer,
}


def rerank_topk(
    candidates: DataFrame,
    query: str,
    k: int = 10,
    scorer: str = "fake",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-encoder rerank of a retrieval pool: score every
    candidate against ``query`` with the registered ``scorer`` and
    return the top ``k`` by (score desc, id asc). Returns
    (id, rerank_score); real scorers return model floats as-is.

    100 TB shape: this stage is POOL-BOUNDED by contract — feed it
    `bm25_topk` / `hybrid_rrf_topk` output joined back to text, never
    a corpus. The scorer runs in mapInPandas (Arrow batches, one
    model session per executor via lazy init in a real scorer);
    per-batch local top-k caps the Arrow transfer at k rows per
    batch, and the global TakeOrdered sees ≤ k × n_batches rows —
    the `_residual_adc_arrow` discipline."""
    import pandas as pd

    score_fn = SCORERS[scorer]
    # id-type-agnostic like the rest of the file (ADVICE r12): the
    # mapInPandas output schema carries the candidate table's own id
    # type instead of hardcoding long, so string/int ids both work
    id_type = candidates.schema[id_col].dataType.simpleString()

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            scores = score_fn(query, list(pdf[text_col]))
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rerank_score": [float(s) for s in scores],
                }
            )
            yield out.sort_values(
                ["rerank_score", id_col], ascending=[False, True]
            ).head(k)

    scored = candidates.select(id_col, text_col).mapInPandas(
        score, f"{id_col} {id_type}, rerank_score double"
    )
    return scored.orderBy(
        F.desc("rerank_score"), F.asc(id_col)
    ).limit(k)


def retrieve_and_rerank(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    pool: int = 50,
    scorer: str = "fake",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The two-stage pipeline in one call: BM25 retrieves a
    ``pool``-deep candidate list (one posting-disciplined corpus
    pass), candidate TEXT is fetched by a pool-bounded semi-join, and
    the cross-encoder reranks the pool to the final top ``k``.
    Returns (id, score_u, rerank_score) — the first-stage score rides
    along for score-fusion or debugging."""
    lex = bm25_topk(
        docs, query_terms, k=pool, text_col=text_col, id_col=id_col
    )
    pool_docs = docs.join(lex.select(id_col), id_col, "semi").select(
        id_col, text_col
    )
    reranked = rerank_topk(
        pool_docs, " ".join(query_terms), k=k,
        scorer=scorer, text_col=text_col, id_col=id_col,
    )
    return reranked.join(lex, id_col, "left").select(
        id_col, "score_u", "rerank_score"
    )
