"""BM25 top-k invariants (operators/retrieval.py) — the ranking
properties that make the score trustworthy, beyond the DuckDB parity
oracle (`bm25_topk_docs`): idf favors rare terms, tf saturates, long
documents are penalized, ties and k are deterministic, and the plan
keeps the posting-list discipline (term filter below the agg, no
unbounded nested-loop join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import retrieval


def _rows(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_rare_term_outranks_common_term(spark):
    # "zebra" appears in 1 of 6 docs, "the" in all 6 — one zebra hit
    # must outscore one the-hit at equal doc length
    docs = _rows(
        spark,
        [(0, "the zebra runs far")]
        + [(i, "the cat runs far") for i in range(1, 6)],
    )
    out = {
        r["doc_id"]: r["score_u"]
        for r in retrieval.bm25_topk(docs, ["zebra", "the"], k=6).collect()
    }
    assert out[0] > out[1]


def test_tf_saturation(spark):
    # doubling tf must increase the score by LESS than 2x (k1 bound)
    docs = _rows(
        spark,
        [
            (0, "term filler filler filler"),
            (1, "term term filler filler"),
            (2, "other words entirely here"),
        ],
    )
    out = {
        r["doc_id"]: r["score_u"]
        for r in retrieval.bm25_topk(docs, ["term"], k=3).collect()
    }
    assert out[1] > out[0]
    assert out[1] < 2 * out[0]


def test_length_normalization(spark):
    # same tf, longer doc -> lower score
    docs = _rows(
        spark,
        [
            (0, "term a b c"),
            (1, "term a b c d e f g h i j k l m n o p"),
            (2, "x y z w"),
        ],
    )
    out = {
        r["doc_id"]: r["score_u"]
        for r in retrieval.bm25_topk(docs, ["term"], k=3).collect()
    }
    assert out[0] > out[1]


def test_k_and_tiebreak_deterministic(spark):
    docs = _rows(spark, [(i, "term filler") for i in range(10)])
    out = retrieval.bm25_topk(docs, ["term"], k=4).collect()
    # all scores equal -> lowest ids win, ascending
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]


def test_docs_without_query_terms_are_absent(spark):
    docs = _rows(spark, [(0, "term here"), (1, "nothing relevant")])
    got = {r["doc_id"] for r in retrieval.bm25_topk(docs, ["term"], k=5).collect()}
    assert got == {0}


def test_empty_query_raises(spark):
    docs = _rows(spark, [(0, "a")])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, [])


def test_plan_bnlj_is_only_the_one_row_stats_cross(spark):
    """EXEMPT from the generic no-BNLJ rule the same way as tpch_q22:
    the single BroadcastNestedLoopJoin is the 1-row (n_docs, avgdl)
    stats cross — bounded by construction. The term filter must sit
    below the aggregate (posting lists only) and the final top-k must
    be a TakeOrdered, not a global sort."""
    docs = _rows(spark, [(i, "term text") for i in range(8)])
    plan = (
        retrieval.bm25_topk(docs, ["term"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# --- hybrid RRF fusion (r11) -------------------------------------------------


def _emb_rows(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_rrf_doc_in_both_systems_outranks_single_system(spark):
    """A doc ranked #2 by BOTH systems must outscore a doc ranked #1
    by only one: 2/(60+2) > 1/(60+1) reciprocal sums."""
    docs = _rows(
        spark,
        [
            (0, "zebra zebra zebra"),        # lex #1, absent dense pool-top
            (1, "zebra zebra the cat"),      # lex #2 and dense #2
            (2, "the cat runs"),             # no query terms
        ],
    )
    emb = _emb_rows(
        spark,
        [
            (1, [0.9, 0.1]),   # cos vs q: high
            (2, [1.0, 0.0]),   # exact match -> dense #1
            (0, [0.0, 1.0]),   # orthogonal
        ],
    )
    out = retrieval.hybrid_rrf_topk(
        docs, emb, ["zebra"], [1.0, 0.0], k=3, pool=2
    ).collect()
    ranks = {r["doc_id"]: (r["lex_rank"], r["dense_rank"]) for r in out}
    # doc 1: lex #2 + dense #2; doc 0: lex #1 only; doc 2: dense #1 only
    assert ranks[1] == (2, 2)
    assert ranks[0] == (1, 0) and ranks[2] == (0, 1)
    order = [r["doc_id"] for r in out]
    assert order[0] == 1  # in-both beats either single-system doc
    # single-system docs at rank 1 tie on rrf_u -> ascending id
    assert order[1:] == [0, 2]


def test_rrf_pool_bounds_membership_and_determinism(spark):
    docs = _rows(spark, [(i, f"zebra w{i}") for i in range(8)])
    emb = _emb_rows(
        spark, [(i, [1.0, float(i)]) for i in range(8)]
    )
    a = retrieval.hybrid_rrf_topk(
        docs, emb, ["zebra"], [1.0, 0.0], k=8, pool=3
    ).collect()
    b = retrieval.hybrid_rrf_topk(
        docs, emb, ["zebra"], [1.0, 0.0], k=8, pool=3
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # only docs from at least one pool appear; pools are 3-deep each
    assert 3 <= len(a) <= 6
    assert all(r["lex_rank"] > 0 or r["dense_rank"] > 0 for r in a)
    assert all(r["lex_rank"] <= 3 and r["dense_rank"] <= 3 for r in a)


def test_rrf_score_is_exact_integer_sum(spark):
    docs = _rows(spark, [(0, "zebra"), (1, "zebra zebra")])
    emb = _emb_rows(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    out = {
        r["doc_id"]: r
        for r in retrieval.hybrid_rrf_topk(
            docs, emb, ["zebra"], [1.0, 0.0], k=2, pool=2
        ).collect()
    }
    for r in out.values():
        want = 0
        if r["lex_rank"] > 0:
            want += int(1_000_000_000.0 // (60 + r["lex_rank"]))
        if r["dense_rank"] > 0:
            want += int(1_000_000_000.0 // (60 + r["dense_rank"]))
        assert r["rrf_u"] == want


def test_rrf_ann_dense_branch_equals_brute_at_full_probe(spark):
    """dense="ann" with n_probes = n_cells degrades to exact search,
    so the fused result must equal dense="brute" row for row; with
    1 probe the dense pool is cell-restricted (the recall trade) but
    the output contract and fusion arithmetic are unchanged."""
    import math

    docs = _rows(
        spark,
        [(i, "zebra " * (i % 3 + 1) + f"filler{i}") for i in range(12)],
    )
    emb = _emb_rows(
        spark,
        [
            (i, [math.cos(i * 0.4), math.sin(i * 0.4)])
            for i in range(12)
        ],
    )
    cents = [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]]
    q = [1.0, 0.1]
    brute = retrieval.hybrid_rrf_topk(
        docs, emb, ["zebra"], q, k=8, pool=5
    ).collect()
    full_probe = retrieval.hybrid_rrf_topk(
        docs, emb, ["zebra"], q, k=8, pool=5,
        dense="ann", centroids=cents, n_probes=len(cents),
    ).collect()
    assert [tuple(r) for r in brute] == [tuple(r) for r in full_probe]

    one_probe = retrieval.hybrid_rrf_topk(
        docs, emb, ["zebra"], q, k=8, pool=5,
        dense="ann", centroids=cents, n_probes=1,
    ).collect()
    # q's nearest centroid is cell 0: every dense-ranked doc must be
    # one assigned to cell 0 (the pruned scan never sees other cells)
    cell0 = {
        i for i in range(12)
        if min(
            range(3),
            key=lambda c: (math.cos(i * 0.4) - cents[c][0]) ** 2
            + (math.sin(i * 0.4) - cents[c][1]) ** 2,
        ) == 0
    }
    dense_docs = {r["doc_id"] for r in one_probe if r["dense_rank"] > 0}
    assert dense_docs and dense_docs <= cell0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="centroids"):
        retrieval.hybrid_rrf_topk(
            docs, emb, ["zebra"], q, dense="ann"
        )
    with _pytest.raises(ValueError, match="brute"):
        retrieval.hybrid_rrf_topk(
            docs, emb, ["zebra"], q, dense="nope"
        )


# --- batched retrieval (r12) -------------------------------------------------


def test_bm25_batch_one_query_reproduces_single_and_isolates_queries(spark):
    """A 1-row query table must equal bm25_topk exactly (same integer
    micro-scores, same tie order); with several queries each row's
    ranking must match its own single-query run — one corpus pass,
    per-query isolation."""
    docs = _rows(
        spark,
        [
            (0, "zebra zebra lion"),
            (1, "zebra cat cat cat"),
            (2, "lion lion lion tiger"),
            (3, "tiger tiger cat"),
            (4, "completely unrelated words here"),
        ],
    )
    qsets = {10: ["zebra"], 11: ["lion", "tiger"], 12: ["cat", "zebra"]}
    queries = spark.createDataFrame(
        [(qid, terms) for qid, terms in qsets.items()],
        "query_id long, terms array<string>",
    )
    batch = retrieval.bm25_topk_batch(docs, queries, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_u"])
        )
    for qid, terms in qsets.items():
        single = [
            (r["doc_id"], r["score_u"])
            for r in retrieval.bm25_topk(docs, terms, k=5).collect()
        ]
        assert sorted(got[qid], key=lambda t: (-t[1], t[0])) == single, qid


def test_bm25_batch_guards(spark):
    docs = _rows(spark, [(0, "a b c")])
    empty = spark.createDataFrame([], "query_id long, terms array<string>")
    with pytest.raises(ValueError, match="at least one term"):
        retrieval.bm25_topk_batch(docs, empty)
    many = spark.createDataFrame(
        [(0, [f"t{i}" for i in range(50)])],
        "query_id long, terms array<string>",
    )
    with pytest.raises(ValueError, match="max_broadcast_terms"):
        retrieval.bm25_topk_batch(docs, many, max_broadcast_terms=10)


def test_hybrid_batch_one_query_reproduces_single_ann_path(spark):
    """A 1-row query table through hybrid_rrf_topk_batch must equal
    hybrid_rrf_topk(dense="ann") row for row (same pool, centroids,
    probes, fusion arithmetic)."""
    import math

    docs = _rows(
        spark,
        [(i, "zebra " * (i % 3 + 1) + f"filler{i}") for i in range(12)],
    )
    emb = _emb_rows(
        spark,
        [(i, [math.cos(i * 0.4), math.sin(i * 0.4)]) for i in range(12)],
    )
    cents = [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]]
    q = [1.0, 0.1]
    single = [
        (r["doc_id"], r["lex_rank"], r["dense_rank"], r["rrf_u"])
        for r in retrieval.hybrid_rrf_topk(
            docs, emb, ["zebra"], q, k=8, pool=5,
            dense="ann", centroids=cents, n_probes=2,
        ).collect()
    ]
    queries = spark.createDataFrame(
        [(77, ["zebra"], q)],
        "query_id long, terms array<string>, query_vec array<double>",
    )
    batch = [
        (r["doc_id"], r["lex_rank"], r["dense_rank"], r["rrf_u"])
        for r in retrieval.hybrid_rrf_topk_batch(
            docs, emb, queries, cents, k=8, pool=5, n_probes=2,
        ).orderBy(F.desc("rrf_u"), F.asc("doc_id")).collect()
    ]
    assert batch == single and len(single) == 8

    # several queries: per-query k rows, fused ranks present
    queries3 = spark.createDataFrame(
        [
            (1, ["zebra"], [1.0, 0.0]),
            (2, ["filler3"], [0.0, 1.0]),
            (3, ["zebra", "filler5"], [-1.0, 0.0]),
        ],
        "query_id long, terms array<string>, query_vec array<double>",
    )
    out = retrieval.hybrid_rrf_topk_batch(
        docs, emb, queries3, cents, k=4, pool=5, n_probes=3
    ).collect()
    from collections import Counter

    per_q = Counter(r["query_id"] for r in out)
    assert set(per_q) == {1, 2, 3} and all(v == 4 for v in per_q.values())


def test_bm25_batch_shuffle_route_equals_broadcast(spark):
    """Above max_broadcast_queries the (query_id, term) fan-out joins
    by term-keyed shuffle instead of broadcast — identical rows."""
    docs = _rows(
        spark,
        [(i, f"zebra lion w{i} w{i % 3}") for i in range(10)],
    )
    queries = spark.createDataFrame(
        [(0, ["zebra"]), (1, ["lion", "w1"]), (2, ["w0", "w2"])],
        "query_id long, terms array<string>",
    )
    bcast = sorted(
        map(tuple, retrieval.bm25_topk_batch(docs, queries, k=5).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            retrieval.bm25_topk_batch(
                docs, queries, k=5, max_broadcast_queries=2
            ).collect(),
        )
    )
    assert bcast == shuffled and bcast


def test_rerank_pool_bounded_and_deterministic(spark):
    """rerank_topk: overlap-dominant ranking (a doc sharing 2 query
    tokens outranks any 1-token doc regardless of hash tiebreak),
    stable tie order, identical across runs, and the registered
    "real" scorer fails loudly instead of silently faking."""
    docs = _rows(
        spark,
        [
            (0, "zebra lion here"),        # 2 overlaps
            (1, "zebra only text"),        # 1 overlap
            (2, "lion only words"),        # 1 overlap
            (3, "nothing relevant at all"),
        ],
    )
    out = retrieval.rerank_topk(docs, "zebra lion", k=4).collect()
    assert out[0]["doc_id"] == 0
    assert {r["doc_id"] for r in out[1:3]} == {1, 2}
    assert out[3]["doc_id"] == 3
    again = retrieval.rerank_topk(docs, "zebra lion", k=4).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    with pytest.raises(Exception, match="cross-encoder runtime"):
        retrieval.rerank_topk(docs, "zebra", k=2, scorer="real").collect()


def test_rerank_string_ids(spark):
    """rerank_topk is id-type-agnostic like the rest of the file
    (ADVICE r12): the mapInPandas output schema derives the id type
    from the candidate table, so string ids rank identically to the
    long-id fixture instead of failing at runtime."""
    docs = spark.createDataFrame(
        [
            ("d0", "zebra lion here"),
            ("d1", "zebra only text"),
            ("d2", "lion only words"),
        ],
        ["doc_id", "text"],
    )
    out = retrieval.rerank_topk(docs, "zebra lion", k=3).collect()
    assert out[0]["doc_id"] == "d0"
    assert {r["doc_id"] for r in out[1:]} == {"d1", "d2"}


def test_retrieve_and_rerank_pool_then_model_order(spark):
    """The two-stage pipeline: stage 1 (BM25, pool=2) bounds
    membership — a doc outside the lexical pool can NEVER appear,
    however well the reranker would score it; stage 2 orders the
    survivors by the model score, which may disagree with BM25."""
    long_pad = " ".join(f"pad{i}" for i in range(40))
    docs = _rows(
        spark,
        [
            (0, "zebra zebra zebra filler"),   # strong single-term bm25
            (1, "zebra lion"),                 # both terms, rerank best
            (2, "zebra " + long_pad),          # weak: 1 term, long doc
            (3, "unrelated content"),
        ],
    )
    out = retrieval.retrieve_and_rerank(
        docs, ["zebra", "lion"], k=2, pool=2
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 2 not in ids and 3 not in ids     # pool bound is hard
    assert ids[0] == 1                       # 2-token overlap wins rerank
    assert all(r["score_u"] is not None for r in out)
