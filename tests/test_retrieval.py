"""BM25 top-k invariants (operators/retrieval.py) — the ranking
properties that make the score trustworthy, beyond the DuckDB parity
oracle (`bm25_topk_docs`): idf favors rare terms, tf saturates, long
documents are penalized, ties and k are deterministic, and the plan
keeps the posting-list discipline (term filter below the agg, no
unbounded nested-loop join)."""

from __future__ import annotations

import pytest

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
