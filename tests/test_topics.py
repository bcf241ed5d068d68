"""Goldens for multiclass topic classification (operators/topics.py):
one-vs-rest training separates crafted vocabularies, single-join
argmax scoring equals per-model score_quality margins, the
(margin, topic) tie-break and wordless-doc contracts, family-dim
guard, bit-exact determinism under repartitioning, and the report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import qualityclf as qc
from cybersecurity_miw_spark.operators import topics as T


def _labeled(spark, n_each=8):
    rows = (
        [(i, f"python function compile stack trace debug v{i % 2}", "code")
         for i in range(n_each)]
        + [(100 + i, f"flour sugar oven bake butter taste v{i % 2}", "cook")
           for i in range(n_each)]
        + [(200 + i, f"parliament vote policy minister law v{i % 2}", "law")
           for i in range(n_each)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string, topic string")


def test_train_and_classify_separates(spark):
    models = T.train_topic_models(_labeled(spark), dim=128, iters=10)
    assert sorted(models) == ["code", "cook", "law"]
    batch = spark.createDataFrame(
        [
            (1, "debug the stack trace in the python function"),
            (2, "bake the flour with sugar and butter in the oven"),
            (3, "the parliament vote on the minister policy"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["topic"]
           for r in T.classify_topics(batch, models).collect()}
    assert out == {1: "code", 2: "cook", 3: "law"}


def test_argmax_equals_per_model_margins(spark):
    """The single-join argmax must reproduce K independent
    score_quality passes exactly — same floor/division convention."""
    models = T.train_topic_models(_labeled(spark), dim=64, iters=5)
    batch = spark.createDataFrame(
        [(i, f"mixed words flour policy debug v{i}") for i in range(6)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["topic"], r["topic_margin_micro"])
        for r in T.classify_topics(batch, models).collect()
    }
    per_model = {}
    for t, m in models.items():
        for r in qc.score_quality(batch, m).collect():
            per_model.setdefault(r["doc_id"], []).append(
                (r["clf_score_micro"], t)
            )
    for d, pairs in per_model.items():
        m, t = max(pairs)
        assert got[d] == (t, m), d


def test_wordless_and_tie_contracts(spark):
    models = {
        "aa": {"dim": 8, "w_micro": [0] * 8, "bias_micro": 7},
        "zz": {"dim": 8, "w_micro": [0] * 8, "bias_micro": 7},
        "low": {"dim": 8, "w_micro": [0] * 8, "bias_micro": -5},
    }
    batch = spark.createDataFrame(
        [(1, ""), (2, "any words at all")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in T.classify_topics(batch, models).collect()}
    # wordless: bias argmax; exact tie → lexicographically largest
    assert out[1]["topic"] == "zz" and out[1]["topic_margin_micro"] == 7
    # zero weights → every doc margins (0 + bias); same tie rule
    assert out[2]["topic"] == "zz" and out[2]["topic_margin_micro"] == 7


def test_guards(spark):
    with pytest.raises(ValueError, match="empty models"):
        T.classify_topics(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            {},
        )
    bad = {
        "a": {"dim": 8, "w_micro": [0] * 8, "bias_micro": 0},
        "b": {"dim": 16, "w_micro": [0] * 16, "bias_micro": 0},
    }
    with pytest.raises(ValueError, match="disagree on dim"):
        T.classify_topics(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            bad,
        )
    one_label = spark.createDataFrame(
        [(1, "x", "only")], "doc_id long, text string, topic string"
    )
    with pytest.raises(ValueError, match="2 distinct topics"):
        T.train_topic_models(one_label)


def test_deterministic_under_repartition(spark):
    labeled = _labeled(spark)
    m1 = T.train_topic_models(labeled, dim=64, iters=5)
    m2 = T.train_topic_models(labeled.repartition(7), dim=64, iters=5)
    assert m1 == m2
    batch = spark.createDataFrame(
        [(i, f"debug flour vote v{i % 3}") for i in range(20)],
        "doc_id long, text string",
    )
    c1 = sorted(map(tuple, T.classify_topics(batch, m1).collect()))
    c2 = sorted(
        map(tuple, T.classify_topics(batch.repartition(5), m2).collect())
    )
    assert c1 == c2


def test_topic_report(spark):
    models = T.train_topic_models(_labeled(spark), dim=64, iters=5)
    batch = spark.createDataFrame(
        [(1, "python debug function", 10),
         (2, "flour sugar oven", 20),
         (3, "bake butter taste", 30)],
        "doc_id long, text string, n_tok long",
    )
    out = T.classify_topics(batch, models)
    rep = {r["topic"]: r for r in T.topic_report(out, "n_tok").collect()}
    assert rep["code"]["n_docs"] == 1 and rep["code"]["tokens"] == 10
    assert rep["cook"]["n_docs"] == 2 and rep["cook"]["tokens"] == 50
    plain = {r["topic"]: r for r in T.topic_report(out).collect()}
    assert "tokens" not in T.topic_report(out).columns
    assert plain["cook"]["n_docs"] == 2