"""Multiclass topic classification for corpus mixture balancing —
the Dolma / DCLM bucketing shape (Dolma tags every document with
topic buckets that the mixing recipe then weights; DCLM-style
pipelines classify into domains before re-balancing): K one-vs-rest
integer logistic models over hashed word features, trained with the
engine's bit-deterministic fixed-point SGD
(qualityclf.train_quality_classifier — Brown et al. 2020 App. A
machinery, one model per topic), scored in ONE pass.

The scoring plan is the part that matters at 100 TB: the K models
fold into a single ``(bucket, topic, w_micro)`` weight table
(K·dim rows — broadcast-sized by construction), so classification
is ONE feature explode + ONE broadcast join + one (doc, topic)
LONG-sum + one max-of-struct argmax — K times the weight rows,
never K passes over the corpus. Wordless documents score each
topic's bias and argmax over those (a driver-side constant).

Determinism contract: margins are the exact long micro-logits of
qualityclf; the argmax tie-break is (margin, topic) lexicographic —
at an exact margin tie the lexicographically LARGEST topic label
wins, documented rather than partition-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators.qualityclf import (
    hashed_count_features,
    train_quality_classifier,
)


def train_topic_models(
    labeled: DataFrame,
    dim: int = 256,
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "topic",
) -> dict[str, dict]:
    """One-vs-rest training over a labeled exemplar frame
    ``(id, text, topic)``: for each distinct topic, train
    topic-vs-everything-else with the integer fixed-point SGD.
    Returns ``{topic: model_dict}`` (each a
    train_quality_classifier model — same family keys, same
    bit-determinism guarantee).

    The driver loop is TOPIC-bounded (K iterations of a model-bounded
    training loop — published taxonomies are tens of topics, never
    corpus-scaled); the labeled exemplar is expected to be a curated
    SAMPLE, the published recipe shape."""
    topics = [
        r["t"]
        for r in labeled.select(F.col(label_col).alias("t"))
        .distinct()
        .orderBy("t")
        .collect()
    ]
    if len(topics) < 2:
        raise ValueError(
            f"need >= 2 distinct topics to train one-vs-rest, got "
            f"{topics!r}"
        )
    models: dict[str, dict] = {}
    for t in topics:
        models[t] = train_quality_classifier(
            labeled.filter(F.col(label_col) == t),
            labeled.filter(F.col(label_col) != t),
            dim=dim, iters=iters, lr=lr, l2=l2,
            text_col=text_col, id_col=id_col,
        )
    return models


def _weights_df(spark, models: dict[str, dict]):
    dims = {int(m["dim"]) for m in models.values()}
    if len(dims) != 1:
        raise ValueError(
            f"topic models disagree on dim ({sorted(dims)}) — mixed "
            "feature spaces mis-score silently; retrain as one family"
        )
    rows = [
        (t, b, int(w))
        for t, m in sorted(models.items())
        for b, w in enumerate(m["w_micro"])
    ]
    return (
        spark.createDataFrame(rows, "topic string, bucket int, w_micro long"),
        dims.pop(),
    )


def classify_topics(
    batch: DataFrame,
    models: dict[str, dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every input row plus ``topic`` (the argmax one-vs-rest label)
    and ``topic_margin_micro`` (the winning exact long micro-logit).
    One feature explode + one broadcast (K·dim)-row weight join +
    one (doc, topic) LONG-sum + one argmax — never K corpus passes.
    Wordless docs argmax the biases (driver constant)."""
    if not models:
        raise ValueError("classify_topics: empty models dict")
    spark = batch.sparkSession
    w_df, dim = _weights_df(spark, models)
    biases = {t: int(m["bias_micro"]) for t, m in models.items()}
    bias_df = spark.createDataFrame(
        list(sorted(biases.items())), "topic string, bias_micro long"
    )
    # the wordless-doc verdict: argmax over biases, ties → largest
    # topic label (the documented contract)
    empty_topic, empty_margin = max(
        ((t, b) for t, b in biases.items()), key=lambda x: (x[1], x[0])
    )

    # n_words rides the feature profile (hashed_count_features), so
    # the per-(doc, topic) margin is EXACTLY qualityclf._margin_micro
    # with the topic added to the grouping key — same double-division
    # + floor convention, bit-for-bit
    prof = hashed_count_features(batch, dim, text_col, id_col)
    margins = (
        # bcast-bound: w_df = K·dim rows (topics × feature buckets —
        # model-sized, never sf-scaled)
        prof.join(F.broadcast(w_df), "bucket")
        .groupBy(id_col, "topic")
        .agg(
            F.floor(
                F.sum(F.col("cnt") * F.col("w_micro"))
                / F.first("n_words")
            ).alias("_dot")
        )
        # bcast-bound: bias_df = K rows (one per topic)
        .join(F.broadcast(bias_df), "topic")
        .select(
            id_col,
            "topic",
            (F.col("_dot") + F.col("bias_micro")).cast("long").alias("_m"),
        )
    )
    winner = margins.groupBy(id_col).agg(
        F.max(F.struct(F.col("_m"), F.col("topic"))).alias("_w")
    ).select(
        id_col,
        F.col("_w.topic").alias("topic"),
        F.col("_w._m").alias("topic_margin_micro"),
    )
    return batch.join(winner, id_col, "left").select(
        *batch.columns,
        F.coalesce("topic", F.lit(empty_topic)).alias("topic"),
        F.coalesce("topic_margin_micro", F.lit(empty_margin))
        .cast("long")
        .alias("topic_margin_micro"),
    )


def topic_report(classified: DataFrame, tokens_col: str | None = None) -> DataFrame:
    """The mixture card: per assigned topic the document count (and
    token sum when ``tokens_col`` is given) — what a re-balancing
    recipe reads before setting mix weights. One uniform topic-key
    aggregation."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if tokens_col is not None:
        aggs.append(F.sum(tokens_col).cast("long").alias("tokens"))
    return classified.groupBy("topic").agg(*aggs)
