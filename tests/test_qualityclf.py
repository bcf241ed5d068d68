"""Goldens for the trained quality classifier
(operators/qualityclf.py): class separation on crafted vocabularies,
bit-exact training determinism under repartitioning (the integer
fixed-point claim), frozen-model scoring equivalence, the store
round-trip + family guard, and the drift monitor → rebuild loop —
the store-family standard test set (see test_dsir.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import qualityclf as qc


def _corpora(spark, n_each=12):
    target = spark.createDataFrame(
        [(i, "quality prose careful analysis thorough reasoning "
             f"insight section{i % 3}") for i in range(n_each)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(100 + i, "click buy now cheap deal spam offer winner "
                   f"promo{i % 3}") for i in range(n_each)],
        "doc_id long, text string",
    )
    return target, raw


def test_classifier_separates_crafted_classes(spark):
    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=128, iters=20)
    scored_t = qc.score_quality(target, model).collect()
    scored_r = qc.score_quality(raw, model).collect()
    t_scores = [r["clf_score_micro"] for r in scored_t]
    r_scores = [r["clf_score_micro"] for r in scored_r]
    # disjoint vocabularies → complete separation
    assert min(t_scores) > max(r_scores)
    # threshold column
    thr = (min(t_scores) + max(r_scores)) // 2
    kept = qc.score_quality(
        target.unionByName(raw), model, threshold_micro=thr
    )
    keep_by_id = {r["doc_id"]: r["keep"] for r in kept.collect()}
    assert all(keep_by_id[i] for i in range(12))
    assert not any(keep_by_id[100 + i] for i in range(12))


def test_training_bit_deterministic_under_repartition(spark):
    """The module's integer fixed-point claim: every Spark-side
    aggregate in the loop is a long sum, so partitioning cannot
    change a single weight bit."""
    target, raw = _corpora(spark)
    m1 = qc.train_quality_classifier(target, raw, dim=64, iters=8)
    m2 = qc.train_quality_classifier(
        target.repartition(7), raw.repartition(3), dim=64, iters=8
    )
    assert m1["w_micro"] == m2["w_micro"]
    assert m1["bias_micro"] == m2["bias_micro"]


def test_overlapping_ids_between_classes_are_kept_distinct(spark):
    """Target and raw may share doc_ids (different corpora): the
    trainer keys on (class, id), so both rows train."""
    target = spark.createDataFrame(
        [(1, "good fine text words here")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "bad spam junk words there")], "doc_id long, text string"
    )
    model = qc.train_quality_classifier(target, raw, dim=32, iters=10)
    assert model["n_target"] == 1 and model["n_raw"] == 1


def test_wordless_doc_scores_bias(spark):
    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=64, iters=5)
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    out = qc.score_quality(df, model).collect()
    assert all(r["clf_score_micro"] == model["bias_micro"] for r in out)


def test_train_validations(spark):
    target, raw = _corpora(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="both classes"):
        qc.train_quality_classifier(target, empty, dim=16, iters=1)
    with pytest.raises(ValueError, match="iters"):
        qc.train_quality_classifier(target, raw, dim=16, iters=0)
    with pytest.raises(ValueError, match="dim"):
        qc.hashed_count_features(target, dim=0)


def test_store_roundtrip_and_frozen_scoring(spark, tmp_path):
    target, raw = _corpora(spark)
    d = str(tmp_path / "clf")
    model = qc.write_quality_model(target, raw, d, dim=64, iters=8)
    loaded, params = qc.load_quality_model(spark, d)
    assert loaded["w_micro"] == model["w_micro"]
    assert params["dim"] == 64 and params["n_raw"] == 12
    # frozen scoring == in-memory scoring, bit for bit
    batch = target.unionByName(raw)
    a = {r["doc_id"]: r["clf_score_micro"]
         for r in qc.score_quality(batch, model).collect()}
    b = {r["doc_id"]: r["clf_score_micro"]
         for r in qc.score_with_model(batch, d).collect()}
    assert a == b
    # family guard
    with pytest.raises(ValueError, match="dim=64"):
        qc.load_quality_model(spark, d, dim=128)
    with pytest.raises(ValueError, match="sidecar"):
        qc.load_quality_model(spark, str(tmp_path / "nope"))


def test_drift_monitor_and_rebuild(spark, tmp_path):
    target, raw = _corpora(spark, n_each=20)
    d = str(tmp_path / "clf")
    qc.write_quality_model(target, raw, d, dim=64, iters=5)
    # the raw feed itself: in-distribution
    rep = qc.quality_clf_drift_report(raw, d)
    assert not rep["stale"]
    # a shifted feed (disjoint vocabulary): drifted
    shifted = spark.createDataFrame(
        [(500 + i, f"zz{i} completely different tokens qq{i} ww{i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    rep2 = qc.quality_clf_drift_report(shifted, d)
    assert rep2["stale"]
    assert rep2["js_micro_nats"] > rep["js_micro_nats"]
    # rebuild on the current (shifted) raw clears the monitor and
    # keeps the recorded family
    qc.rebuild_quality_model(target, shifted, d)
    rep3 = qc.quality_clf_drift_report(shifted, d)
    assert not rep3["stale"]
    _, params = qc.load_quality_model(spark, d)
    assert params["dim"] == 64 and params["iters"] == 5


def test_curate_documents_clf_selection_stage(spark):
    """Pipeline wiring (r16): the trained classifier gates curation
    after the heuristic floor; the funnel names the stage and the
    score column survives as provenance."""
    from cybersecurity_miw_spark import pipeline

    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=64, iters=10)
    pool = target.unionByName(
        spark.createDataFrame(
            [(200 + i, "click buy now cheap deal spam offer winner extra")
             for i in range(6)],
            "doc_id long, text string",
        )
    )
    m: list = []
    out = pipeline.curate_documents(
        pool,
        clf_model=model,
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=m,
    )
    rows = out.collect()
    assert [x["stage"] for x in m] == ["clf_select", "exact_dedup"]
    # clf_select drops exactly the 6 spam docs (18 -> 12); exact dedup
    # then keeps one doc per distinct target text (the i%3 templates)
    sel = next(x for x in m if x["stage"] == "clf_select")
    assert (sel["n_in"], sel["n_out"]) == (18, 12)
    assert {r["doc_id"] for r in rows} == {0, 1, 2}
    assert all(r["clf_score_micro"] >= 0 for r in rows)
    with pytest.raises(ValueError, match="not both"):
        pipeline.curate_documents(pool, clf_model=model, clf_model_dir="x")


def test_clf_select_to_budget_contract(spark):
    """Budget selection (r16): inclusive running-sum budget bound,
    higher grades selected first, determinism under repartition, and
    the empty/validation edges — the dsir_select_to_budget contract
    with classifier scores."""
    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=64, iters=10)
    pool = target.unionByName(raw).withColumn(
        "n_tokens", F.size(F.split("text", r"\s+"))
    )
    out = qc.clf_select_to_budget(pool, model, 60).collect()
    got_tokens = sum(r["n_tokens"] for r in out)
    assert 0 < got_tokens <= 60 + max(r["n_tokens"] for r in out)
    # quality docs score higher -> fill the budget before any spam doc
    assert all(r["doc_id"] < 100 for r in out)
    # deterministic under partitioning
    again = qc.clf_select_to_budget(
        pool.repartition(7), model, 60
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in again
    )
    # empty frame -> empty with contract schema
    empty = qc.clf_select_to_budget(pool.limit(0), model, 60)
    assert empty.count() == 0
    assert {"clf_score_micro", "clf_grade"} <= set(empty.columns)
    with pytest.raises(ValueError, match="budget_tokens"):
        qc.clf_select_to_budget(pool, model, -1)


def test_clf_report_deciles_contract(spark):
    """Calibration card (r17): decile counts cover the corpus, kept
    fraction is non-decreasing toward the high deciles, score ranges
    nest inside [min, max], and the table is deterministic under
    repartition."""
    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=64, iters=10)
    pool = target.unionByName(raw)
    scored = qc.score_quality(pool, model)
    rep = {r["decile"]: r for r in qc.clf_report(scored).collect()}
    n_total = pool.count()
    assert sum(r["n_docs"] for r in rep.values()) == n_total
    assert sum(r["n_kept"] for r in rep.values()) == scored.filter(
        F.col("clf_score_micro") >= 0
    ).count()
    deciles = sorted(rep)
    assert deciles[0] >= 0 and deciles[-1] <= 9
    # score ranges are ordered across deciles (equal-count up to
    # grade granularity -> min of a later decile >= min of earlier)
    mins = [rep[d]["min_score_micro"] for d in deciles]
    assert mins == sorted(mins)
    # keep fraction rises toward the top deciles for a separating
    # model: the top decile keeps everything, the bottom nothing
    assert rep[deciles[-1]]["keep_frac"] == 1.0
    assert rep[deciles[0]]["keep_frac"] == 0.0
    for d in deciles:
        r = rep[d]
        assert r["min_score_micro"] <= r["mean_score_micro"] <= r["max_score_micro"]
    again = qc.clf_report(
        qc.score_quality(pool.repartition(7), model)
    ).collect()
    assert sorted(map(tuple, again)) == sorted(
        map(tuple, (rep[d] for d in deciles))
    )


def test_clf_report_tokens_and_validations(spark):
    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=64, iters=5)
    pool = target.unionByName(raw).withColumn(
        "n_tokens", F.size(F.split("text", r"\s+"))
    )
    scored = qc.score_quality(pool, model)
    rep = qc.clf_report(scored, tokens_col="n_tokens").collect()
    assert sum(r["n_tokens"] for r in rep) == pool.agg(
        F.sum("n_tokens")
    ).first()[0]
    with pytest.raises(ValueError, match="non-empty"):
        qc.clf_report(scored.limit(0))
    with pytest.raises(ValueError, match="deciles"):
        qc.clf_report(scored, deciles=0)


def test_clf_separation_card(spark):
    """The separation card discriminates a genuinely separable pair
    (AUC near 1, positive mean separation) and reads ~0.5 AUC for an
    identical pair."""
    target, raw = _corpora(spark)
    model = qc.train_quality_classifier(target, raw, dim=64, iters=10)
    rs = qc.score_quality(raw, model)
    ts = qc.score_quality(target, model)
    row = qc.clf_separation(rs, ts).collect()[0]
    assert row["n_corpus"] == raw.count()
    assert row["n_target"] == target.count()
    assert row["separation_micro"] > 0
    assert row["auc_micro"] > 900_000
    same = qc.clf_separation(rs, rs).collect()[0]
    assert abs(same["auc_micro"] - 500_000) < 20_000
    assert same["separation_micro"] == 0
