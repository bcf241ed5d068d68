"""Goldens for the CCNet-style n-gram LM perplexity filter
(operators/ngramlm.py): hand-computed model log-probs on a tiny
corpus, the three scoring paths (bigram hit / unigram backoff / OOV
floor / tokenless doc), min_count pruning semantics, bit-exact
determinism under repartitioning, the tercile cut fit, the store
round-trip + family guard, the drift monitor → rebuild loop — the
store-family standard test set (see test_dsir.py /
test_qualityclf.py) — and the curate_documents lm_ppl_gate wiring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import ngramlm as lm

MICRO = 1_000_000


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple("" if v is None else repr(v) for v in t),
    )


def _target(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "a cat and a dog"),
            (4, "the cat and the dog sat"),
        ],
        "doc_id long, text string",
    )


def _model(spark):
    return lm.train_ngram_lm(_target(spark))


def _ln_micro(x: float) -> int:
    return int(math.floor(math.log(x) * MICRO + 0.5))


def test_model_values_hand_computed(spark):
    model, params = _model(spark)
    rows = {
        (r["w1"], r["w2"]): (r["lp_micro"], r["c"])
        for r in model.collect()
    }
    # corpus: 23 tokens, 9 distinct words
    assert params["n_tokens"] == 23 and params["vocab"] == 9
    nv = 23 + 9
    # saturated bigram: "on the" follows every "on" → ln(2/2) = 0
    assert rows[("on", "the")] == (0, 2)
    # MLE conditional: c("the cat")=2, c1("the")=6 → ln(2/6)
    assert rows[("the", "cat")] == (_ln_micro(2 / 6), 2)
    # RAW add-one unigram: ln((c1+1)/(N+V)) — ln(0.4) is applied at
    # scoring time on the backoff path only (Brants et al. §4; the
    # r18 ADVICE fix — first tokens are not penalized)
    aln = _ln_micro(0.4)
    assert params["alpha_ln_micro"] == aln
    assert params["unigram_lp"] == "raw"
    assert rows[(None, "the")] == (_ln_micro(7 / nv), 6)
    assert rows[(None, "mat")] == (_ln_micro(2 / nv), 1)
    # OOV floor (backoff path: includes the alpha term)
    assert params["lp_oov_micro"] == aln + _ln_micro(1 / nv)
    # every log-prob is non-positive
    assert all(v[0] <= 0 for v in rows.values())


def test_scoring_paths(spark):
    model, params = _model(spark)
    oov = params["lp_oov_micro"]
    batch = spark.createDataFrame(
        [
            (10, "the cat"),       # unigram(the) + bigram(the cat)
            (11, "zz the"),        # OOV + backoff unigram(the)
            (12, ""),              # tokenless
            (13, "zz qq"),         # OOV + OOV
        ],
        "doc_id long, text string",
    )
    aln = params["alpha_ln_micro"]
    out = {
        r["doc_id"]: r
        for r in lm.lm_score(
            batch, model, oov, alpha_ln_micro=aln
        ).collect()
    }
    uni = {
        r["w2"]: r["lp_micro"]
        for r in model.filter(F.col("w1").isNull()).collect()
    }
    bi = {
        (r["w1"], r["w2"]): r["lp_micro"]
        for r in model.filter(F.col("w1").isNotNull()).collect()
    }
    assert out[10]["lp_micro_sum"] == uni["the"] + bi[("the", "cat")]
    assert out[10]["n_lm_tokens"] == 2
    # doc 11: first-token OOV is alpha-FREE (oov - aln); token 2 "the"
    # has no ("zz","the") bigram -> raw unigram + aln backoff penalty;
    # the two alpha terms cancel
    assert out[11]["lp_micro_sum"] == (oov - aln) + (uni["the"] + aln)
    # doc 13: first OOV alpha-free, second OOV on the backoff path
    assert out[13]["lp_micro_sum"] == 2 * oov - aln
    assert out[13]["nlp_micro_tok"] == -(2 * oov - aln) // 2
    # tokenless doc: zero tokens, OOV-floor NLL → sorts into tail
    assert out[12]["n_lm_tokens"] == 0
    assert out[12]["lp_micro_sum"] == 0
    assert out[12]["nlp_micro_tok"] == -oov
    # per-token NLL is the truncated integer mean
    assert out[10]["nlp_micro_tok"] == (
        -(uni["the"] + bi[("the", "cat")])
    ) // 2
    # first token scores the RAW unigram -- no backoff penalty
    single = lm.lm_score(
        spark.createDataFrame([(14, "the")], "doc_id long, text string"),
        model, oov, alpha_ln_micro=aln,
    ).first()
    assert single["lp_micro_sum"] == uni["the"]
    # alpha_ln_micro is required: the model stores raw unigrams
    with pytest.raises(ValueError, match="alpha_ln_micro"):
        lm.lm_score(batch, model, oov)


def test_min_count_prunes_to_oov(spark):
    target = _target(spark)
    model, params = lm.train_ngram_lm(target, min_count=2)
    vocab = {
        r["w2"] for r in model.filter(F.col("w1").isNull()).collect()
    }
    # singletons (mat, rug) pruned from the vocab
    assert "mat" not in vocab and "rug" not in vocab
    assert "the" in vocab
    # no bigram row may reference a pruned word
    for r in model.filter(F.col("w1").isNotNull()).collect():
        assert r["w1"] in vocab and r["w2"] in vocab
    # V shrinks, N stays the full token count (the KenLM convention)
    assert params["vocab"] == len(vocab)
    assert params["n_tokens"] == 23
    # a pruned word now scores the OOV floor
    batch = spark.createDataFrame(
        [(20, "mat")], "doc_id long, text string"
    )
    row = lm.lm_score(
        batch, model, params["lp_oov_micro"],
        alpha_ln_micro=params["alpha_ln_micro"],
    ).first()
    # single first token: the alpha-free OOV floor
    assert row["lp_micro_sum"] == (
        params["lp_oov_micro"] - params["alpha_ln_micro"]
    )


def test_train_and_score_deterministic_under_repartition(spark):
    target = _target(spark)
    m1, p1 = lm.train_ngram_lm(target)
    m2, p2 = lm.train_ngram_lm(target.repartition(7))
    assert p1 == p2
    assert _rows(m1) == _rows(m2)
    batch = _target(spark).repartition(5)
    s1 = lm.lm_score(_target(spark), m1, p1["lp_oov_micro"],
                     alpha_ln_micro=p1["alpha_ln_micro"])
    s2 = lm.lm_score(batch, m2, p2["lp_oov_micro"],
                     alpha_ln_micro=p2["alpha_ln_micro"])
    assert _rows(s1) == _rows(s2)


def test_empty_target_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm.train_ngram_lm(empty)
    with pytest.raises(ValueError, match="min_count"):
        lm.train_ngram_lm(_target(spark), min_count=0)
    with pytest.raises(ValueError, match="alpha"):
        lm.train_ngram_lm(_target(spark), alpha=0.0)


def test_bucket_cuts_and_report(spark):
    model, params = _model(spark)
    batch = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(6)]
        + [(10 + i, "a dog and a cat") for i in range(6)]
        + [(20 + i, "zz qq ww unknown gibberish") for i in range(6)],
        "doc_id long, text string",
    )
    scored = lm.lm_score(batch, model, params["lp_oov_micro"],
                         alpha_ln_micro=params["alpha_ln_micro"])
    cuts = lm.lm_bucket_cuts(scored)
    assert cuts["cut_head_micro"] <= cuts["cut_tail_micro"]
    assert cuts["n_docs"] == 18
    bucketed = lm.lm_ppl_buckets(
        scored, cuts["cut_head_micro"], cuts["cut_tail_micro"]
    )
    rep = {
        r["ppl_bucket"]: r for r in lm.lm_bucket_report(bucketed).collect()
    }
    # terciles on three separated score groups → all three buckets
    assert set(rep) == {"head", "middle", "tail"}
    assert sum(r["n_docs"] for r in rep.values()) == 18
    # fluent target text is head, gibberish is tail
    assert rep["head"]["mean_nlp_micro"] < rep["tail"]["mean_nlp_micro"]
    by_id = {r["doc_id"]: r["ppl_bucket"] for r in bucketed.collect()}
    assert by_id[0] == "head" and by_id[20] == "tail"
    with pytest.raises(ValueError, match="middle bucket"):
        lm.lm_ppl_buckets(scored, 10, 5)


def test_store_roundtrip_and_family_guard(spark, tmp_path):
    d = str(tmp_path / "lm")
    params = lm.write_lm_model(_target(spark), d)
    model_df, loaded = lm.load_lm_model(spark, d)
    assert loaded == params
    in_mem, _ = _model(spark)
    assert _rows(model_df) == _rows(in_mem)
    # frozen-path scoring ≡ in-memory scoring
    batch = spark.createDataFrame(
        [(30, "the cat sat"), (31, "zz")], "doc_id long, text string"
    )
    frozen = lm.score_with_lm_model(batch, d)
    direct = lm.lm_score(batch, in_mem, params["lp_oov_micro"],
                         alpha_ln_micro=params["alpha_ln_micro"])
    assert _rows(frozen) == _rows(direct)
    # guards: missing sidecar, family mismatch
    with pytest.raises(ValueError, match="no LM sidecar"):
        lm.load_lm_model(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="order"):
        lm.load_lm_model(spark, d, order=3)
    # pre-r18 store (unigrams with the alpha baked in) is rejected
    import json as _json
    import pathlib as _pl

    sc = _pl.Path(d) / "_lm_params.json"
    legacy = {k: v for k, v in params.items() if k != "unigram_lp"}
    sc.write_text(_json.dumps(legacy))
    # drop Hadoop's local-FS checksum sidecar so the edit is readable
    crc = _pl.Path(d) / "._lm_params.json.crc"
    if crc.exists():
        crc.unlink()
    with pytest.raises(ValueError, match="raw-unigram"):
        lm.load_lm_model(spark, d)


def test_drift_monitor_and_rebuild(spark, tmp_path):
    d = str(tmp_path / "lm")
    # corpora sized well past the 1024-bucket add-one smoothing mass,
    # so the JS signal is not flattened away by the pseudo-counts
    big_target = spark.createDataFrame(
        [
            (i, "the cat sat on the mat and the dog sat on the rug")
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    lm.write_lm_model(big_target, d)
    # in-distribution batch: far under the default threshold
    ok = lm.lm_drift_report(big_target, d)
    assert not ok["stale"]
    # disjoint-vocabulary feed: drifted
    drifted_batch = spark.createDataFrame(
        [(i, "zz qq ww ee rr tt yy uu zz qq ww ee") for i in range(200)],
        "doc_id long, text string",
    )
    bad = lm.lm_drift_report(drifted_batch, d)
    assert bad["stale"] and bad["js_micro_nats"] > ok["js_micro_nats"]
    # remediation: rebuild keeps the recorded family
    p2 = lm.rebuild_lm_model(big_target.union(drifted_batch), d)
    assert p2["min_count"] == 1 and p2["alpha"] == 0.4
    after = lm.lm_drift_report(drifted_batch, d)
    assert after["js_micro_nats"] < bad["js_micro_nats"]


def test_curate_documents_lm_gate(spark, tmp_path):
    from cybersecurity_miw_spark.pipeline import curate_documents

    model, params = _model(spark)
    fluent = (
        "the cat sat on the mat and the dog sat on the rug with the "
        "cat and the dog on the mat near the rug while the cat sat"
    )
    noise = (
        "zxqv wkjh qpzm xvbn lkjs dhfg qwpo mznx bvcx aslk djfh gqpw "
        "zmxn cvbl ksjd hfgq wpoz mxnc vblk sjdh fgqw pozm xncv blks"
    )
    # distinct suffixes: identical texts would ALSO collapse in the
    # exact-dedup stage downstream of the gate under test
    docs = spark.createDataFrame(
        [(i, f"{fluent} extra{i}") for i in range(4)]
        + [(10 + i, f"{noise} extra{i}") for i in range(4)],
        "doc_id long, text string",
    )
    scored = lm.lm_score(docs, model, params["lp_oov_micro"],
                         alpha_ln_micro=params["alpha_ln_micro"])
    cut = scored.filter(F.col("doc_id") < 10).agg(
        F.max("nlp_micro_tok")
    ).first()[0]
    metrics = []
    out = curate_documents(
        docs,
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        lm_model=model,
        lm_params=params,
        lm_max_nlp_micro=int(cut),
        metrics=metrics,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {0, 1, 2, 3}
    stage = [m for m in metrics if m["stage"] == "lm_ppl_gate"]
    assert stage and stage[0]["n_dropped"] == 4
    # validation: a model without a cut, both sources, missing params
    with pytest.raises(ValueError, match="lm_max_nlp_micro"):
        curate_documents(
            docs, apply_gopher=False, redact_pii=False,
            quality_floor=None, near_dup_threshold=None,
            lm_model=model, lm_params=params,
        )
    with pytest.raises(ValueError, match="not both"):
        curate_documents(
            docs, apply_gopher=False, redact_pii=False,
            quality_floor=None, near_dup_threshold=None,
            lm_model=model, lm_params=params, lm_model_dir="x",
            lm_max_nlp_micro=0,
        )
    with pytest.raises(ValueError, match="lm_params"):
        curate_documents(
            docs, apply_gopher=False, redact_pii=False,
            quality_floor=None, near_dup_threshold=None,
            lm_model=model, lm_max_nlp_micro=0,
        )
    with pytest.raises(ValueError, match="without a model"):
        curate_documents(
            docs, apply_gopher=False, redact_pii=False,
            quality_floor=None, near_dup_threshold=None,
            lm_max_nlp_micro=0,
        )
