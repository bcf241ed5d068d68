"""Deterministic split / exact stratified sampling invariants
(operators/sampling.py) — beyond the DuckDB oracles, pin the
properties that make these safe at corpus scale: determinism across
runs, stability under corpus growth, exact per-stratum counts, and
plan shape (split is shuffle-free; sampling shares one exchange)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import sampling
from cybersecurity_miw_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
FRACS = {"train": 0.98, "val": 0.01, "test": 0.01}


def test_split_deterministic_and_stable_under_growth(spark):
    docs = load_table(spark, SF, "documents", widen=False).select("doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(docs, FRACS).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(docs, FRACS).collect()
    }
    assert a == b
    # growth stability: assignment over a SUBSET matches the full run
    # row-for-row (no dependence on corpus contents)
    sub = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(
            docs.filter(F.col("doc_id") % 3 == 0), FRACS
        ).collect()
    }
    assert all(a[k] == v for k, v in sub.items())


def test_leakage_safe_split_cluster_atomic(spark):
    # clusters: {0,1,2} -> rep 0, {10,11} -> rep 10; 20, 21 unclustered
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 20, 21)], ["doc_id"]
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        ["doc_id", "cluster_id"],
    )
    out = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in sampling.leakage_safe_split(docs, clusters, FRACS).collect()
    }
    # every cluster member shares the representative's key AND label
    assert out[0] == out[1] == out[2] and out[0][0] == 0
    assert out[10] == out[11] and out[10][0] == 10
    # unclustered docs: byte-identical to plain split_assign on own id
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(docs, FRACS).collect()
    }
    assert out[20] == (20, plain[20]) and out[21] == (21, plain[21])
    # cluster members inherit exactly the label their REP would get
    assert out[1][1] == plain[0] and out[11][1] == plain[10]


def test_leakage_safe_split_never_straddles(spark):
    """Planted regression: raw-id hashing DOES scatter some cluster
    across splits on this corpus slice, and the safe variant never
    does — the test fails vacuously-never (i.e. proves the operator
    changes behavior, not just renames a column)."""
    from cybersecurity_miw_spark.operators import dedup

    docs = load_table(spark, SF, "documents")
    cand = dedup.minhash_lsh_candidates(docs, shingle_k=3)
    confirmed = dedup.jaccard_pairs(docs, cand, shingle_k=3).filter(
        F.col("jaccard") >= 0.8
    )
    clusters = dedup.dup_clusters(confirmed)
    safe = sampling.leakage_safe_split(
        docs.select("doc_id"), clusters, FRACS
    )
    per_cluster = (
        safe.join(clusters.select("doc_id", "cluster_id"), "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits"))
        .first()[0]
    )
    assert per_cluster == 1


def test_split_proportions_near_fractions(spark):
    docs = load_table(spark, SF, "documents", widen=False).select("doc_id")
    n = docs.count()
    counts = {
        r["split"]: r["c"]
        for r in sampling.split_assign(docs, FRACS)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert set(counts) <= set(FRACS)
    for name, frac in FRACS.items():
        got = counts.get(name, 0) / n
        # binomial noise at sf0.001 (500 docs): generous band
        assert abs(got - frac) < 0.02, (name, got)


def test_split_rejects_bad_fractions(spark):
    docs = load_table(spark, SF, "documents", widen=False).select("doc_id")
    with pytest.raises(ValueError):
        sampling.split_assign(docs, {"a": 0.5, "b": 0.4})


def test_stratified_sample_exact_counts_and_subset(spark):
    docs = load_table(spark, SF, "documents", widen=False)
    strata = {
        r["source"]: r["c"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    out = sampling.stratified_exact_sample(docs, "source", 0.1)
    got = {
        r["source"]: r["c"]
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == {
        s: math.ceil(0.1 * n) for s, n in strata.items()
    }
    # sampled rows are real rows
    assert out.join(docs, "doc_id", "left_anti").count() == 0
    # deterministic
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.stratified_exact_sample(
            docs, "source", 0.1
        ).collect()
    )
    assert ids1 == ids2


def test_plan_shapes_split_narrow_sample_single_exchange(spark):
    docs = load_table(spark, SF, "documents", widen=False)
    split_plan = sampling.split_assign(
        docs.select("doc_id"), FRACS
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in split_plan  # pure narrow projection

    samp_plan = sampling.stratified_exact_sample(
        docs, "source", 0.1
    )._jdf.queryExecution().executedPlan().toString()
    # both windows share one hash partitioning on source
    assert samp_plan.count("Exchange hashpartitioning") == 1


def test_weighted_interleave_prefix_proportions(spark):
    """Every sufficiently long prefix of the mix holds the weight
    proportions (low-discrepancy property), and the mix is
    deterministic."""
    docs = load_table(spark, SF, "documents", widen=False)
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = sampling.weighted_interleave(docs, "source", weights)
    rows = (
        out.orderBy("mix_key", "source", "doc_id")
        .select("doc_id", "source")
        .collect()
    )
    # only weighted sources survive
    assert {r["source"] for r in rows} == set(weights)
    for prefix in (20, 50):
        head = rows[:prefix]
        for src, w in weights.items():
            got = sum(1 for r in head if r["source"] == src) / prefix
            # each source emits one row every 1/w positions: prefix
            # counts deviate by at most one emission interval
            assert abs(got - w) <= 1.5 / prefix + 0.02, (prefix, src, got)
    again = (
        sampling.weighted_interleave(docs, "source", weights)
        .orderBy("mix_key", "source", "doc_id")
        .select("doc_id", "source")
        .collect()
    )
    assert rows == again


# ---- split divergence QA ----


def test_divergence_low_for_hash_split_high_for_content_split(spark):
    from cybersecurity_miw_spark.operators import sampling

    rows = []
    for i in range(200):
        topic = "alpha beta gamma" if i % 2 == 0 else "delta epsilon zeta"
        rows.append((i, f"{topic} common filler words {i % 7}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    hash_split = sampling.split_assign(df, {"train": 0.5, "val": 0.5})
    js_hash = hash_split.transform(
        lambda d: sampling.split_word_divergence(d)
    ).first()["js_micro_nats"]

    from pyspark.sql import functions as F

    content_split = df.withColumn(
        "split",
        F.when(F.col("text").contains("alpha"), "train").otherwise("val"),
    )
    js_content = sampling.split_word_divergence(content_split).first()[
        "js_micro_nats"
    ]
    # the content-correlated split separates the topic words entirely;
    # the hash split mixes them — divergence must reflect that clearly
    assert js_content > 10 * max(js_hash, 1)


def test_weighted_keep_proportion_and_determinism(spark):
    from cybersecurity_miw_spark.operators import sampling

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        # deterministic weight spread over [0, 1)
        ((F.col("id") % 100) / 100.0).alias("w"),
    )
    kept = sampling.weighted_keep(df, "w")
    n = kept.count()
    # E[kept] = 4000 * mean(w) = 4000 * 0.495 = 1980; md5 buckets are
    # uniform so a 10% band is generous
    assert abs(n - 1980) < 200
    assert kept.count() == n  # deterministic re-run
    # clamping: weight 0 keeps nothing, weight >= 1 keeps everything
    zero = sampling.weighted_keep(
        df.withColumn("w", F.lit(0.0)), "w"
    ).count()
    assert zero == 0
    allw = sampling.weighted_keep(
        df.withColumn("w", F.lit(1.5)), "w"
    ).count()
    assert allw == 4000


def test_sample_k_per_group_exact_k_stable_monotone(spark):
    """Per-group determinism + growth monotonicity: every group
    yields exactly k survivors; re-running is identical; adding rows
    can displace but never reshuffle a group's sample."""
    df = spark.range(0, 900).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("doc_id"),
    )
    s1 = sampling.sample_k_per_group(df, k=10, group_col="g")
    rows1 = sorted((r["g"], r["doc_id"]) for r in s1.collect())
    per_g = {}
    for g, d in rows1:
        per_g.setdefault(g, set()).add(d)
    assert all(len(v) == 10 for v in per_g.values()) and len(per_g) == 3
    # determinism
    rows2 = sorted(
        (r["g"], r["doc_id"])
        for r in sampling.sample_k_per_group(df, k=10, group_col="g").collect()
    )
    assert rows1 == rows2
    # monotone under growth: survivors of the grown corpus that
    # existed before are a subset-of-or-equal-to the old sample only
    # in the displacement direction — every NEW sample member either
    # was in the old sample or is a new row
    grown = spark.range(0, 1200).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("doc_id"),
    )
    rows3 = {
        (r["g"], r["doc_id"])
        for r in sampling.sample_k_per_group(grown, k=10, group_col="g").collect()
    }
    old = set(rows1)
    for g, d in rows3:
        assert (g, d) in old or d >= 900, (g, d)


# ---- budget_select (token-budget corpus selection) ----


def _graded(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "score_pm", "n_tokens"])


def _spec_select(rows, budget):
    """The logical spec: global (score desc, md5, id) cumsum <= budget."""
    import hashlib

    def key(r):
        h = hashlib.md5(f"budget-v1:{r[0]}".encode()).hexdigest()
        return (-r[1], h, r[0])

    out, run = [], 0
    for r in sorted(rows, key=key):
        run += r[2]
        if run <= budget:
            out.append(r[0])
    return sorted(out)


def test_budget_select_matches_global_spec(spark):
    rows = [(i, (i * 7) % 5, 10 + (i * 13) % 40) for i in range(60)]
    for budget in (0, 25, 300, 700, 10_000):
        got = sorted(
            r["doc_id"]
            for r in sampling.budget_select(
                _graded(spark, rows), budget
            ).collect()
        )
        assert got == _spec_select(rows, budget), f"budget={budget}"


def test_budget_select_budget_is_inclusive_and_respected(spark):
    rows = [(1, 9, 50), (2, 9, 50), (3, 1, 50)]
    out = sampling.budget_select(_graded(spark, rows), 100).collect()
    assert sum(r["n_tokens"] for r in out) <= 100
    assert sorted(r["doc_id"] for r in out) == [1, 2]  # boundary-exact


def test_budget_select_deterministic(spark):
    rows = [(i, i % 3, 5) for i in range(30)]
    g = _graded(spark, rows)
    a = sorted(map(tuple, sampling.budget_select(g, 60).collect()))
    b = sorted(map(tuple, sampling.budget_select(g, 60).collect()))
    assert a == b


def test_budget_select_single_score_bucket_degrades_gracefully(spark):
    # worst-case skew: every doc shares one score — the documented
    # single-partition fallback must still be spec-exact
    rows = [(i, 7, 10) for i in range(20)]
    out = sampling.budget_select(_graded(spark, rows), 55).collect()
    assert len(out) == 5
    assert sorted(r["doc_id"] for r in out) == _spec_select(rows, 55)


# ---- weighted_sample_k (A-ES without replacement) ----


def test_weighted_sample_exact_k_and_deterministic(spark):
    rows = [(i, float(1 + i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = sorted(r["doc_id"] for r in sampling.weighted_sample_k(df, 10, "w").collect())
    b = sorted(r["doc_id"] for r in sampling.weighted_sample_k(df, 10, "w").collect())
    assert a == b and len(a) == 10


def test_weighted_sample_heavy_row_always_wins(spark):
    # one row with 10000x the weight of 200 others: ln(u)/w ~ 0 for
    # it, so it must appear in every salt's sample
    rows = [(0, 1_000_000.0)] + [(i, 100.0) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    for salt in ("s1", "s2", "s3", "s4", "s5"):
        got = {
            r["doc_id"]
            for r in sampling.weighted_sample_k(df, 20, "w", salt=salt).collect()
        }
        assert 0 in got, salt


def test_weighted_sample_weight_proportional_frequency(spark):
    # 2 strata of equal size, one 5x heavier: across salts, the heavy
    # stratum should dominate the sample (not a tight bound — a sanity
    # check that weights steer inclusion)
    rows = [(i, 5.0) for i in range(50)] + [(i, 1.0) for i in range(50, 100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    heavy = 0
    for salt in ("a", "b", "c", "d", "e", "f"):
        got = [
            r["doc_id"]
            for r in sampling.weighted_sample_k(df, 20, "w", salt=salt).collect()
        ]
        heavy += sum(1 for i in got if i < 50)
    assert heavy > 0.6 * 6 * 20  # expected ~0.79 share at w-ratio 5


def test_weighted_sample_nonpositive_weights_dropped(spark):
    rows = [(0, 0.0), (1, -3.0), (2, 2.0), (3, 2.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(
        r["doc_id"] for r in sampling.weighted_sample_k(df, 10, "w").collect()
    )
    assert got == [2, 3]


def test_weighted_sample_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(50)], ["doc_id", "w"])
    plan = (
        sampling.weighted_sample_k(df, 5, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_leakage_safe_split_string_ids(spark):
    """Non-numeric doc ids must hash like any other id — the long
    cast that silently NULLed them (sending every doc to the
    last-declared split) is gone (ADVICE r8)."""
    from cybersecurity_miw_spark.operators.sampling import (
        leakage_safe_split,
        split_assign,
    )

    docs = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(300)], "doc_id STRING"
    )
    clusters = spark.createDataFrame(
        [("doc-1", "doc-0"), ("doc-0", "doc-0")],
        "doc_id STRING, cluster_id STRING",
    )
    out = leakage_safe_split(
        docs, clusters, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], []).append(r["doc_id"])
    # a NULL split_key would put ALL docs in 'test'
    assert len(by_split["train"]) > 200
    # cluster members share doc-0's key and split
    plain = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    got = {r["doc_id"]: r["split"] for r in out}
    assert got["doc-1"] == got["doc-0"] == plain["doc-0"]
    # unclustered docs keep their plain-split labels
    assert all(
        got[d] == plain[d] for d in got if d not in ("doc-0", "doc-1")
    )


def test_temperature_weights_and_interleave(spark):
    """Temperature mixing (the LLM data-recipe rule): T=1 reproduces
    natural source proportions, larger T flattens toward uniform
    (small sources upweighted, never above uniform), T<=0 raises, and
    the turnkey interleave equals weighted_interleave with the
    computed weights."""
    import math

    import pytest

    from cybersecurity_miw_spark.operators import sampling

    rows = (
        [(i, "big") for i in range(90)]
        + [(100 + i, "mid") for i in range(9)]
        + [(200, "tiny")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    w1 = sampling.temperature_weights(df, "source", temperature=1.0)
    assert w1 == pytest.approx({"big": 0.9, "mid": 0.09, "tiny": 0.01})

    w2 = sampling.temperature_weights(df, "source", temperature=2.0)
    tot = math.sqrt(90) + math.sqrt(9) + math.sqrt(1)
    assert w2 == pytest.approx(
        {"big": math.sqrt(90) / tot, "mid": 3 / tot, "tiny": 1 / tot}
    )
    # flattening is monotone toward uniform
    assert w2["tiny"] > w1["tiny"] and w2["big"] < w1["big"]
    w_inf = sampling.temperature_weights(df, "source", temperature=1e9)
    assert all(abs(v - 1 / 3) < 1e-6 for v in w_inf.values())

    with pytest.raises(ValueError, match="temperature"):
        sampling.temperature_weights(df, "source", temperature=0)

    auto = sampling.temperature_interleave(df, "source", temperature=2.0)
    manual = sampling.weighted_interleave(df, "source", w2)
    key = lambda r: (r["doc_id"], r["source"], round(r["mix_key"], 9))
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, manual.collect())
    )


def _mix_df(spark):
    # 3 sources: a = 4 docs (small, hot), b = 10, c = 26
    rows = [
        (i, "a" if i < 4 else ("b" if i < 14 else "c"), 10 + i % 3)
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )


def test_mix_to_budget_caps_repeats_and_truncates(spark):
    """Repetition-capped mixing (the published temperature recipe's
    missing half): a small hot source repeats whole epochs but never
    past max_epochs; a mid source gets full epochs plus a greedy
    md5-prefix partial epoch; the big source truncates; emitted
    tokens never exceed the budget and the allocation report says
    exactly where every token went."""
    df = _mix_df(spark)
    m: list = []
    out = sampling.mix_to_budget(
        df, 500, max_epochs=2, metrics=m
    ).collect()

    rep = {r["source"]: r for r in m}
    assert rep["a"]["capped"] and rep["a"]["full_epochs"] == 2
    assert rep["a"]["target_tokens"] == rep["a"]["cap_tokens"]
    assert not rep["b"]["capped"] and not rep["c"]["capped"]
    assert sum(r["target_tokens"] for r in m) <= 500

    per = {}
    toks = 0
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["epoch"])
        toks += r["n_tokens"]
    assert toks <= 500
    # epoch cap: no document appears more than max_epochs times
    assert max(len(v) for v in per.values()) <= 2
    # the hot source's docs all appear exactly max_epochs times
    assert all(sorted(per[d]) == [0, 1] for d in range(4))
    # partial epochs are md5-order PREFIXES: re-running is identical
    again = sampling.mix_to_budget(df, 500, max_epochs=2).collect()
    key = lambda r: (r["doc_id"], r["epoch"], round(r["mix_key"], 9))
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_mix_to_budget_multi_round_water_filling(spark):
    """Every source capping in a different water-fill round: T=0.5
    (weights ~ tok^2) pushes the big source over its cap first, the
    redistribution pushes the mid one over in round 2, then the small
    one — all end at exactly max_epochs * tokens, nothing emitted
    past any cap."""
    rows = (
        [(i, "a", 1) for i in range(10)]
        + [(100 + i, "b", 10) for i in range(10)]
        + [(200 + i, "c", 100) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    m: list = []
    out = sampling.mix_to_budget(
        df, 3000, temperature=0.5, max_epochs=2, metrics=m
    ).collect()
    rep = {r["source"]: r for r in m}
    assert all(rep[s]["capped"] for s in "abc"), m
    assert rep["a"]["target_tokens"] == 20
    assert rep["b"]["target_tokens"] == 200
    assert rep["c"]["target_tokens"] == 2000
    per: dict = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == [0, 1] for v in per.values())
    assert sum(r["n_tokens"] for r in out) == 2220


def test_mix_to_budget_interleave_prefix_and_validation(spark):
    """mix_key contract: any prefix of the (mix_key, source, id,
    epoch) order holds sources near their final token-allocation
    shares; explicit weights override temperature; degenerate inputs
    validate."""
    df = _mix_df(spark)
    m: list = []
    out = (
        sampling.mix_to_budget(df, 400, max_epochs=4, metrics=m)
        .orderBy("mix_key", "source", "doc_id", "epoch")
        .collect()
    )
    total = sum(r["target_tokens"] for r in m)
    shares = {
        r["source"]: r["target_tokens"] / total for r in m
    }
    half = out[: len(out) // 2]
    half_toks = sum(r["n_tokens"] for r in half)
    for s, share in shares.items():
        got = sum(r["n_tokens"] for r in half if r["source"] == s)
        assert abs(got / half_toks - share) < 0.15, (s, got, shares)

    # explicit weights: only listed sources emit
    m2: list = []
    only_ab = sampling.mix_to_budget(
        df, 200, weights={"a": 0.7, "b": 0.3}, metrics=m2
    )
    assert {r["source"] for r in only_ab.collect()} <= {"a", "b"}
    assert {r["source"] for r in m2} == {"a", "b"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_epochs"):
        sampling.mix_to_budget(df, 100, max_epochs=0)
    with _pytest.raises(ValueError, match="budget_tokens"):
        sampling.mix_to_budget(df, -1)
    with _pytest.raises(ValueError, match="temperature"):
        sampling.mix_to_budget(df, 100, temperature=0)
    with _pytest.raises(ValueError, match="weights"):
        sampling.mix_to_budget(df, 100, weights={"a": -1.0})


def test_mix_report_audits_the_mix(spark):
    """mix_report (the dataset card): per-source rows/docs/epochs
    tally exactly with a driver-side recount of the mix, token_share
    sums to 1 over the emitted mix, effective_epochs is rows/docs,
    and the epoch-free path (a plain interleave) reports max_epoch=0
    with effective_epochs 1."""
    _pytest = pytest
    df = _mix_df(spark)
    mixed = sampling.mix_to_budget(df, 500, max_epochs=2)
    rep = {
        r["source"]: r
        for r in sampling.mix_report(mixed, tokens_col="n_tokens").collect()
    }
    rows = mixed.collect()
    for s, r in rep.items():
        mine = [x for x in rows if x["source"] == s]
        assert r["n_rows"] == len(mine)
        assert r["n_docs"] == len({x["doc_id"] for x in mine})
        assert r["max_epoch"] == max(x["epoch"] for x in mine)
        assert r["tokens"] == sum(x["n_tokens"] for x in mine)
        assert r["effective_epochs"] == _pytest.approx(
            r["n_rows"] / r["n_docs"]
        )
    assert sum(r["token_share"] for r in rep.values()) == _pytest.approx(1.0)
    # the capped hot source's repetition factor is exactly max_epochs
    assert rep["a"]["effective_epochs"] == _pytest.approx(2.0)

    # epoch-free mix (no epoch column): repetition-free card
    flat = sampling.weighted_interleave(
        df, "source", {"a": 0.5, "b": 0.5}
    )
    frep = sampling.mix_report(flat, tokens_col="n_tokens").collect()
    assert all(r["max_epoch"] == 0 for r in frep)
    assert all(r["effective_epochs"] == _pytest.approx(1.0) for r in frep)

    # tokens omitted: no tokens/token_share columns, counts intact
    slim = sampling.mix_report(mixed)
    assert "tokens" not in slim.columns and "token_share" not in slim.columns
    assert slim.count() == len(rep)
    assert sampling.mix_to_budget(df, 0).count() == 0
