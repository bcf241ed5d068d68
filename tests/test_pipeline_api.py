"""Goldens for the library-level curation pipeline
(cybersecurity_miw_spark/pipeline.py): stage toggles, PII propagation
into the surviving text, and equivalence with the hand-composed
example chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_miw_spark import pipeline
from cybersecurity_miw_spark.sources.tables import load_table


def test_curate_matches_example_chain(spark, sf_dir):
    import examples.training_data_pipeline as ex

    lib = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(
            load_table(spark, sf_dir, "documents")
        ).select("doc_id").collect()
    )
    example = sorted(
        r["doc_id"]
        for r in ex.curate(spark, sf_dir).select("doc_id").collect()
    )
    assert lib == example and len(lib) > 0


def test_curate_stage_toggles(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(30))),          # clean keeper
        (2, " ".join(["spam ham"] * 30)),                   # gopher-reject
        (3, "email me at a@b.io " + " ".join(f"t{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = pipeline.curate_documents(df, quality_floor=None)
    got = {r["doc_id"]: r["text"] for r in full.select("doc_id", "text").collect()}
    assert 2 not in got                      # gopher dropped it
    assert "<EMAIL>" in got[3]               # PII scrubbed in survivors
    no_gopher = pipeline.curate_documents(
        df, apply_gopher=False, quality_floor=None
    )
    assert 2 in {r["doc_id"] for r in no_gopher.select("doc_id").collect()}
    no_pii = pipeline.curate_documents(
        df, redact_pii=False, quality_floor=None
    )
    got2 = {r["doc_id"]: r["text"] for r in no_pii.select("doc_id", "text").collect()}
    assert "a@b.io" in got2[3]               # untouched when disabled


def test_curate_drops_exact_and_near_dups(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, base),
        (2, base),                            # exact dup
        (3, base + " extra trailing words"),  # near dup
        (4, " ".join(f"z{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(
            df, quality_floor=None, near_dup_threshold=0.5
        ).select("doc_id").collect()
    )
    assert kept == [1, 4]


def test_curate_against_fingerprint_store_drops_history_dups(spark):
    """Incremental curation: with a fingerprint_store passed, the
    exact-dedup stage drops batch docs already in history AND keeps
    batch-internal dedup semantics; without it, behavior unchanged."""
    from cybersecurity_miw_spark.operators import dedup
    from cybersecurity_miw_spark.pipeline import curate_documents

    good = (
        "The quick brown fox jumps over the lazy dog while the calm "
        "river flows through the green valley and the birds sing "
        "softly in the clear morning air of early spring today."
    )
    history = spark.createDataFrame(
        [(1, good)], "doc_id LONG, text STRING"
    )
    batch = spark.createDataFrame(
        [
            (10, good),              # exact dup of history -> drop
            (11, good + " Fresh."),  # new -> keep
        ],
        "doc_id LONG, text STRING",
    )
    store = dedup.fingerprint_store(history)
    kept = {
        r["doc_id"]
        for r in curate_documents(
            batch,
            quality_floor=None,
            near_dup_threshold=None,
            fingerprint_store=store,
        ).collect()
    }
    assert kept == {11}

    # without the store the same batch keeps both (no history)
    kept_plain = {
        r["doc_id"]
        for r in curate_documents(
            batch, quality_floor=None, near_dup_threshold=None
        ).collect()
    }
    assert kept_plain == {10, 11}


def test_curate_semantic_stage_drops_paraphrase_level_dups(spark):
    """semantic_threshold: a word-bag reorder (token 3-shingles all
    differ -> invisible to MinHash/exact stages) has an IDENTICAL
    hashed embedding, so the semantic stage drops the higher id;
    disabled (default), both survive."""
    words = [f"tok{i}" for i in range(40)]
    base = " ".join(words)
    reordered = " ".join(reversed(words))  # same bag, no shared 3-shingles
    rows = [
        (1, base),
        (2, reordered),
        (3, " ".join(f"z{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept_default = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(
            df, quality_floor=None, near_dup_threshold=0.5
        ).select("doc_id").collect()
    )
    assert kept_default == [1, 2, 3]  # token stages can't see the pair
    kept_sem = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(
            df, quality_floor=None, near_dup_threshold=0.5,
            semantic_threshold=0.95, semantic_planes=2,
        ).select("doc_id").collect()
    )
    assert kept_sem == [1, 3]  # paraphrase-level dup dropped


def test_curate_semantic_stage_keeps_wordless_docs(spark):
    """r11 ADVICE: hashed_embedding emits NO row for a doc with no
    whitespace-delimited words, so a survivors semi-join silently
    dropped such docs. The stage now anti-joins the REMOVED set —
    a doc with no embedding row can never be removed."""
    rows = [
        (1, "   "),  # word-less: no embedding row
        (2, " ".join(f"tok{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(
            df, apply_gopher=False, redact_pii=False,
            quality_floor=None, near_dup_threshold=None,
            semantic_threshold=0.95, semantic_planes=2,
        ).select("doc_id").collect()
    )
    assert kept == [1, 2]


def test_curate_metrics_funnel(spark):
    """metrics=[...]: one {stage, n_in, n_out, n_dropped} per enabled
    stage, the funnel consistent end-to-end (each stage's n_in equals
    the previous n_out; the final n_out equals the returned row
    count) and identical survivors to the unmonitored run."""
    rows = [
        (1, " ".join(f"tok{i}" for i in range(40))),
        (2, " ".join(f"tok{i}" for i in range(40))),       # exact dup of 1
        (3, " ".join(f"tok{i}" for i in range(1, 41))),    # near-dup-ish
        (4, "zz " * 3),                                    # low quality
        (5, " ".join(f"aa{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kwargs = dict(near_dup_threshold=0.5, semantic_threshold=0.95)
    m: list = []
    monitored = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(
            df, metrics=m, **kwargs
        ).select("doc_id").collect()
    )
    plain = sorted(
        r["doc_id"]
        for r in pipeline.curate_documents(df, **kwargs)
        .select("doc_id").collect()
    )
    assert monitored == plain
    stages = [r["stage"] for r in m]
    assert stages == [
        "gopher", "pii_redact", "quality_floor", "exact_dedup",
        "near_dedup", "semantic_dedup",
    ]
    for prev, cur in zip(m, m[1:]):
        assert cur["n_in"] == prev["n_out"]
    assert m[0]["n_in"] == 5
    assert m[-1]["n_out"] == len(monitored)
    assert all(r["n_dropped"] == r["n_in"] - r["n_out"] for r in m)
    exact = next(r for r in m if r["stage"] == "exact_dedup")
    assert exact["n_dropped"] >= 1  # the planted verbatim dup


def _assembly_docs(spark):
    # 3 sources; docs 1 and 2 are near-dups (one cluster)
    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, "a", base),
        (2, "a", base + " tail"),
        *[
            (10 + i, "a", " ".join(f"a{i}w{j}" for j in range(20)))
            for i in range(8)
        ],
        *[
            (30 + i, "b", " ".join(f"b{i}w{j}" for j in range(30)))
            for i in range(10)
        ],
        *[
            (60 + i, "c", " ".join(f"c{i}w{j}" for j in range(25)))
            for i in range(20)
        ],
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return df.withColumn("n_tokens", F.size(F.split("text", r"\s+")))


def test_assemble_dataset_end_to_end_with_funnel(spark):
    """assemble_dataset (VERDICT r14 #1 — the tested back half):
    leakage-safe split keeps the planted near-dup cluster in ONE
    split, the train mix carries the interleave contract plus the
    deterministic range-shard id, chunks inherit the parent's
    mix_key/shard_id, the funnel reports every stage, and the
    monitored run returns identical rows to the unmonitored one."""
    from cybersecurity_miw_spark.operators import dedup

    df = _assembly_docs(spark)
    cand = dedup.minhash_lsh_candidates(df, shingle_k=3)
    confirmed = dedup.jaccard_pairs(df, cand, shingle_k=3).filter(
        F.col("jaccard") >= 0.5
    )
    clusters = dedup.dup_clusters(confirmed)

    kwargs = dict(
        clusters=clusters,
        weights={"a": 0.5, "b": 0.3, "c": 0.2},
        chunk_window=16,
        shard_rows=5,
    )
    m: list = []
    out = pipeline.assemble_dataset(df, metrics=m, **kwargs)
    rows = out.collect()

    # funnel: stages in order, counts consistent, final == returned
    assert [r["stage"] for r in m] == ["train_split", "mix", "chunk"]
    for prev, cur in zip(m, m[1:]):
        assert cur["n_in"] == prev["n_out"]
    assert m[0]["n_in"] == 40 and m[-1]["n_out"] == len(rows)

    # leakage safety: docs 1 and 2 share a cluster -> same split fate
    # (both in the returned train set or both absent)
    ids = {r["doc_id"] for r in rows}
    assert (1 in ids) == (2 in ids)

    # chunks inherit the parent's mix_key and shard_id
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(
            (r["mix_key"], r["shard_id"])
        )
    assert all(len(v) == 1 for v in by_doc.values())
    # shard bound: <= shard_rows * n_sources DOCS per shard
    shard_docs: dict = {}
    for d, v in by_doc.items():
        shard_docs.setdefault(next(iter(v))[1], set()).add(d)
    assert all(len(v) <= 5 * 3 for v in shard_docs.values())
    # deterministic: unmonitored run returns identical rows
    again = pipeline.assemble_dataset(df, **kwargs).collect()
    key = lambda r: (r["doc_id"], r["chunk_id"], round(r["mix_key"], 9))
    assert sorted(map(key, rows)) == sorted(map(key, again))


def test_assemble_dataset_budget_chunk_pack_compose(spark):
    """The budget path composes: mix_to_budget upsamples the hot
    source (epoch column, funnel n_dropped < 0 by design), chunking
    happens ONCE per doc and re-attaches to every epoch row, and
    packing bins the (doc, epoch, chunk) rows under the token budget
    with a collision-free row key."""
    df = _assembly_docs(spark)
    m: list = []
    out = pipeline.assemble_dataset(
        df,
        fractions={"train": 1.0},
        budget_tokens=2000,
        max_epochs=3,
        temperature=1.0,
        chunk_window=8,
        pack_budget=64,
        n_packers=4,
        shard_rows=200,
        metrics=m,
    )
    rows = out.collect()
    assert [r["stage"] for r in m] == ["train_split", "mix", "chunk", "pack"]
    assert m[0]["n_out"] == 40  # fractions {train: 1.0}
    # upsampling: some doc appears in >1 epoch, none past max_epochs
    epochs: dict = {}
    for r in rows:
        epochs.setdefault((r["doc_id"], r["chunk_id"]), set()).add(r["epoch"])
    assert max(len(v) for v in epochs.values()) >= 2
    assert all(len(v) <= 3 for v in epochs.values())
    # every epoch row carries the SAME chunk set as epoch 0
    per_doc: dict = {}
    for (d, c), eps in epochs.items():
        per_doc.setdefault(d, {})[c] = eps
    for d, by_chunk in per_doc.items():
        sets = list(by_chunk.values())
        assert all(s == sets[0] for s in sets), (d, by_chunk)
    # pack: bins respect the budget (no overflow rows: chunks <= 8
    # tokens each, well under 64)
    assert all(not r["overflow"] for r in rows)
    fills: dict = {}
    for r in rows:
        k = (r["packer"], r["bin_id"])
        fills[k] = fills.get(k, 0) + r["n_chunk_tokens"]
    assert all(v <= 64 for v in fills.values())
    assert "_row_key" not in out.columns


def test_assemble_dataset_writes_shards_and_eval(spark, tmp_path):
    """out_dir: the train set lands as ordered parquet shards under
    train/, non-train splits under eval/ partitioned by split, and
    the written train rows equal the returned frame."""
    df = _assembly_docs(spark)
    out_dir = str(tmp_path / "ds")
    out = pipeline.assemble_dataset(
        df,
        out_dir=out_dir,
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        weights={"a": 0.5, "b": 0.3, "c": 0.2},
        shard_rows=10,
    )
    written = spark.read.parquet(f"{out_dir}/train")
    key = lambda r: (r["doc_id"], round(r["mix_key"], 9), r["shard_id"])
    assert sorted(map(key, written.collect())) == sorted(
        map(key, out.collect())
    )
    ev = spark.read.parquet(f"{out_dir}/eval")
    assert set(
        r["split"] for r in ev.select("split").distinct().collect()
    ) <= {"val", "test"}
    # eval + train cover the corpus exactly once
    assert ev.count() + written.select("doc_id").distinct().count() == 40


def test_assemble_dataset_holdout_decontaminates_train(spark):
    """holdout= (r15): a train doc verbatim-matching an EXTERNAL
    benchmark (and a near-dup of one) is dropped by the
    decontaminate stage; the funnel names the stage between
    train_split and mix; holdout=None keeps the exact previous
    chain."""
    df = _assembly_docs(spark)
    # benchmark: doc 60's text verbatim + a near-dup of doc 61
    near = " ".join(f"c1w{j}" for j in range(25)) + " extra"
    bench = spark.createDataFrame(
        [
            (9001, " ".join(f"c0w{j}" for j in range(25))),
            (9002, near),
        ],
        "doc_id long, text string",
    )

    m: list = []
    out = pipeline.assemble_dataset(
        df,
        fractions={"train": 1.0},
        weights={"a": 0.5, "b": 0.3, "c": 0.2},
        holdout=bench,
        holdout_threshold=0.5,
        metrics=m,
    )
    stages = [r["stage"] for r in m]
    assert stages == ["train_split", "decontaminate", "mix"]
    dec = next(r for r in m if r["stage"] == "decontaminate")
    assert dec["n_dropped"] >= 2  # the verbatim hit and the near-dup
    ids = {r["doc_id"] for r in out.collect()}
    assert 60 not in ids and 61 not in ids
    assert 30 in ids  # untouched source-b doc survives

    # holdout=None: stage absent, output unchanged vs pre-r15 chain
    m2: list = []
    base = pipeline.assemble_dataset(
        df,
        fractions={"train": 1.0},
        weights={"a": 0.5, "b": 0.3, "c": 0.2},
        metrics=m2,
    )
    assert [r["stage"] for r in m2] == ["train_split", "mix"]
    assert 60 in {r["doc_id"] for r in base.collect()}


def test_assemble_dataset_writes_manifest_data_card(spark, tmp_path):
    """out_dir= now also publishes _manifest.json (r15): recipe
    params, the read-back-verified shard report (ok=True on a fresh
    write), the per-source mix card matching a recount of the written
    train files, eval split sizes, and the collected funnel."""
    import json

    df = _assembly_docs(spark)
    out_dir = str(tmp_path / "ds")
    m: list = []
    pipeline.assemble_dataset(
        df,
        out_dir=out_dir,
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        weights={"a": 0.5, "b": 0.3, "c": 0.2},
        shard_rows=10,
        metrics=m,
    )
    with open(f"{out_dir}/_manifest.json") as fh:
        man = json.load(fh)

    assert man["params"]["weights"] == {"a": 0.5, "b": 0.3, "c": 0.2}
    assert man["params"]["shard_rows"] == 10
    assert not man["params"]["leakage_safe"]
    assert not man["params"]["decontaminated"]

    rep = man["train"]
    assert rep["ok"] and rep["ordered_within_files"]
    written = spark.read.parquet(f"{out_dir}/train")
    assert rep["n_rows"] == written.count()

    recount = {
        r["source"]: (r["n"], r["d"])
        for r in written.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("d"),
        )
        .collect()
    }
    assert {
        c["source"]: (c["n_rows"], c["n_docs"]) for c in man["sources"]
    } == recount
    # card has tokens (tokens_col present in the assembled frame)
    assert all("token_share" in c for c in man["sources"])

    ev = spark.read.parquet(f"{out_dir}/eval")
    assert man["eval"] == {
        r["split"]: r["n"]
        for r in ev.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert [s["stage"] for s in man["funnel"]] == ["train_split", "mix"]


def test_curate_documents_c4_and_repetition_stages(spark):
    """r15 opt-in stages: c4_rules cleans pages FIRST (later stages
    see the cleaned text) and drops paper-rejected pages; repetition
    drops Table A1 failures after gopher; both off keeps the previous
    chain byte-identical."""
    good_page = "\n".join(
        f"word{i} thing{i} item{i} extra{i} more{i} token{i} other{i} "
        f"final{i} piece{i} unit{i} part{i} bit{i} seg{i} frag{i} el{i} "
        f"is sentence {i} ok." for i in range(8)
    )
    rep_page = "\n".join(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa ok."
        for _ in range(8)
    )
    rows = [
        (0, good_page),
        (1, good_page + "\nlorem ipsum dolor sit amet."),  # page rejected
        (2, rep_page),                                      # repetition fail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    m: list = []
    out = pipeline.curate_documents(
        df,
        c4_rules=True,
        repetition_rules=True,
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=m,
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert [x["stage"] for x in m] == ["c4_rules", "repetition", "exact_dedup"]
    assert 1 not in ids  # lorem page rejected by C4
    assert 2 not in ids  # repeated-line page rejected by the battery
    assert 0 in ids

    # default chain untouched when both flags stay off
    m2: list = []
    base = pipeline.curate_documents(
        df,
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=m2,
    )
    assert [x["stage"] for x in m2] == ["exact_dedup"]
    assert {r["doc_id"] for r in base.collect()} == {0, 1, 2}


def test_curate_url_stage_runs_first(spark):
    # three docs: two are the same page (one with tracking params), one
    # on a blocked domain; unique texts so text dedup can't explain
    # the drops
    df = spark.createDataFrame(
        [
            (0, "first page words here", "https://Good.org/a?utm_s=x"),
            (1, "second page other words", "https://good.org/a"),
            (2, "third page more words", "http://spam.example.com/b"),
            (3, "fourth page words again", "https://good.org/c"),
        ],
        "doc_id long, text string, url string",
    )
    m: list = []
    out = pipeline.curate_documents(
        df,
        url_col="url",
        domain_blocklist=("example.com",),
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=m,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert [x["stage"] for x in m] == [
        "domain_filter", "url_dedup", "exact_dedup",
    ]
    assert set(rows) == {0, 3}  # 1 = same canonical URL, 2 = blocked
    # url_col was REPLACED with its canonical form
    assert rows[0]["url"] == "https://good.org/a"


def test_curate_url_pct_normalize_merges_encoded_variants(spark):
    """url_pct_normalize=True (r18): '%7Euser' and '~user' URLs are
    one page — the percent pass runs BEFORE canonicalization and the
    stored url reflects both normalizations. Off by default: without
    it the two URLs survive as distinct pages."""
    df = spark.createDataFrame(
        [
            (0, "first page words here", "https://Ex.org/%7Euser"),
            (1, "second page other words", "https://ex.org/~user"),
        ],
        "doc_id long, text string, url string",
    )
    out = pipeline.curate_documents(
        df,
        url_col="url",
        url_pct_normalize=True,
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0}
    assert rows[0]["url"] == "https://ex.org/~user"
    base = pipeline.curate_documents(
        df,
        url_col="url",
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
    )
    assert {r["doc_id"] for r in base.collect()} == {0, 1}


def test_assemble_dataset_dsir_selection_stage(spark, tmp_path):
    """The DSIR selection stage (VERDICT r15 #6): with a
    target_exemplar, assemble_dataset runs dsir_select_to_budget
    between split and mix — the funnel gains a dsir_select stage, the
    kept train rows carry llr_micro_sum/dsir_grade provenance, the
    selection prefers target-like docs, and the manifest records the
    dsir params block."""
    import json

    import pytest

    df = _assembly_docs(spark)
    # exemplar that looks like source b's vocabulary
    target = spark.createDataFrame(
        [(1000 + i, " ".join(f"b{i % 10}w{j}" for j in range(30)))
         for i in range(6)],
        "doc_id long, text string",
    )
    m: list = []
    out_dir = str(tmp_path / "ds")
    out = pipeline.assemble_dataset(
        df,
        out_dir=out_dir,
        fractions={"train": 1.0},
        target_exemplar=target,
        dsir_budget_tokens=400,
        metrics=m,
    )
    rows = out.collect()
    stages = [r["stage"] for r in m]
    assert stages == ["train_split", "dsir_select", "mix"]
    sel = next(r for r in m if r["stage"] == "dsir_select")
    assert 0 < sel["n_out"] < sel["n_in"]
    # provenance columns survive to the assembled output
    assert {"llr_micro_sum", "dsir_grade"} <= set(out.columns)
    # the b-exemplar prefers source-b docs: every b doc scores higher
    # than every a/c doc, so the budget fills with b first
    kept_sources = {r["source"] for r in rows}
    assert "b" in kept_sources
    manifest = json.loads(
        (tmp_path / "ds" / "_manifest.json").read_text()
    )
    assert manifest["params"]["dsir"] == {
        "budget_tokens": 400,
        "n_buckets": 10_000,
        "grades": 1000,
        "salt": "dsir-v1",
    }
    assert manifest["funnel"][1]["stage"] == "dsir_select"

    # target_exemplar without a budget is a loud error
    with pytest.raises(ValueError, match="dsir_budget_tokens"):
        pipeline.assemble_dataset(df, target_exemplar=target)


def test_curate_documents_lang_gate(spark):
    """r17: lang_allow keeps only confidently-detected languages —
    the C4 §2.2 gate; ambiguous/short docs are 'und' and drop."""
    from cybersecurity_miw_spark import pipeline

    rows = [
        (1, "The weather was cold this morning and the children stayed at home with their mother near the river."),
        (2, "Das Wetter war heute Morgen kalt und die Kinder blieben mit ihrer Mutter zu Hause, weil es geschneit hat."),
        (3, "12345 67890 ++--"),  # letter-less -> und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    metrics = []
    out = pipeline.curate_documents(
        df,
        lang_allow=("en",),
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=metrics,
    )
    got = [r["doc_id"] for r in out.collect()]
    assert got == [1]
    stages = [m["stage"] for m in metrics]
    assert "lang_gate" in stages
    gate = next(m for m in metrics if m["stage"] == "lang_gate")
    assert gate["n_in"] == 3 and gate["n_out"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lang_allow is empty"):
        pipeline.curate_documents(df, lang_allow=())


def test_curate_documents_full_crawl_chain(spark):
    """r17 capstone: the complete crawl→dataset story through ONE
    curate_documents call — URL canonicalize+dedup → HTML→text
    extraction (boilerplate line filter) → language gate → exact
    dedup — with the funnel naming every stage in the published
    order."""
    from cybersecurity_miw_spark import pipeline

    body_en = ("The weather was cold this morning and the children "
               "stayed at home with their mother near the river bank.")
    body_de = ("Das Wetter war heute Morgen kalt und die Kinder blieben "
               "mit ihrer Mutter zu Hause, weil es stark geschneit hat.")

    def page(body):
        return (
            '<html><head><script>var x=1;</script></head><body>'
            '<div><a href="/">Home page</a> <a href="/a">About page</a> '
            '<a href="/c">Contact page</a></div>'
            f"<p>{body}</p>"
            "</body></html>"
        )

    rows = [
        # 1+2: same page fetched twice (tracking param) -> URL dedup
        (1, "https://Site.com/a?fbclid=x", page(body_en)),
        (2, "https://site.com/a", page(body_en)),
        # 3: German page -> language gate drops it
        (3, "https://site.com/de", page(body_de)),
        # 4: distinct URL, same EXTRACTED text as 1 -> exact dedup
        (4, "https://site.com/b", page(body_en)),
        # 5: nav-only page -> extracts to '' -> und -> language gate
        (5, "https://site.com/nav",
         '<html><body><div><a href="/">Home</a></div></body></html>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    metrics = []
    out = pipeline.curate_documents(
        df.withColumn("text", F.lit(None).cast("string")),
        url_col="url",
        html_col="html",
        lang_allow=("en",),
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=metrics,
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # 2 dropped by URL dedup (min-id 1 survives), 3 by the language
    # gate, 5 extracts empty -> und, 4 by exact dedup vs 1
    assert got == [1]
    stages = [m["stage"] for m in metrics]
    assert stages == ["url_dedup", "html_extract", "lang_gate", "exact_dedup"]
    drops = {m["stage"]: m["n_dropped"] for m in metrics}
    assert drops == {"url_dedup": 1, "html_extract": 0,
                     "lang_gate": 2, "exact_dedup": 1}
    row = out.collect()[0]
    # extraction stripped the nav + script; text is the article body
    assert row["text"] == body_en
    assert row["lang_guess"] == "en"
