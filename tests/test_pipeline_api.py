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
