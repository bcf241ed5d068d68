"""Growth-stability goldens for the assembly chain (VERDICT r15 #3):
what a corpus-grow re-run of the SAME recipe keeps, what it moves,
and which parameters break stability. The invariants pinned here are
the documented contract in docs/ASSEMBLY.md — each test names the
section it pins.

The machinery under test is entirely md5-deterministic, so stability
is a THEOREM of the key structure, not an accident: split labels are
pure hashes of the id (or cluster rep), and mix ranks are md5-order
positions that only ever shift DOWN the stream when new rows insert
ahead of them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark import pipeline
from cybersecurity_miw_spark.operators import dedup, sampling


def _docs(spark, n, sources=("a", "b")):
    rows = [
        (i, sources[i % len(sources)],
         " ".join(f"s{i % len(sources)}w{i}t{j}" for j in range(12)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return df.withColumn("n_tokens", F.size(F.split("text", r"\s+")))


# ---- ASSEMBLY.md "split labels are forever" ----

def test_split_labels_stable_under_growth(spark):
    base = _docs(spark, 60)
    grown = _docs(spark, 100)
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    before = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(base, frac).collect()
    }
    after = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(grown, frac).collect()
    }
    assert all(after[d] == s for d, s in before.items())


def test_leakage_safe_labels_stable_when_growth_has_larger_ids(spark):
    """leakage_safe_split hashes the cluster MIN id; docs arriving
    later with LARGER ids (the append-only ingest shape) can join a
    cluster without changing its representative, so old labels hold
    — and the new member inherits the cluster's existing split."""
    base = " ".join(f"tok{i}" for i in range(30))
    old = spark.createDataFrame(
        [(1, base), (2, base + " tail"),
         *[(10 + i, f"unique doc {i} " * 8) for i in range(20)]],
        "doc_id long, text string",
    )
    new = old.union(
        spark.createDataFrame(
            [(100, base + " tail2"),  # joins cluster {1, 2}
             *[(110 + i, f"fresh doc {i} " * 8) for i in range(10)]],
            "doc_id long, text string",
        )
    )
    frac = {"train": 0.5, "val": 0.5}

    def _split(df):
        cand = dedup.minhash_lsh_candidates(df, shingle_k=3)
        conf = dedup.jaccard_pairs(df, cand, shingle_k=3).filter(
            F.col("jaccard") >= 0.5
        )
        clusters = dedup.dup_clusters(conf)
        return {
            r["doc_id"]: r["split"]
            for r in sampling.leakage_safe_split(
                df, clusters, frac
            ).collect()
        }

    before, after = _split(old), _split(new)
    assert all(after[d] == s for d, s in before.items())
    # the late near-dup inherits the cluster's split
    assert after[100] == after[1] == after[2]


# ---- ASSEMBLY.md "mix order is append-stable, mix keys are not" ----

def test_weighted_interleave_order_stable_within_source(spark):
    """With EXPLICIT weights, growing the corpus preserves the
    relative order of the surviving old docs WITHIN each source: a
    doc's rank only changes when a new doc's md5 key sorts ahead of
    it, and insertions never swap two old docs of one source.
    CROSS-source order near key ties can swap (each source's ranks
    slide independently) and mix_key VALUES shift — the documented
    local, bounded churn."""
    w = {"a": 0.6, "b": 0.4}
    base = _docs(spark, 50)
    grown = _docs(spark, 80)
    old_order = {
        s: [
            r["doc_id"]
            for r in sampling.weighted_interleave(base, "source", w)
            .filter(F.col("source") == s)
            .orderBy("mix_key", "doc_id")
            .collect()
        ]
        for s in ("a", "b")
    }
    new_rows = (
        sampling.weighted_interleave(grown, "source", w)
        .orderBy("mix_key", "source", "doc_id")
        .collect()
    )
    for s in ("a", "b"):
        got = [
            r["doc_id"]
            for r in new_rows
            if r["doc_id"] < 50 and r["source"] == s
        ]
        assert got == old_order[s]

    # rank shift bound: an old doc's rank grows by at most the number
    # of new docs in its source
    per_source_new = {
        s: sum(1 for i in range(50, 80) if ["a", "b"][i % 2] == s)
        for s in ("a", "b")
    }
    old_keys = {
        r["doc_id"]: r["mix_key"]
        for r in sampling.weighted_interleave(base, "source", w).collect()
    }
    for r in new_rows:
        if r["doc_id"] < 50:
            shift = (r["mix_key"] - old_keys[r["doc_id"]]) * w[r["source"]]
            assert -1e-9 <= shift <= per_source_new[r["source"]] + 1e-9


def test_temperature_interleave_not_growth_stable(spark):
    """Temperature mixing derives weights from source COUNTS, so
    growth re-weights every source and every mix_key moves — the
    documented parameter that breaks stability. (Guard test: if this
    ever starts passing stably, the docs contract is stale.)"""
    base = _docs(spark, 40)
    # grow source 'a' only: derived weights must change
    extra = spark.createDataFrame(
        [(100 + i, "a", f"extra doc {i} " * 6) for i in range(30)],
        "doc_id long, source string, text string",
    ).withColumn("n_tokens", F.size(F.split("text", r"\s+")))
    grown = base.unionByName(extra)
    wb = sampling.temperature_weights(base, "source", 2.0)
    wg = sampling.temperature_weights(grown, "source", 2.0)
    assert wb != wg


# ---- ASSEMBLY.md "the end-to-end re-run contract" ----

def test_assemble_rerun_contract_under_growth(spark):
    """assemble_dataset with the stability-safe recipe (explicit
    weights, no budget): a grown-corpus re-run (1) keeps every old
    doc's split label, (2) keeps the old docs' relative train order
    within each source, and (3) old docs' shard_id moves by at most
    the rank slide / shard_rows — churn is local to insertion
    points, never a global reshuffle."""
    kwargs = dict(
        fractions={"train": 0.9, "val": 0.1},
        weights={"a": 0.5, "b": 0.5},
        shard_rows=7,
    )
    base = _docs(spark, 60)
    grown = _docs(spark, 90)
    old = pipeline.assemble_dataset(base, **kwargs)
    new = pipeline.assemble_dataset(grown, **kwargs)
    old_rows = old.orderBy("mix_key", "doc_id").collect()
    new_rows = new.orderBy("mix_key", "doc_id").collect()
    for s in ("a", "b"):
        assert [
            r["doc_id"] for r in new_rows
            if r["doc_id"] < 60 and r["source"] == s
        ] == [r["doc_id"] for r in old_rows if r["source"] == s]
    # every old train doc is still train (split stability end-to-end)
    assert {r["doc_id"] for r in old_rows} <= {
        r["doc_id"] for r in new_rows
    }
    # shard churn is bounded: |new_shard - old_shard| <= ceil(rank
    # slide / shard_rows); with <= 15 new docs per source and
    # shard_rows=7 that is <= ceil(15 / (7 * 0.5)) ... conservatively
    # assert the shard id never moves backwards and never jumps more
    # than the whole insertion volume
    old_shard = {r["doc_id"]: r["shard_id"] for r in old_rows}
    for r in new_rows:
        if r["doc_id"] in old_shard:
            delta = r["shard_id"] - old_shard[r["doc_id"]]
            assert 0 <= delta <= 30 // 7 + 1


# ---- ASSEMBLY.md "skipping re-work on history" -> r17 incremental ----

def _file_state(root):
    """{relpath: (mtime_ns, size, bytes)} for every parquet data file."""
    import os

    state = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                with open(p, "rb") as fh:
                    state[os.path.relpath(p, root)] = (
                        st.st_mtime_ns, st.st_size, fh.read()
                    )
    return state


def test_incremental_rerun_rewrites_only_churned_shards(spark, tmp_path):
    """The r17 incremental mode consumes the growth contract: a
    grown-corpus re-run leaves untouched shard files BYTE-IDENTICAL
    (same mtime — never reopened) and the manifest names exactly the
    rewritten shards.

    Growth is planted at the TAIL of each source's md5 mix order
    (new ids chosen so their rank hash sorts after every base id's)
    — the contract's bounded-churn case: old ranks cannot slide, so
    only the shards receiving the appended rows rewrite. Uniform
    random growth instead slides every rank after the FIRST
    insertion point (forward-only churn — the head stays, the tail
    rewrites), which the contract also predicts but which leaves
    nothing unchanged at this tiny fixture size."""
    import hashlib
    import json

    out_dir = str(tmp_path / "ds")
    kwargs = dict(
        fractions={"train": 0.9, "val": 0.1},
        weights={"a": 0.5, "b": 0.5},
        shard_rows=7,
        incremental=True,
        out_dir=out_dir,
    )
    pipeline.assemble_dataset(_docs(spark, 60), **kwargs)
    man1 = json.loads(open(f"{out_dir}/_manifest.json").read())
    assert man1["train"]["ok"] and man1["params"]["incremental"]
    assert man1["churn"]["n_rewritten"] == man1["churn"]["n_shards"]
    state1 = _file_state(f"{out_dir}/train")
    assert state1, "first run must write shard files"

    def _rank(i):
        return hashlib.md5(f"mix-v1:{i}".encode()).hexdigest()

    max_rank = {
        s: max(_rank(i) for i in range(60) if i % 2 == k)
        for k, s in enumerate(("a", "b"))
    }
    tail_ids = []
    i = 60
    while len(tail_ids) < 4:
        s = ("a", "b")[i % 2]
        if _rank(i) > max_rank[s]:
            tail_ids.append(i)
        i += 1
    rows = [
        (i, ("a", "b")[i % 2],
         " ".join(f"s{i % 2}w{i}t{j}" for j in range(12)))
        for i in list(range(60)) + tail_ids
    ]
    grown = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).withColumn("n_tokens", F.size(F.split("text", r"\s+")))

    pipeline.assemble_dataset(grown, **kwargs)
    man2 = json.loads(open(f"{out_dir}/_manifest.json").read())
    state2 = _file_state(f"{out_dir}/train")
    churn = man2["churn"]
    assert churn["n_unchanged"] > 0, "growth must leave some shards alone"
    assert churn["n_rewritten"] > 0, "growth must churn the tail"
    rewritten = {f"shard_id={s}" for s in churn["rewritten"]}
    for rel, (mtime, size, blob) in state1.items():
        shard_dir = rel.split("/")[0]
        if shard_dir in rewritten:
            continue
        # untouched shard: same file, same mtime, same bytes
        assert rel in state2, rel
        assert state2[rel][0] == mtime, f"{rel} was reopened"
        assert state2[rel][2] == blob, f"{rel} content changed"
    # every shard the new assembly holds is accounted for
    assert churn["n_shards"] == churn["n_rewritten"] + churn["n_unchanged"]
    assert man2["train"]["ok"] and man2["train"]["ranges_disjoint"]
    # read-back equals the returned frame: nothing lost in the
    # partial rewrite
    back = spark.read.parquet(f"{out_dir}/train")
    new = pipeline.assemble_dataset(grown,
                                    fractions={"train": 0.9, "val": 0.1},
                                    weights={"a": 0.5, "b": 0.5},
                                    shard_rows=7)
    assert back.count() == new.count()
    assert sorted(
        (r["doc_id"], r["shard_id"]) for r in back.select("doc_id", "shard_id").collect()
    ) == sorted(
        (r["doc_id"], r["shard_id"]) for r in new.select("doc_id", "shard_id").collect()
    )


def test_incremental_identical_rerun_rewrites_nothing(spark, tmp_path):
    out_dir = str(tmp_path / "ds")
    kwargs = dict(
        fractions={"train": 0.9, "val": 0.1},
        weights={"a": 0.5, "b": 0.5},
        shard_rows=7,
        incremental=True,
        out_dir=out_dir,
    )
    pipeline.assemble_dataset(_docs(spark, 60), **kwargs)
    state1 = _file_state(f"{out_dir}/train")
    pipeline.assemble_dataset(_docs(spark, 60), **kwargs)
    import json

    man = json.loads(open(f"{out_dir}/_manifest.json").read())
    assert man["churn"]["n_rewritten"] == 0
    assert man["churn"]["removed"] == []
    assert _file_state(f"{out_dir}/train") == state1


def test_incremental_guards(spark, tmp_path):
    """The stability-breaking parameters and recipe drift raise
    loudly instead of silently rewriting the world."""
    docs = _docs(spark, 40)
    with pytest.raises(ValueError, match="weights must be explicit"):
        pipeline.assemble_dataset(docs, incremental=True)
    with pytest.raises(ValueError, match="budget_tokens must be None"):
        pipeline.assemble_dataset(
            docs, incremental=True, weights={"a": 0.5, "b": 0.5},
            budget_tokens=100,
        )
    out_dir = str(tmp_path / "ds")
    pipeline.assemble_dataset(
        docs, out_dir=out_dir, incremental=True,
        weights={"a": 0.5, "b": 0.5}, shard_rows=7,
        fractions={"train": 0.9, "val": 0.1},
    )
    with pytest.raises(ValueError, match="DIFFERENT recipe"):
        pipeline.assemble_dataset(
            docs, out_dir=out_dir, incremental=True,
            weights={"a": 0.7, "b": 0.3}, shard_rows=7,
            fractions={"train": 0.9, "val": 0.1},
        )
