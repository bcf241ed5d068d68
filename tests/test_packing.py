"""Sequence-packing invariants (operators/packing.py): every doc in
exactly one bin, no bin over budget except flagged single-doc
overflow bins, the first-fit waste bound (at most one bin at most
half full per packer), and determinism."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import packing
from cybersecurity_miw_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 2000


@pytest.fixture(scope="module")
def packed(spark):
    docs = load_table(spark, SF, "documents", widen=False).select(
        "doc_id", "n_chars"
    )
    out = packing.pack_sequences(
        docs, BUDGET, weight_col="n_chars", n_packers=8
    ).collect()
    total = docs.count()
    return out, total


def test_every_doc_assigned_exactly_once(packed):
    rows, total = packed
    assert len(rows) == total
    assert len({r["doc_id"] for r in rows}) == total


def test_bins_within_budget_except_flagged_overflow(packed):
    rows, _ = packed
    fills = defaultdict(int)
    members = defaultdict(list)
    for r in rows:
        key = (r["packer"], r["bin_id"])
        fills[key] += r["n_chars"]
        members[key].append(r)
    for key, fill in fills.items():
        if fill > BUDGET:
            assert len(members[key]) == 1
            assert members[key][0]["overflow"] is True
            assert members[key][0]["n_chars"] > BUDGET
    for r in rows:
        assert r["overflow"] == (r["n_chars"] > BUDGET)


def test_first_fit_waste_bound(packed):
    """First-fit guarantee: per packer, at most ONE non-overflow bin
    ends at most half full — the bound that keeps total waste at
    n_packers * budget/2 regardless of corpus size."""
    rows, _ = packed
    fills = defaultdict(int)
    has_overflow = {}
    for r in rows:
        key = (r["packer"], r["bin_id"])
        fills[key] += r["n_chars"]
        has_overflow[key] = has_overflow.get(key, False) or r["overflow"]
    half_empty = defaultdict(int)
    for (packer, b), fill in fills.items():
        if not has_overflow[(packer, b)] and fill <= BUDGET / 2:
            half_empty[packer] += 1
    assert all(c <= 1 for c in half_empty.values()), dict(half_empty)


def test_packing_deterministic(spark, packed):
    rows, _ = packed
    docs = load_table(spark, SF, "documents", widen=False).select(
        "doc_id", "n_chars"
    )
    again = packing.pack_sequences(
        docs, BUDGET, weight_col="n_chars", n_packers=8
    ).collect()
    key = lambda r: (r["doc_id"], r["packer"], r["bin_id"], r["overflow"])
    assert sorted(map(key, rows)) == sorted(map(key, again))


def test_rejects_bad_budget(spark):
    docs = load_table(spark, SF, "documents", widen=False)
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, 0, weight_col="n_chars")


# ---- sliding-window chunking ----


def test_chunk_documents_nonoverlapping_covers_exactly(spark):
    from cybersecurity_miw_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, window=4, stride=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t4 t5 t6 t7"
    assert rows[2]["chunk_text"] == "t8 t9"  # partial tail kept
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 2]
    # concatenation reconstructs the doc exactly (stride == window)
    assert " ".join(r["chunk_text"] for r in rows) == " ".join(
        f"t{i}" for i in range(10)
    )


def test_chunk_documents_overlapping_stride(spark):
    from cybersecurity_miw_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, window=3, stride=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [(r["chunk_text"], r["n_chunk_tokens"]) for r in rows] == [
        ("a b c", 3),
        ("c d e", 3),
        ("e", 1),
    ]


def test_chunk_documents_short_doc_single_chunk(spark):
    from cybersecurity_miw_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    rows = chunk_documents(df, window=16, stride=8).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "only two"
    assert rows[0]["n_chunk_tokens"] == 2


def test_chunk_documents_rejects_bad_params(spark):
    from cybersecurity_miw_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, window=0)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=0)


def test_chunk_by_sentences_contract(spark):
    """Sentence-boundary chunking (r16): sentences never split,
    order preserved, quantized-prefix budget semantics, oversized
    sentences become their own chunk, surface form preserved."""
    from cybersecurity_miw_spark.operators import packing

    df = spark.createDataFrame(
        [
            (1, "One two three. Four five six! Seven eight? "
                "Nine ten eleven twelve."),
            (2, "No punctuation at all just words"),
            (3, "Tiny. " + "w " * 20 + "end. Tail one."),
            (4, ""),
            (5, None),
            (6, "UPPER Case. KEPT as-is!"),
        ],
        "doc_id long, text string",
    )
    out = packing.chunk_by_sentences(df, budget_tokens=5)
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 1: two chunks of two sentences (6 tokens each; prefix
    # quantization at budget 5)
    assert [r["chunk_text"] for r in by_doc[1]] == [
        "One two three. Four five six!",
        "Seven eight? Nine ten eleven twelve.",
    ]
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [6, 6]
    assert [r["n_sentences"] for r in by_doc[1]] == [2, 2]
    # no punctuation: one chunk, one sentence
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_sentences"] == 1
    # quantized-prefix semantics: the oversized sentence's exclusive
    # prefix (1 token) is under the budget, so it joins chunk 0; the
    # tail's prefix (22) then lands in chunk floor(22/5)=4 — chunk
    # ids may have gaps after an oversized sentence, by contract
    texts3 = [r["chunk_text"] for r in by_doc[3]]
    assert len(texts3) == 2
    assert texts3[0].startswith("Tiny. w w") and texts3[0].endswith("end.")
    assert by_doc[3][0]["n_chunk_tokens"] == 22
    assert texts3[1] == "Tail one."
    assert by_doc[3][1]["chunk_id"] == 4
    # empty / null docs emit nothing
    assert 4 not in by_doc and 5 not in by_doc
    # surface form preserved (no lowercasing)
    assert by_doc[6][0]["chunk_text"] == "UPPER Case. KEPT as-is!"
    # reconstruction: chunks concatenated == sentence-split doc
    recon = " ".join(r["chunk_text"] for r in by_doc[1])
    assert recon == ("One two three. Four five six! Seven eight? "
                     "Nine ten eleven twelve.")
    with pytest.raises(ValueError, match="budget_tokens"):
        packing.chunk_by_sentences(df, budget_tokens=0)
