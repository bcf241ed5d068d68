"""Goldens for the shipped-vocab exact tokenizer
(operators/tokenizer.py + data/bpe_merges.tsv / bpe_vocab.tsv):
model loading guards, the rank-greedy word loop, equivalence with
operators/bpe.py's sequential-pass application on TRAINED merge
lists (the documented equivalence), count/sequence plumbing, and
the budget-operator integration (n_tokens_exact as tokens_col)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import bpe
from cybersecurity_miw_spark.operators import tokenizer as tok


def test_frozen_model_loads_and_is_wellformed():
    merges, vocab = tok.load_bpe_model()
    assert len(merges) >= 100
    assert vocab[tok.UNK_TOKEN] == tok.UNK_ID
    # ids are dense from 0
    assert sorted(vocab.values()) == list(range(len(vocab)))
    # every merge product is in the vocab (how ids were built)
    for x, y in merges:
        assert (x + y) in vocab
    # creation-order invariant: a merge's inputs, when themselves
    # multi-char, were produced by an EARLIER merge — the property
    # that makes rank-greedy equal sequential-pass application
    produced = set()
    for x, y in merges:
        for part in (x, y):
            if len(part) > 1:
                assert part in produced, (x, y, part)
        produced.add(x + y)


def test_load_guards(tmp_path):
    m = tmp_path / "m.tsv"
    v = tmp_path / "v.tsv"
    m.write_text("0\ta\tb\n2\tc\td\n")
    v.write_text("0\t<unk>\n")
    with pytest.raises(ValueError, match="out of order"):
        tok.load_bpe_model(str(m), str(v))
    m.write_text("0\ta\tb\nbad line\n")
    with pytest.raises(ValueError, match="rank"):
        tok.load_bpe_model(str(m), str(v))
    m.write_text("0\ta\tb\n")
    v.write_text("5\tx\n")
    with pytest.raises(ValueError, match="<unk>"):
        tok.load_bpe_model(str(m), str(v))


def test_greedy_bpe_word_hand_cases():
    ranks = {("e", "r"): 0, ("t", "h"): 1, ("th", "e"): 2}
    assert tok.greedy_bpe_word("there", ranks) == ["th", "er", "e"]
    assert tok.greedy_bpe_word("the", ranks) == ["the"]
    assert tok.greedy_bpe_word("other", ranks) == ["o", "th", "er"]
    assert tok.greedy_bpe_word("xyz", ranks) == ["x", "y", "z"]
    assert tok.greedy_bpe_word("a", ranks) == ["a"]
    # leftmost wins on equal rank; repeats re-evaluate
    assert tok.greedy_bpe_word("aaaa", {("a", "a"): 0}) == ["aa", "aa"]
    assert tok.greedy_bpe_word("aaa", {("a", "a"): 0}) == ["aa", "a"]


def test_equivalence_with_sequential_pass_application(spark):
    """On a TRAINED merge list, rank-greedy segmentation must equal
    bpe.tokenize's sequential regexp passes — per word, over a
    corpus with repeats, doubled letters and the trained subwords."""
    corpus = spark.createDataFrame(
        [
            (1, "the weather was cold this morning"),
            (2, "children stayed at home with their mother"),
            (3, "the the thee theee aaa lll"),
            (4, "querytable tablequery streamstream"),
        ],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(corpus, n_merges=40, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    seq = {
        r["doc_id"]: r["tokens"]
        for r in bpe.tokenize(corpus, merges).collect()
    }
    for r in corpus.collect():
        greedy = [
            t
            for w in r["text"].lower().split()
            for t in tok.greedy_bpe_word(w, ranks)
        ]
        assert greedy == seq[r["doc_id"]], r["doc_id"]


def _sequential_pass(word: str, merges) -> list[str]:
    """Pure-Python reference model of bpe.apply_merges' semantics:
    one leftmost non-overlapping merge PASS per merge, in rank
    order — exactly what the lookbehind regexp does, without the
    Spark expression tree (300 nested regexps overflow the JVM
    expression-conversion stack, which is the very limitation
    operators/tokenizer.py exists to remove)."""
    toks = list(word)
    for x, y in merges:
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_sequential_reference_model_matches_bpe_tokenize(spark):
    """The reference model above IS bpe.tokenize, word for word, on
    a trained tiny merge list — anchoring the frozen-vocab test."""
    corpus = spark.createDataFrame(
        [(1, "the weather was cold"), (2, "the thee aaa lll cold")],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(corpus, n_merges=25, min_pair_count=2)
    seq = {
        r["doc_id"]: r["tokens"]
        for r in bpe.tokenize(corpus, merges).collect()
    }
    for r in corpus.collect():
        ref = [
            t
            for w in r["text"].lower().split()
            for t in _sequential_pass(w, merges)
        ]
        assert ref == seq[r["doc_id"]]


def test_equivalence_on_frozen_vocab(spark):
    """Under the SHIPPED 300-merge model: the Arrow-pass
    segmentation (tokenize_ids_exact, ids mapped back to strings)
    matches the sequential-pass reference model — greedy ≡
    sequential on a creation-ordered merge list, at full frozen
    scale."""
    merges, vocab = tok.load_bpe_model()
    inv = {i: t for t, i in vocab.items()}
    texts = [
        (1, "The weather was cold and the children stayed home"),
        (2, "query table scan join window aggregate"),
        (3, ""),
        (4, "thee theee motherhood stationery aaaa"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: [inv[i] for i in r["token_ids"]]
        for r in tok.tokenize_ids_exact(docs, merges, vocab).collect()
    }
    for doc_id, text in texts:
        ref = [
            t
            for w in text.lower().split()
            for t in _sequential_pass(w, merges)
        ]
        assert got[doc_id] == ref, doc_id


def test_token_counts_exact(spark):
    merges, vocab = tok.load_bpe_model()
    docs = spark.createDataFrame(
        [
            (1, "the the the"),
            (2, None),
            (3, "   "),
            (4, "zzzzqqqq"),  # unseen word still counts segments
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in tok.token_counts_exact(docs, merges, vocab).collect()
    }
    n_the = len(tok.greedy_bpe_word("the", {p: i for i, p in enumerate(merges)}))
    assert out[1] == 3 * n_the
    assert out[2] == 0 and out[3] == 0
    assert out[4] >= 1
    # payload columns survive; count column appended
    cols = tok.token_counts_exact(
        docs.withColumn("src", F.lit("s")), merges, vocab
    ).columns
    assert cols == ["doc_id", "text", "src", "n_tokens_exact"]


def test_tokenize_ids_unk_and_order(spark):
    merges = [("a", "b")]
    vocab = {tok.UNK_TOKEN: 0, "a": 1, "b": 2, "ab": 3, "c": 4}
    docs = spark.createDataFrame(
        [(1, "ab c ab"), (2, "xq"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["token_ids"]
        for r in tok.tokenize_ids_exact(docs, merges, vocab).collect()
    }
    # word order preserved across the re-assembly
    assert got[1] == [3, 4, 3]
    # unseen chars -> UNK id, one per segment
    assert got[2] == [0, 0]
    assert got[3] == []


def test_counts_deterministic_under_repartition(spark):
    merges, vocab = tok.load_bpe_model()
    rows = [(i, f"the weather table query value row {i % 7}") for i in range(40)]
    d1 = spark.createDataFrame(rows, "doc_id long, text string")
    d2 = spark.createDataFrame(rows, "doc_id long, text string").repartition(9)
    r1 = sorted(map(tuple, tok.token_counts_exact(d1, merges, vocab).collect()))
    r2 = sorted(map(tuple, tok.token_counts_exact(d2, merges, vocab).collect()))
    assert r1 == r2


def test_budget_ops_bind_to_exact_counts(spark):
    """The integration the whole module exists for: budget_select
    and pack_sequences consume n_tokens_exact as their tokens/weight
    column — budgets become real token budgets."""
    from cybersecurity_miw_spark.operators import packing, sampling

    merges, vocab = tok.load_bpe_model()
    docs = spark.createDataFrame(
        [
            (i, "the weather was cold " * (i + 1), 1000 - i)
            for i in range(6)
        ],
        "doc_id long, text string, score_pm long",
    )
    scored = tok.token_counts_exact(docs, merges, vocab)
    counts = {
        r["doc_id"]: r["n_tokens_exact"] for r in scored.collect()
    }
    budget = counts[0] + counts[1]  # exactly the two best docs
    kept = {
        r["doc_id"]
        for r in sampling.budget_select(
            scored, budget, tokens_col="n_tokens_exact"
        ).collect()
    }
    assert kept == {0, 1}
    packed = packing.pack_sequences(
        scored, budget=max(counts.values()), weight_col="n_tokens_exact"
    )
    assert {"packer", "bin_id", "overflow"} <= set(packed.columns)
    assert packed.count() == 6
