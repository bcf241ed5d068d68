"""BPE training/application vs a pure-Python reference model of the
Sennrich algorithm (count desc, pair-lexicographic tie-break — the
same order the Spark implementation pins)."""

from __future__ import annotations

import random
from collections import Counter

from cybersecurity_miw_spark.operators import bpe


# ---- reference model ----


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_train(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        merges.append(best[0])
        vocab = {
            _merge_word(s, best[0]): n for s, n in vocab.items()
        }
    return merges


def _py_tokenize(text: str, merges) -> list[str]:
    toks = []
    for w in text.lower().strip().split():
        syms = tuple(w)
        for m in merges:
            syms = _merge_word(syms, m)
        toks.extend(syms)
    return toks


def _counts(texts):
    c: Counter = Counter()
    for t in texts:
        c.update(t.lower().strip().split())
    return dict(c)


# ---- tests ----


def test_bpe_learns_classic_merge_sequence(spark):
    texts = ["low low low lower lower newest newest newest newest widest"]
    df = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    got = bpe.train_bpe(df, n_merges=6)
    want = _py_train(_counts(texts), 6)
    assert got == want
    # 'w e' occurs in lower(2) + newest(4) + widest(1) = 7, the max
    assert got[0] == ("w", "e")


def test_bpe_matches_python_model_on_random_corpus(spark):
    rng = random.Random(13)
    alphabet = "abcdef"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 20))
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe.train_bpe(df, n_merges=15)
    want = _py_train(_counts(texts), 15)
    assert got == want


def test_bpe_tokenize_matches_model_and_reconstructs(spark):
    texts = ["the theme there other", "then the theory", "breathe the"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=8, min_pair_count=1)
    out = {
        r["doc_id"]: r["tokens"]
        for r in bpe.tokenize(df, merges).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == _py_tokenize(t, merges)
        assert "".join(out[i]) == t.replace(" ", "")  # lossless


def test_bpe_handles_regex_special_symbols(spark):
    # symbols that are regex metacharacters must merge correctly
    df = spark.createDataFrame(
        [(1, "a.b a.b a.b c$d c$d")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=4, min_pair_count=2)
    want = _py_train(_counts(["a.b a.b a.b c$d c$d"]), 4)
    assert merges == want
    toks = bpe.tokenize(df, merges).collect()[0]["tokens"]
    assert "".join(toks) == "a.ba.ba.bc$dc$d"


def test_bpe_min_count_stops_early(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    assert bpe.train_bpe(df, n_merges=10, min_pair_count=2) == []
