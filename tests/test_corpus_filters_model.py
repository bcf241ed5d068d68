"""Model-based batch tests for corpus filters: hundreds of
adversarial inputs run through Spark in ONE job and compared to an
obviously-correct Python twin — the cheap property-test shape (a
seeded generator beats hypothesis here because each Spark round-trip
costs seconds)."""

from __future__ import annotations

import random
import re

from cybersecurity_miw_spark.operators import corpus_filters


def _model_remove_repeated(text: str) -> tuple[str, int]:
    lines = text.split("\n")
    kept = list(dict.fromkeys(lines))  # first occurrence, order kept
    return "\n".join(kept), len(lines) - len(kept)


def test_remove_repeated_lines_matches_python_model(spark):
    rng = random.Random(42)
    alphabet = ["", "a", "b", "ab", "a b", " a", "aa", "\t", "x" * 30, "ü"]
    cases = []
    for i in range(300):
        n = rng.randint(1, 12)
        cases.append((i, "\n".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in corpus_filters.remove_repeated_lines(df).collect()
    }
    for doc_id, text in cases:
        assert got[doc_id] == _model_remove_repeated(text), (doc_id, text)


def _model_pii(text: str) -> tuple[str, int, int, int]:
    pats = corpus_filters.PII_PATTERNS
    counts = [len(re.findall(p, text)) for p, _ in pats.values()]
    red = text
    for p, repl in pats.values():
        red = re.sub(p, repl, red)
    return (red, *counts)


def test_pii_redact_matches_python_re_model(spark):
    rng = random.Random(7)
    frags = [
        "plain words here",
        "a@b.co",
        "first.last+tag@sub.domain.org",
        "not@an@email",
        "10.1.2.3",
        "999.999.999.999",  # still matches the syntactic ipv4 shape
        "1.2.3",  # too few octets
        "123456789",
        "12345678",  # one digit short
        "31415926535897932384",
        "v1.2.3.4beta",  # no word boundary before 'v'... but after digit
        "trailing dot. 8.8.8.8.",
        "(wrapped 1.1.1.1)",
        "",
    ]
    cases = []
    for i in range(300):
        n = rng.randint(1, 6)
        cases.append((i, " ".join(rng.choice(frags) for _ in range(n))))
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["redacted"], r["n_email"], r["n_ipv4"], r["n_longnum"]
        )
        for r in corpus_filters.pii_redact(df).collect()
    }
    for doc_id, text in cases:
        assert got[doc_id] == _model_pii(text), (doc_id, text)


def test_remove_repeated_lines_idempotent(spark):
    rng = random.Random(3)
    cases = [
        (i, "\n".join(rng.choice(["p", "q", "r s", ""]) for _ in range(8)))
        for i in range(50)
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    once = corpus_filters.remove_repeated_lines(df)
    twice = corpus_filters.remove_repeated_lines(
        once.select("doc_id", "clean_text"), text_col="clean_text"
    )
    j = once.select("doc_id", "clean_text").join(
        twice.select(
            "doc_id",
            twice["clean_text"].alias("clean2"),
            "n_removed",
        ),
        "doc_id",
    )
    rows = j.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["clean_text"] == r["clean2"]
        assert r["n_removed"] == 0
