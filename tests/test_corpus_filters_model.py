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


def _model_boilerplate(docs: dict[int, str], max_df: int):
    from collections import defaultdict

    df_count: dict[str, set] = defaultdict(set)
    for i, text in docs.items():
        for line in text.split("\n"):
            df_count[line].add(i)
    drop = {l for l, s in df_count.items() if len(s) > max_df}
    out = {}
    for i, text in docs.items():
        lines = text.split("\n")
        kept = [l for l in lines if l not in drop]
        out[i] = ("\n".join(kept), len(lines) - len(kept))
    return out


def test_boilerplate_removal_matches_python_model(spark):
    rng = random.Random(11)
    shared = ["banner", "footer", "nav", "ad"]
    docs = {}
    for i in range(200):
        n = rng.randint(1, 8)
        lines = [
            rng.choice(shared) if rng.random() < 0.5 else f"u{i}-{j}"
            for j in range(n)
        ]
        docs[i] = "\n".join(lines)
    sdf = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in corpus_filters.remove_boilerplate_lines(
            sdf, max_doc_freq=3
        ).collect()
    }
    assert got == _model_boilerplate(docs, 3)


def test_chunking_matches_python_model(spark):
    from cybersecurity_miw_spark.operators.packing import chunk_documents

    rng = random.Random(5)
    docs = {
        i: " ".join(f"t{rng.randint(0, 9)}" for _ in range(rng.randint(1, 40)))
        for i in range(100)
    }
    sdf = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(sdf, window=7, stride=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        )
    for i, text in docs.items():
        w = text.split(" ")
        want = []
        cid = 0
        for start in range(0, len(w), 3):
            seg = w[start:start + 7]
            want.append((cid, " ".join(seg), len(seg)))
            cid += 1
        assert sorted(got[i]) == want, i


def test_example_curation_chain_is_deterministic(spark):
    """The end-to-end curation chain (gopher rules → PII redaction →
    profile → exact dedup → cluster near-dedup) must produce an
    identical survivor set across runs — no RNG, no
    partitioning-order sensitivity anywhere in the chain."""
    import examples.training_data_pipeline as pipeline

    sf = "/root/testdata/sf0.001"
    a = sorted(
        r["doc_id"] for r in pipeline.curate(spark, sf).select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"] for r in pipeline.curate(spark, sf).select("doc_id").collect()
    )
    assert a == b and len(a) > 0
