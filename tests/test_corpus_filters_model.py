"""Model-based batch tests for corpus filters: hundreds of
adversarial inputs run through Spark in ONE job and compared to an
obviously-correct Python twin — the cheap property-test shape (a
seeded generator beats hypothesis here because each Spark round-trip
costs seconds)."""

from __future__ import annotations

import pytest
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


# ---- gopher_repetition_flags vs a pure-python Table A1 model ----


def _py_repetition(text):
    import re

    def dup_fracs(elems):
        n = len(elems)
        if not n:
            return 0.0, 0.0
        seen = set()
        rep_chars = 0
        for e in elems:
            if e in seen:
                rep_chars += len(e)
            seen.add(e)
        total_chars = sum(len(e) for e in elems)
        dup = (n - len(set(elems))) / n
        return dup, (rep_chars / total_chars if total_chars else 0.0)

    raw = text or ""
    lines = [e.strip() for e in raw.split("\n") if e.strip()]
    paras = [e.strip() for e in raw.split("\n\n") if e.strip()]
    lf, lcf = dup_fracs(lines)
    pf, pcf = dup_fracs(paras)

    w = [x for x in re.split(r"\s+", raw.lower().strip()) if x]
    tc = sum(len(x) for x in w) + max(len(w) - 1, 0)
    out = {
        "dup_line_frac": lf, "dup_line_char_frac": lcf,
        "dup_para_frac": pf, "dup_para_char_frac": pcf,
    }
    for n in (2, 3, 4):
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        best = 0.0
        if grams and tc:
            from collections import Counter

            c = Counter(grams)
            best = max(k * len(g) for g, k in c.items()) / tc
        out[f"top_{n}_gram_char_frac"] = best
    for n in range(5, 11):
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        from collections import Counter

        c = Counter(grams)
        covered = set()
        for i, g in enumerate(grams):
            if c[g] >= 2:
                covered.update(range(i, i + n))
        if covered and tc:
            # chars of covered words + separators INSIDE merged spans
            spans = []
            for j in sorted(covered):
                if spans and j == spans[-1][1]:
                    spans[-1][1] = j + 1
                else:
                    spans.append([j, j + 1])
            chars = sum(
                sum(len(w[k]) for k in range(s, e)) + (e - s - 1)
                for s, e in spans
            )
            out[f"dup_{n}_gram_char_frac"] = chars / tc
        else:
            out[f"dup_{n}_gram_char_frac"] = 0.0
    import math

    return {
        k: math.floor(v * 1e6 + 0.5) / 1e6 for k, v in out.items()
    }


def test_gopher_repetition_flags_match_python_model(spark):
    """The full Table A1 battery equals the pure-python model on
    planted shapes: clean prose, overlapping-gram degeneracy (frac
    > 1, drop-hard), block repetition covering every dup-n, dup
    lines/paragraphs, short and empty docs."""
    from cybersecurity_miw_spark.operators import corpus_filters as cf

    texts = [
        "one two three four five six seven eight nine ten eleven twelve",
        "spam spam spam spam spam spam",
        "a b c d e f g h a b c d e f g h a b c d e f g h",
        "line1\nline2\nline1\nline3",
        "para one text\n\npara two text\n\npara one text",
        "",
        "tiny",
        "the cat sat on the mat while the dog sat on the rug "
        "and the cat sat on the mat again for good measure",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in cf.gopher_repetition_flags(df).collect()
    }
    for i, t in enumerate(texts):
        want = _py_repetition(t)
        mine = got[i]
        for k, v in want.items():
            assert mine[k] == pytest.approx(v, abs=1e-9), (i, k, mine[k], v)


def test_gopher_repetition_keep_thresholds(spark):
    """keep applies the paper's default thresholds to the ROUNDED
    metrics; clean long prose passes, each planted pathology fails."""
    from cybersecurity_miw_spark.operators import corpus_filters as cf

    clean = " ".join(f"w{i}x{i * 7 % 13}" for i in range(60))
    df = spark.createDataFrame(
        [
            (0, clean),
            (1, clean + " " + clean),          # whole-doc repetition
            (2, "ln\n" * 10 + clean),          # dup lines
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in cf.gopher_repetition_flags(df).collect()}
    assert got[0]["keep"]
    assert not got[1]["keep"] and got[1]["dup_10_gram_char_frac"] > 0.5
    assert not got[2]["keep"] and got[2]["dup_line_frac"] > 0.30

    with pytest.raises(ValueError, match="n = 2, 3, 4"):
        cf.gopher_repetition_flags(df, max_top_ngram_char_frac=(0.2,))
    with pytest.raises(ValueError, match="n = 5"):
        cf.gopher_repetition_flags(df, max_dup_ngram_char_frac=(0.1,))


def test_c4_page_filters_rules(spark):
    """C4 §2.2 page rules: terminal-punct line retention, short-line
    and javascript drops, lorem-ipsum / brace / sentence-count /
    badword page flags — each rule pinned on a planted page."""
    from cybersecurity_miw_spark.operators import corpus_filters as cf

    good = "\n".join(
        f"this is sentence number {i} and it is fine." for i in range(6)
    )
    pages = [
        (0, good),
        (1, good + "\nno terminal punct line\nshort one."),
        (2, good + "\nenable javascript to view this page."),
        (3, good + "\nLorem Ipsum dolor sit amet."),
        (4, good + "\nfunction() { return 1; } and more."),
        (5, "one sentence only."),
        (6, good + "\nthis page has a banned badword here."),
        (7, ""),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in cf.c4_page_filters(df, badwords=("badword",)).collect()
    }
    assert got[0]["keep"] and got[0]["n_lines_kept"] == 6
    # line without terminal punct dropped; 2-word line dropped
    assert got[1]["keep"] and got[1]["n_lines_kept"] == 6
    assert "no terminal punct" not in got[1]["clean_text"]
    assert "short one." not in got[1]["clean_text"]
    # javascript line dropped but page keeps (enough sentences remain)
    assert got[2]["keep"] and "javascript" not in got[2]["clean_text"]
    assert not got[3]["keep"] and got[3]["has_lorem_ipsum"]
    assert not got[4]["keep"] and got[4]["has_brace"]
    assert not got[5]["keep"] and got[5]["n_sentences"] < 5
    assert not got[6]["keep"] and got[6]["has_badword"]
    assert not got[7]["keep"] and got[7]["n_lines"] == 0

    # no badwords supplied -> rule off, page 6 passes
    got2 = {
        r["doc_id"]: r for r in cf.c4_page_filters(df).collect()
    }
    assert got2[6]["keep"] and not got2[6]["has_badword"]

    # shuffle-free plan
    plan = (
        cf.c4_page_filters(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
