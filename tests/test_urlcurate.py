"""Per-rule goldens for the URL/domain curation family
(operators/urlcurate.py): canonicalization rule by rule, PSL
algorithm cases (exact / multi-label / wildcard / exception /
default rule), domain block/allow suffix matching, and URL-exact
dedup survivors — the crafted shapes the SQL oracle parity can't pin
alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import urlcurate as uc


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(uc.canonical_url(F.col("url")).alias("c")).first()["c"]


# ---- canonical_url, rule by rule ----

@pytest.mark.parametrize(
    "raw,expect",
    [
        # scheme + host lowercase; default http port dropped; utm_*
        # and click-ids stripped; surviving params keep order;
        # fragment dropped
        (
            "HTTP://Example.COM:80/path?utm_source=x&q=1&gclid=z#frag",
            "http://example.com/path?q=1",
        ),
        # trailing host dot stripped; path kept
        ("https://www.Example.co.uk./", "https://www.example.co.uk/"),
        # non-default port kept; empty path becomes "/"
        ("https://example.com:8080", "https://example.com:8080/"),
        # default https port dropped
        ("https://example.com:443/x", "https://example.com/x"),
        # :80 on https is NOT default — kept
        ("https://example.com:80/x", "https://example.com:80/x"),
        # userinfo preserved verbatim; empty && token dropped
        (
            "http://user:pw@Host.com/a?b=2&&c=3",
            "http://user:pw@host.com/a?b=2&c=3",
        ),
        # all params tracking → the '?' goes too
        ("https://example.com/p?utm_a=1&UTM_B=2", "https://example.com/p"),
        # tracking-param match is by NAME — a value mentioning utm_
        # or a name merely containing 'ref' survives
        (
            "https://example.com/p?href=x&a=utm_b",
            "https://example.com/p?href=x&a=utm_b",
        ),
        # '?' inside the fragment is not a query
        ("https://example.com/p#frag?gclid=1", "https://example.com/p"),
        # no scheme → trimmed pass-through
        ("  not a url  ", "not a url"),
        ("example.com/path", "example.com/path"),
        # IPv6 literal → pass-through (functions/url.py contract)
        ("http://[::1]:80/x", "http://[::1]:80/x"),
        # malformed port → pass-through, NOT silently deleted (ADVICE
        # r16: dropping ':8a0' merged the URL with its port-less twin)
        ("http://h.com:8a0/x", "http://h.com:8a0/x"),
        ("HTTP://h.com:/x", "HTTP://h.com:/x"),
        # 'ref' is NOT in the default tracking set (content-bearing on
        # code forges — ADVICE r16); opt in via tracking_params
        (
            "https://forge.com/repo?ref=main&fbclid=x",
            "https://forge.com/repo?ref=main",
        ),
    ],
)
def test_canonical_url_rules(spark, raw, expect):
    assert _canon(spark, raw) == expect


def test_canonical_url_custom_tracking_set(spark):
    df = spark.createDataFrame(
        [("https://e.com/p?sid=1&q=2",)], "url string"
    )
    got = df.select(
        uc.canonical_url(F.col("url"), tracking_params=("sid",)).alias("c")
    ).first()["c"]
    assert got == "https://e.com/p?q=2"


# ---- registrable_domain: the PSL algorithm cases ----

def _rd(spark, hosts):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, host string"
    )
    out = uc.registrable_domain(df, host_col="host")
    return [
        r["registrable_domain"]
        for r in out.orderBy("doc_id").collect()
    ]


def test_registrable_domain_cases(spark):
    got = _rd(
        spark,
        [
            "www.example.com",        # exact single-label rule
            "example.com",            # already registrable
            "com",                    # host IS a public suffix → null
            "a.b.example.co.uk",      # multi-label rule wins over 'uk'
            "example.co.uk",
            "co.uk",                  # public suffix → null
            "foo.bar.ck",             # wildcard *.ck: ps = bar.ck
            "bar.ck",                 # matches *.ck itself → null
            "www.ck",                 # exception !www.ck → registrable
            "sub.www.ck",             # under the exception
            "x.unknowntld",           # default rule '*'
            "unknowntld",             # single unknown label → null
            "",                       # empty host → null
            "WWW.EXAMPLE.COM",        # case-insensitive
        ],
    )
    assert got == [
        "example.com",
        "example.com",
        None,
        "example.co.uk",
        "example.co.uk",
        None,
        "foo.bar.ck",
        None,
        "www.ck",
        "www.ck",
        "x.unknowntld",
        None,
        None,
        "example.com",
    ]


def test_registrable_domain_from_urls_keeps_all_rows(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example.com/x"), (2, "no scheme")],
        "doc_id long, url string",
    )
    out = uc.registrable_domain(df, url_col="url").orderBy("doc_id")
    rows = out.collect()
    assert [r["registrable_domain"] for r in rows] == ["example.com", None]
    # original columns survive, helper columns don't
    assert set(out.columns) == {"doc_id", "url", "registrable_domain"}


def test_registrable_domain_arg_validation(spark):
    df = spark.createDataFrame([(1, "h")], "doc_id long, host string")
    with pytest.raises(ValueError, match="exactly one"):
        uc.registrable_domain(df)
    with pytest.raises(ValueError, match="exactly one"):
        uc.registrable_domain(df, host_col="host", url_col="host")


def test_load_public_suffix_rules_shape():
    rules = uc.load_public_suffix_rules()
    by_rule = {r["rule"]: r for r in rules}
    assert by_rule["co.uk"]["n_labels"] == 2
    assert by_rule["*.ck"]["n_labels"] == 2
    assert by_rule["www.ck"]["exc"] is True
    assert not by_rule["com"]["exc"]


# ---- domain_filter ----

def test_domain_filter_block_allow(spark):
    df = spark.createDataFrame(
        [
            (0, "spam.example.com"),
            (1, "example.com"),
            (2, "examplexcom"),       # not a subdomain — no dot match
            (3, "good.org"),
            (4, "sub.good.org"),
        ],
        "doc_id long, host string",
    )
    blocked = uc.domain_filter(df, host_col="host", blocklist=("example.com",))
    assert sorted(r["doc_id"] for r in blocked.collect()) == [2, 3, 4]
    allowed = uc.domain_filter(df, host_col="host", allowlist=("good.org",))
    assert sorted(r["doc_id"] for r in allowed.collect()) == [3, 4]
    both = uc.domain_filter(
        df,
        host_col="host",
        allowlist=("good.org", "example.com"),
        blocklist=("sub.good.org",),
    )
    assert sorted(r["doc_id"] for r in both.collect()) == [0, 1, 3]
    # no lists → unchanged frame
    assert uc.domain_filter(df, host_col="host").count() == 5


def test_domain_filter_case_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "A.Example.COM"), (1, "ok.org")], "doc_id long, host string"
    )
    out = uc.domain_filter(df, host_col="host", blocklist=("EXAMPLE.com",))
    assert [r["doc_id"] for r in out.collect()] == [1]


# ---- url_exact_dedup ----

def test_url_exact_dedup_min_id_per_canonical(spark):
    df = spark.createDataFrame(
        [
            (5, "http://A.com/?utm_x=1"),   # same canonical as 2
            (2, "http://a.com/"),
            (3, "http://b.com/"),
            (7, "http://a.com/#frag"),      # same canonical as 2
        ],
        "doc_id long, url string",
    )
    out = uc.url_exact_dedup(df)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]
    # canonicalize=False dedups the raw strings instead
    raw = uc.url_exact_dedup(df, canonicalize=False)
    assert raw.count() == 4


def test_url_store_incremental_matches_pooled(spark):
    """The incremental twin (r16): batch-vs-store URL dedup admits
    exactly the docs the pooled url_exact_dedup would have admitted
    from the batch, and history is keyed by canonical form."""
    history = spark.createDataFrame(
        [(1, "https://a.com/x?utm_s=1"), (2, "https://b.com/y")],
        "doc_id long, url string",
    )
    store = uc.url_fingerprint_store(history)
    rows = {r["url_fingerprint"]: r["representative"]
            for r in store.collect()}
    assert len(rows) == 2 and set(rows.values()) == {1, 2}

    batch = spark.createDataFrame(
        [
            (10, "https://A.com/x#frag"),   # canonical dup of history 1
            (11, "https://c.com/z"),        # fresh
            (12, "https://c.com/z?gclid=1"),  # batch-internal dup of 11
            (13, "https://d.com/w"),        # fresh
        ],
        "doc_id long, url string",
    )
    out = uc.url_dedup_against_store(batch, store)
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 13]

    # pooled equivalence: union-dedup keeps the same batch survivors
    pooled = uc.url_exact_dedup(history.unionByName(batch))
    pooled_batch = sorted(
        r["doc_id"] for r in pooled.collect() if r["doc_id"] >= 10
    )
    assert pooled_batch == [11, 13]

    # appending the accepted batch extends the store; replay of the
    # same batch admits nothing (idempotent under redelivery)
    store2 = store.unionByName(uc.url_fingerprint_store(out))
    assert uc.url_dedup_against_store(batch, store2).count() == 0


def test_curate_documents_url_store_incremental(spark):
    """curate_documents(url_store=...): the batch URL-dedup stage
    also drops canonical-URL history dups without rescanning
    history."""
    from cybersecurity_miw_spark import pipeline

    history = spark.createDataFrame(
        [(1, "old words one", "https://a.com/x")],
        "doc_id long, text string, url string",
    )
    store = uc.url_fingerprint_store(history)
    batch = spark.createDataFrame(
        [
            (10, "new words two", "https://A.com/x?utm_s=1"),  # history dup
            (11, "new words three", "https://b.com/y"),
        ],
        "doc_id long, text string, url string",
    )
    m: list = []
    out = pipeline.curate_documents(
        batch,
        url_col="url",
        url_store=store,
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=m,
    )
    assert [x["stage"] for x in m] == ["url_dedup", "exact_dedup"]
    assert {r["doc_id"] for r in out.collect()} == {11}


# ---- url_quality_flags ----

def test_url_quality_flags_per_rule(spark):
    df = spark.createDataFrame(
        [
            (0, "https://www.example.com/a/b"),            # clean
            (1, "https://h12345678901.example.com/x"),     # digit host
            (2, "https://a.b.c.d.e.f.g.example.com/x"),    # label farm
            (3, "https://www.example.com" + "/s" * 13),    # deep path
            (4, "https://www.example.com/" + "z" * 2100),  # trap length
            (5, "https://www.example.com/p?q=XBadX"),      # badword, any case
            (6, "no scheme here"),                         # host-less
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r
        for r in uc.url_quality_flags(df, badwords=("xbadx",)).collect()
    }
    assert out[0]["keep"]
    assert out[0]["path_depth"] == 2 and out[0]["n_host_labels"] == 3
    assert not out[1]["keep"] and out[1]["host_digit_frac"] > 0.4
    assert not out[2]["keep"] and out[2]["n_host_labels"] == 9
    assert not out[3]["keep"] and out[3]["path_depth"] == 13
    assert not out[4]["keep"] and out[4]["url_len"] > 2048
    assert not out[5]["keep"] and out[5]["has_badword"]
    # host-less: only length/badword rules can reject — this one keeps
    assert out[6]["keep"]
    assert out[6]["n_host_labels"] == 0
    assert out[6]["host_digit_frac"] == 0.0


def test_url_quality_flags_custom_thresholds(spark):
    df = spark.createDataFrame(
        [(0, "https://www.example.com/a/b/c")], "doc_id long, url string"
    )
    strict = uc.url_quality_flags(df, max_path_depth=2).first()
    assert not strict["keep"]
    loose = uc.url_quality_flags(df, max_path_depth=3).first()
    assert loose["keep"]


def test_streaming_url_dedup_ingest(spark, tmp_path):
    """The crawl-feed streaming twin: within-batch and cross-run
    canonical-URL dedup through the persisted store, with metrics
    and idempotent replay — the streaming_dedup_ingest contract,
    URL-keyed."""
    from cybersecurity_miw_spark.streaming.ingest import (
        streaming_url_dedup_ingest,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 10/11 same canonical page (case + utm + fragment),
    # 12 distinct
    (indir / "a.tsv").write_text(
        "10\thttps://A.com/x?utm_s=1\tpage one words\n"
        "11\thttps://a.com/x#frag\tpage one other fetch\n"
        "12\thttps://b.com/y\tpage two words\n"
    )
    m: list = []
    streaming_url_dedup_ingest(
        spark, str(indir), ckpt, corpus, store, metrics=m
    ).awaitTermination(120)
    assert m[-1]["n_batch"] == 3 and m[-1]["n_accepted"] == 2

    # batch 2 (new run, same checkpoint): one history dup, one fresh
    (indir / "b.tsv").write_text(
        "20\thttps://B.com:443/y\tre-fetch of page two\n"
        "21\thttps://c.com/z\tpage three words\n"
    )
    streaming_url_dedup_ingest(
        spark, str(indir), ckpt, corpus, store, metrics=m
    ).awaitTermination(120)
    assert m[-1]["n_accepted"] == 1

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).collect()
    )
    assert got == [10, 12, 21]
    # the store holds one row per accepted canonical URL
    assert spark.read.parquet(store).count() == 3


def test_canonical_url_idempotent_over_grid(spark):
    """Canonicalization is a PROJECTION: applying it twice equals
    applying it once, over a combinatorial grid of scheme case,
    host case/trailing-dot, default/explicit ports, userinfo, paths,
    tracking/real/empty params, and fragments. Idempotence is what
    lets a re-crawl pipeline canonicalize defensively without
    double-mangling already-clean URLs."""
    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["Example.COM", "a.b.Example.org.", "x1.io"]
    ports = ["", ":80", ":443", ":8080"]
    users = ["", "u:p@"]
    paths = ["", "/", "/a/b", "/a%20b"]
    queries = ["", "?q=1", "?utm_s=1&q=2", "?gclid=x", "?a=1&&b=2"]
    frags = ["", "#sec", "#f?q=9"]
    urls = []
    i = 0
    for s in schemes:
        for h in hosts:
            for p in ports:
                for u in users:
                    for pa in paths:
                        q = queries[i % len(queries)]
                        f = frags[i % len(frags)]
                        urls.append((i, f"{s}://{u}{h}{p}{pa}{q}{f}"))
                        i += 1
    # plus the pass-through shapes
    urls += [(i, "no scheme"), (i + 1, "http://[::1]/x"), (i + 2, "")]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    once = uc.canonical_url(F.col("url"))
    out = df.select(
        "doc_id",
        once.alias("c1"),
    ).select(
        "doc_id", "c1", uc.canonical_url(F.col("c1")).alias("c2")
    )
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, [(r["c1"], r["c2"]) for r in bad[:5]]
    # and the canonical form never contains a fragment or utm param
    leak = out.filter(
        F.col("c1").contains("#") | F.lower(F.col("c1")).contains("utm_")
    ).collect()
    assert not leak, [r["c1"] for r in leak[:5]]


# ---- pct_normalize_url (RFC 3986 §6.2.2), rule by rule ----

def _pct(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    rows = (
        df.select("i", uc.pct_normalize_url(F.col("url")).alias("n"))
        .orderBy("i")
        .collect()
    )
    return [r["n"] for r in rows]


@pytest.mark.parametrize(
    "raw,expect",
    [
        # unreserved escapes decode: ALPHA / DIGIT / -._~  (§2.3)
        ("https://ex.com/%7Euser", "https://ex.com/~user"),
        ("https://ex.com/%7euser", "https://ex.com/~user"),
        ("https://ex.com/%41%62%39", "https://ex.com/Ab9"),
        ("https://ex.com/%2D%2E%5F%7E", "https://ex.com/-._~"),
        # reserved octets stay ENCODED, hex uppercased — %2F must
        # never become a path '/'
        ("https://ex.com/a%2fb", "https://ex.com/a%2Fb"),
        ("https://ex.com/?q=%20a%3d1", "https://ex.com/?q=%20a%3D1"),
        # multi-byte UTF-8 sequences stay encoded (each octet is
        # non-unreserved), hex uppercased
        ("https://ex.com/%c3%a9", "https://ex.com/%C3%A9"),
        # a '%' not followed by two hex digits is not a triplet
        ("https://ex.com/%zz", "https://ex.com/%zz"),
        ("https://ex.com/x%", "https://ex.com/x%"),
        ("https://ex.com/%4", "https://ex.com/%4"),
        ("%", "%"),
        # lone '%' then a real triplet: decode the triplet only
        ("https://ex.com/%%41", "https://ex.com/%A"),
        # no '%' anywhere → byte-identical passthrough
        ("https://ex.com/plain?q=1#f", "https://ex.com/plain?q=1#f"),
        ("", ""),
    ],
)
def test_pct_normalize_rules(spark, raw, expect):
    assert _pct(spark, [raw]) == [expect]


def _pct_ref(u: str) -> str:
    """Independent reference model: single-pass re.sub, decode
    unreserved triplets, uppercase the rest — the contract the
    docstring names."""
    import re

    def repl(m):
        hx = m.group(1).upper()
        ch = chr(int(hx, 16))
        if re.fullmatch(r"[A-Za-z0-9._~-]", ch):
            return ch
        return "%" + hx

    return re.sub(r"%([0-9A-Fa-f]{2})", repl, u)


def test_pct_normalize_matches_reference_model(spark):
    """Seeded-random URLs dense in '%' pathologies (valid triplets
    across the whole byte range, half-triplets, bare and doubled
    '%', mixed hex case) agree with the re.sub reference model —
    the urljoin-suite pattern for expression-vs-Python parity."""
    import random

    rng = random.Random(18)
    hexd = "0123456789abcdefABCDEF"
    frags = ["a", "xy", "/", "?", "=", "&", ".", "~", "%", "%%", ""]
    urls = []
    for _ in range(400):
        parts = ["https://ex.com/"]
        for _ in range(rng.randint(0, 8)):
            r = rng.random()
            if r < 0.45:
                parts.append("%" + rng.choice(hexd) + rng.choice(hexd))
            elif r < 0.6:
                parts.append("%" + rng.choice(hexd))
            else:
                parts.append(rng.choice(frags))
        urls.append("".join(parts))
    got = _pct(spark, urls)
    want = [_pct_ref(u) for u in urls]
    assert got == want


def test_pct_then_canonical_merges_encoded_duplicates(spark):
    """The composition the recipes run: '%7Euser' and '~user' URLs
    dedup to ONE page once pct_normalize_url is prepended, and stay
    stable under a second pass (idempotent on well-formed URLs)."""
    urls = [
        (1, "https://Ex.com/%7Euser"),
        (2, "https://ex.com/%7euser"),
        (3, "https://ex.com/~user"),
        (4, "https://ex.com/other"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    normed = df.withColumn("url", uc.pct_normalize_url(F.col("url")))
    surv = uc.url_exact_dedup(normed)
    assert sorted(r["doc_id"] for r in surv.collect()) == [1, 4]
    c1 = uc.canonical_url(uc.pct_normalize_url(F.col("url")))
    out = df.select(c1.alias("c1")).select(
        "c1",
        uc.canonical_url(uc.pct_normalize_url(F.col("c1"))).alias("c2"),
    )
    assert not out.filter(F.col("c1") != F.col("c2")).collect()


def test_compact_url_fingerprint_store(spark, tmp_path):
    """Replay-duplicated URL-store rows collapse to one (min
    representative) per fingerprint through the atomic rewrite."""
    store = str(tmp_path / "ustore")
    df = spark.createDataFrame(
        [(10, "https://a.com/x"), (11, "https://A.com/x?utm_s=1")],
        "doc_id long, url string",
    )
    uc.url_fingerprint_store(df).write.mode("append").parquet(store)
    # simulate a replayed append with a different representative
    uc.url_fingerprint_store(
        df.withColumn("doc_id", F.col("doc_id") + 5)
    ).write.mode("append").parquet(store)
    assert spark.read.parquet(store).count() == 2
    rep = uc.compact_url_fingerprint_store(spark, store)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1
    assert rows[0]["representative"] == 10
    assert rep["rows_before"] == 2 and rep["rows_after"] == 1
