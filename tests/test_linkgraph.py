"""Goldens for the link-graph layer (operators/linkgraph.py): RFC
3986 href resolution branches, the outlink→edge chain with
canonicalization, in-degree / anchor-text indexing, domain-level
aggregation with subdomain collapse, hand-computed integer PageRank
with bit-exact determinism under repartitioning, and frontier
expansion with and without a domain prior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import linkgraph as lg


def _resolve(spark, base: str, href: str):
    df = spark.createDataFrame([(base, href)], "b string, h string")
    return df.select(
        lg.resolve_href(F.col("b"), F.col("h")).alias("r")
    ).first()["r"]


def test_resolve_href_branches(spark):
    base = "http://a.com/x/page1.html"
    cases = {
        # absolute passes through
        "https://o.org/p?q=1": "https://o.org/p?q=1",
        # protocol-relative takes the base scheme
        "//b.com/p": "http://b.com/p",
        # root-relative takes scheme+authority
        "/about": "http://a.com/about",
        # path-relative merges against the base directory
        "b.html": "http://a.com/x/b.html",
        "./c.html": "http://a.com/x/c.html",
        "../up.html": "http://a.com/up.html",
        # query-only keeps the base's FULL path (RFC 3986 §5.3 —
        # the pagination-href shape, r18 ADVICE-medium regression)
        "?page=2": "http://a.com/x/page1.html?page=2",
        "?a=1&b=2#s": "http://a.com/x/page1.html?a=1&b=2",
        # fragment is crawl-irrelevant and dropped
        "/p#sec2": "http://a.com/p",
        # non-navigational schemes and fragment-only → NULL
        "#frag": None,
        "": None,
        "javascript:void(0)": None,
        "mailto:x@y.com": None,
        "data:text/plain,hi": None,
        "tel:+1234": None,
    }
    for href, want in cases.items():
        assert _resolve(spark, base, href) == want, href
    # base without a path directory resolves against '/'
    assert _resolve(spark, "http://b.com", "rel") == "http://b.com/rel"
    # bounded dot-segment removal: MAX_DOTSEG_PASSES deep still exact
    deep = "http://a.com/" + "d/" * lg.MAX_DOTSEG_PASSES + "f.html"
    assert (
        _resolve(spark, deep, "../" * lg.MAX_DOTSEG_PASSES + "g.html")
        == "http://a.com/g.html"
    )


def _pages(spark):
    return spark.createDataFrame(
        [
            (
                1,
                "http://a.com/x/page1.html",
                '<a href="/about">About</a> <a href="b.html">Bee</a> '
                '<a href="http://c.com/q?utm_source=x&amp;id=3">Cee</a> '
                '<a href="javascript:void(0)">JS</a> <a href="#f">F</a>',
            ),
            (
                2,
                "http://b.com/",
                '<a href="http://a.com/x/page1.html">A one</a> '
                '<a href="./rel">Rel</a>',
            ),
        ],
        "doc_id long, url string, html string",
    )


def test_outlink_edges_chain(spark):
    edges = lg.outlink_edges(_pages(spark))
    rows = {
        (r["doc_id"], r["link_no"]): r
        for r in edges.collect()
    }
    # javascript: and fragment-only anchors dropped
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (2, 0), (2, 1)}
    assert rows[(1, 0)]["dst_url"] == "http://a.com/about"
    assert rows[(1, 1)]["dst_url"] == "http://a.com/x/b.html"
    # &amp; decoded, tracking param canonicalized away
    assert rows[(1, 2)]["dst_url"] == "http://c.com/q?id=3"
    assert rows[(1, 2)]["anchor_text"] == "Cee"
    assert rows[(2, 1)]["dst_url"] == "http://b.com/rel"
    assert rows[(2, 0)]["src_url"] == "http://b.com/"


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor_text string"
    )


def test_anchor_text_index_topk(spark):
    edges = _edges(
        spark,
        [
            ("s1", "t", "beta"),
            ("s2", "t", "alpha"),
            ("s3", "t", "alpha"),
            ("s4", "t", "gamma"),
            ("s5", "t", ""),  # counts in degree, excluded from top-k
            ("s1", "u", "only"),
        ],
    )
    out = {r["dst_url"]: r for r in lg.anchor_text_index(edges, k=2).collect()}
    assert out["t"]["n_links"] == 5 and out["t"]["n_src_pages"] == 5
    # count desc then text asc: alpha(2), then beta/gamma tie → beta
    assert list(out["t"]["top_anchors"]) == ["alpha", "beta"]
    assert list(out["u"]["top_anchors"]) == ["only"]
    # a target with only empty anchors gets an empty array, not null
    e2 = _edges(spark, [("s1", "v", "")])
    row = lg.anchor_text_index(e2).first()
    assert list(row["top_anchors"]) == [] and row["n_links"] == 1
    with pytest.raises(ValueError, match="k must be"):
        lg.anchor_text_index(edges, k=0)


def test_domain_link_graph_collapse(spark):
    edges = _edges(
        spark,
        [
            # two subdomains of x.com both link to y.com → collapse
            ("http://a.x.com/1", "http://y.com/p", ""),
            ("http://b.x.com/2", "http://y.com/q", ""),
            # internal (same-domain) edge: dropped by default
            ("http://a.x.com/1", "http://c.x.com/3", ""),
        ],
    )
    out = {
        (r["src_domain"], r["dst_domain"]): r
        for r in lg.domain_link_graph(edges).collect()
    }
    assert set(out) == {("x.com", "y.com")}
    assert out[("x.com", "y.com")]["n_links"] == 2
    assert out[("x.com", "y.com")]["n_src_pages"] == 2
    withint = {
        (r["src_domain"], r["dst_domain"])
        for r in lg.domain_link_graph(edges, include_internal=True).collect()
    }
    assert ("x.com", "x.com") in withint


def test_pagerank_hand_computed_one_iteration(spark):
    edges = _edges(
        spark,
        [
            ("a", "b", ""),
            ("a", "c", ""),
            ("b", "c", ""),
            ("c", "a", ""),
            ("d", "c", ""),
        ],
    )
    pr = {
        r["url"]: r["pr_micro"]
        for r in lg.pagerank(edges, iters=1).collect()
    }
    # degrees: a=2, b=1, c=1, d=1; start 1e6 each
    # in(a)=1e6; in(b)=1e6//2; in(c)=1e6//2+1e6+1e6; in(d)=0
    assert pr["a"] == 150_000 + (850_000 * 1_000_000) // 1_000_000
    assert pr["b"] == 150_000 + (850_000 * 500_000) // 1_000_000
    assert pr["c"] == 150_000 + (850_000 * 2_500_000) // 1_000_000
    assert pr["d"] == 150_000  # dangling-source node: base only


def test_pagerank_simple_graph_semantics(spark):
    # parallel anchors collapse to one edge; self-loops removed
    edges = _edges(
        spark,
        [("a", "b", "x"), ("a", "b", "y"), ("a", "a", "self"),
         ("b", "a", "")],
    )
    pr = {
        r["url"]: r["pr_micro"]
        for r in lg.pagerank(edges, iters=1).collect()
    }
    # a has ONE out-edge after dedup/self-loop removal → b gets full
    # mass, not half
    assert pr["b"] == 150_000 + 850_000
    assert pr["a"] == 150_000 + 850_000
    with pytest.raises(ValueError, match="iters"):
        lg.pagerank(edges, iters=0)
    with pytest.raises(ValueError, match="damping"):
        lg.pagerank(edges, damping_micro=1_000_000)


def test_pagerank_dangling_redistribution_hand_computed(spark):
    """redistribute_dangling=True (Page et al. 1999): dangling nodes
    return their mass uniformly. Graph a→b, a→c: b and c are
    dangling (mass 2e6 at iter 1 start... here start is uniform 1e6
    each, dangling total = 2e6, N = 3, share = 2e6//3 = 666666)."""
    edges = _edges(spark, [("a", "b", ""), ("a", "c", "")])
    pr = {
        r["url"]: r["pr_micro"]
        for r in lg.pagerank(
            edges, iters=1, redistribute_dangling=True
        ).collect()
    }
    share = (2 * 1_000_000) // 3
    # in(a)=0+share; in(b)=in(c)=1e6//2+share
    assert pr["a"] == 150_000 + (850_000 * share) // 1_000_000
    assert pr["b"] == 150_000 + (850_000 * (500_000 + share)) // 1_000_000
    assert pr["c"] == pr["b"]
    # the default variant drops that mass: a gets base only
    base = {
        r["url"]: r["pr_micro"]
        for r in lg.pagerank(edges, iters=1).collect()
    }
    assert base["a"] == 150_000
    assert pr["a"] > base["a"]


def test_pagerank_dangling_conserves_mass(spark):
    """With redistribution, total mass stays ≈ N·1e6 (integer-
    division dust only: one //deg per edge, one //N share, one //1e6
    damping round per node per iteration); the default variant
    visibly leaks the dangling mass on the same graph."""
    rows = [
        (f"http://s{i % 5}.com/p{i}",
         f"http://dangling{i % 17}.com/x{i}", "")
        for i in range(40)
    ] + [(f"http://s{i % 5}.com/p{i}", f"http://s{(i + 1) % 5}.com/p{i + 1}", "")
         for i in range(0, 40, 3)]
    edges = _edges(spark, rows)
    iters = 3
    cons = lg.pagerank(edges, iters=iters, redistribute_dangling=True)
    n = cons.count()
    total = cons.agg(F.sum("pr_micro")).first()[0]
    ideal = n * 1_000_000
    # dust bound: per iteration each node can lose < 1 micro-unit at
    # each of ~3 integer divisions, plus the dm//N floor
    slack = iters * (4 * n + 1_000_000)
    assert ideal - slack <= total <= ideal
    leaky_total = (
        lg.pagerank(edges, iters=iters).agg(F.sum("pr_micro")).first()[0]
    )
    assert leaky_total < total - 1_000_000  # the leak is material


def test_pagerank_deterministic_under_repartition(spark):
    rows = [
        (f"http://s{i % 7}.com/p{i}", f"http://s{(i * 3 + 1) % 7}.com/p{(i * 5) % 23}", "")
        for i in range(60)
    ]
    e1 = _edges(spark, rows)
    e2 = _edges(spark, rows).repartition(11)
    p1 = sorted(map(tuple, lg.pagerank(e1, iters=4).collect()))
    p2 = sorted(map(tuple, lg.pagerank(e2, iters=4).collect()))
    assert p1 == p2


def test_crawl_frontier(spark):
    edges = _edges(
        spark,
        [
            ("a", "new1", ""), ("b", "new1", ""), ("c", "new1", ""),
            ("a", "new2", ""), ("a", "new2", ""),
            ("a", "b", ""),  # already crawled
        ],
    )
    seen = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "url string"
    )
    out = {r["dst_url"]: r for r in lg.crawl_frontier(edges, seen).collect()}
    assert set(out) == {"new1", "new2"}
    # breadth beats volume: 3 links × 3 pages > 2 links × 1 page
    assert out["new1"]["frontier_score"] == 9
    assert out["new2"]["frontier_score"] == 2
    # domain prior reweights
    ds = spark.createDataFrame(
        [("new2", 9_000_000)], "domain string, score_micro long"
    )
    # hostless frontier URLs have no registrable domain → neutral;
    # use real URLs to exercise the prior join
    edges2 = _edges(
        spark,
        [
            ("http://a.com/", "http://low.com/p", ""),
            ("http://a.com/", "http://high.com/p", ""),
        ],
    )
    seen2 = spark.createDataFrame([("http://a.com/",)], "url string")
    ds2 = spark.createDataFrame(
        [("high.com", 3_000_000)], "domain string, score_micro long"
    )
    out2 = {
        r["dst_url"]: r["frontier_score"]
        for r in lg.crawl_frontier(edges2, seen2, domain_scores=ds2).collect()
    }
    assert out2["http://high.com/p"] == 3  # 1·1·3e6 div 1e6
    assert out2["http://low.com/p"] == 1   # neutral prior


def test_capstone_pages_to_frontier(spark):
    """The whole crawl loop on real pages: extract → resolve →
    canonicalize → rank the unseen targets."""
    edges = lg.outlink_edges(_pages(spark))
    seen = _pages(spark).select(F.col("url")).distinct()
    from cybersecurity_miw_spark.operators import urlcurate

    seen = seen.select(urlcurate.canonical_url(F.col("url")).alias("url"))
    frontier = lg.crawl_frontier(edges, seen)
    urls = {r["dst_url"] for r in frontier.collect()}
    # page1 is linked from page 2 but already crawled
    assert "http://a.com/x/page1.html" not in urls
    assert "http://a.com/about" in urls and "http://c.com/q?id=3" in urls

def test_domain_quality_scores_prior(spark):
    """domain_quality_scores: per-registrable-domain exact integer
    mean of a per-doc model score, subdomains collapsed — and the
    prior actually steers crawl_frontier."""
    docs = spark.createDataFrame(
        [
            ("http://a.good.com/1", 2_000_000),
            ("http://b.good.com/2", 4_000_000),
            ("http://bad.com/1", -1_000_000),
            ("nohost", 5),  # no authority → excluded
        ],
        "url string, clf_score_micro long",
    )
    out = {
        r["domain"]: (r["score_micro"], r["n_docs"])
        for r in lg.domain_quality_scores(docs).collect()
    }
    assert out == {"good.com": (3_000_000, 2), "bad.com": (-1_000_000, 1)}
    # the prior reweights the frontier
    edges = _edges(
        spark,
        [
            ("http://src.com/", "http://x.good.com/p", ""),
            ("http://src.com/", "http://bad.com/p", ""),
        ],
    )
    seen = spark.createDataFrame([("http://src.com/",)], "url string")
    prior = lg.domain_quality_scores(docs).select("domain", "score_micro")
    ranked = {
        r["dst_url"]: r["frontier_score"]
        for r in lg.crawl_frontier(edges, seen, domain_scores=prior).collect()
    }
    assert ranked["http://x.good.com/p"] == 3  # 1·1·3e6 div 1e6
    assert ranked["http://bad.com/p"] == -1


def test_resolve_href_requires_absolute_base(spark):
    """A non-absolute base cannot anchor relative references —
    resolving against it used to fabricate '://'-malformed URLs
    that then flowed into dedup/frontier keys. Absolute hrefs still
    resolve."""
    assert _resolve(spark, "not-a-url", "/about") is None
    assert _resolve(spark, "", "b.html") is None
    assert _resolve(spark, "page.html", "//b.com/p") is None
    assert (
        _resolve(spark, "not-a-url", "http://x.com/p")
        == "http://x.com/p"
    )


def test_fetch_schedule_politeness(spark):
    """fetch_schedule: per-host ranks (score desc, url asc), the
    per-host crawl budget cap, and the breadth-polite order —
    consecutive fetch_order positions rotate hosts."""
    frontier = spark.createDataFrame(
        [
            ("http://a.com/1", 9), ("http://a.com/2", 8),
            ("http://a.com/3", 7),
            ("http://b.com/1", 5),
            ("http://c.com/1", 6), ("http://c.com/2", 1),
        ],
        "dst_url string, frontier_score long",
    )
    out = lg.fetch_schedule(frontier, per_host_k=2)
    rows = {r["dst_url"]: (r["host"], r["host_rank"]) for r in out.collect()}
    # a.com/3 capped out by per_host_k=2
    assert "http://a.com/3" not in rows
    assert rows["http://a.com/1"] == ("a.com", 1)
    assert rows["http://a.com/2"] == ("a.com", 2)
    assert rows["http://b.com/1"] == ("b.com", 1)
    # the contract order: every host's best first, then seconds
    ordered = [
        r["dst_url"]
        for r in out.orderBy(
            "host_rank", F.desc("frontier_score"), "dst_url"
        ).collect()
    ]
    assert ordered == [
        "http://a.com/1", "http://c.com/1", "http://b.com/1",
        "http://a.com/2", "http://c.com/2",
    ]
    import pytest as _pt

    with _pt.raises(ValueError, match="per_host_k"):
        lg.fetch_schedule(frontier, per_host_k=0)


def test_fetch_schedule_time_slots(spark):
    """Timed mode: fetch_slot_ms = (host_rank-1)·delay — declared
    Crawl-delay per host, default as a GLOBAL floor (undeclared
    hosts use it; smaller declarations are raised to it), per_host_k
    composes (capped URLs never get slots)."""
    import pytest as _pt

    frontier = spark.createDataFrame(
        [
            ("http://a.com/1", 9), ("http://a.com/2", 8),
            ("http://a.com/3", 7),
            ("http://b.com/1", 5), ("http://b.com/2", 4),
            ("http://c.com/1", 6), ("http://c.com/2", 1),
        ],
        "dst_url string, frontier_score long",
    )
    delays = spark.createDataFrame(
        [("a.com", 2000), ("c.com", 100)],
        "host string, crawl_delay_ms long",
    )
    out = lg.fetch_schedule(
        frontier, per_host_k=2, host_delays=delays, default_delay_ms=500
    )
    rows = {
        r["dst_url"]: (r["host_rank"], r["fetch_slot_ms"])
        for r in out.collect()
    }
    # declared 2000ms spacing on a.com
    assert rows["http://a.com/1"] == (1, 0)
    assert rows["http://a.com/2"] == (2, 2000)
    assert "http://a.com/3" not in rows  # capped
    # undeclared host uses the default
    assert rows["http://b.com/2"] == (2, 500)
    # declared 100ms is BELOW the floor -> raised to 500
    assert rows["http://c.com/2"] == (2, 500)
    # per-host spacing invariant: within each host, consecutive
    # slots differ by >= the effective delay
    import collections

    by_host = collections.defaultdict(list)
    for r in out.collect():
        by_host[r["host"]].append((r["host_rank"], r["fetch_slot_ms"]))
    for host, lst in by_host.items():
        lst.sort()
        for (_, s1), (_, s2) in zip(lst, lst[1:]):
            assert s2 - s1 >= 500
    # delays-only (no default): undeclared hosts fetch immediately
    out2 = lg.fetch_schedule(frontier, host_delays=delays)
    r2 = {r["dst_url"]: r["fetch_slot_ms"] for r in out2.collect()}
    assert r2["http://b.com/2"] == 0
    assert r2["http://c.com/2"] == 100
    # default-only: no join, uniform spacing
    out3 = lg.fetch_schedule(frontier, default_delay_ms=300)
    r3 = {r["dst_url"]: r["fetch_slot_ms"] for r in out3.collect()}
    assert r3["http://a.com/3"] == 600
    # untimed mode: no fetch_slot_ms column at all
    assert "fetch_slot_ms" not in lg.fetch_schedule(frontier).columns
    with _pt.raises(ValueError, match="default_delay_ms"):
        lg.fetch_schedule(frontier, default_delay_ms=-1)


def test_resolve_href_agrees_with_stdlib_urljoin(spark):
    """Seeded-random agreement with urllib.parse.urljoin — an
    independent RFC 3986 implementation — on cases inside the
    documented contract (absolute http(s) bases, dot-segment depth
    within MAX_DOTSEG_PASSES, no exotic schemes); fragments are
    stripped from the expectation because crawl identity drops them
    by design."""
    import random
    from urllib.parse import urldefrag, urljoin

    rng = random.Random(38616)
    bases = [
        "http://h.example/",
        "http://h.example/a/",
        "http://h.example/a/b.html",
        "https://x.example/p/q/r.html",
        "http://h.example/a/b/c/d.html",
    ]
    rels = [
        "e.html", "./e.html", "../up.html", "../../top.html",
        "/root.html", "//other.example/p", "sub/dir/f.html",
        "e.html?q=1", "/p?a=1&b=2", "f.html#sec", "#only",
        "https://abs.example/z", "../x/../y.html",
        "?q=1", "?page=2&x=3",  # query-only: base keeps its FULL path
    ]
    rows, expected = [], []
    for i in range(120):
        b, r = rng.choice(bases), rng.choice(rels)
        rows.append((b, r))
        if r == "#only":
            want = None  # fragment-only: non-navigational by contract
        else:
            want = urldefrag(urljoin(b, r)).url
        expected.append(want)
    df = spark.createDataFrame(rows, "b string, h string")
    got = [
        r["r"]
        for r in df.select(
            lg.resolve_href(F.col("b"), F.col("h")).alias("r")
        ).collect()
    ]
    diffs = [
        (rows[i], got[i], expected[i])
        for i in range(len(rows))
        if got[i] != expected[i]
    ]
    assert not diffs, f"{len(diffs)} diffs, first: {diffs[:3]}"
