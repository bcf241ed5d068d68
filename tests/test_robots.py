"""Goldens for the robots.txt gate (operators/robots.py — RFC 9309):
group parsing (multi-agent groups, comments, rules outside groups,
empty patterns, unknown directives), pattern→regex translation
(wildcards, $ anchor, metachar escaping), agent-group selection,
longest-match + Allow-wins-ties resolution, and the one-call
frontier post-filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import robots as rb


def _rules(spark, txt, host="a.com"):
    df = spark.createDataFrame(
        [(host, txt)], "host string, robots_txt string"
    )
    return rb.parse_robots(df)


def test_parse_groups_and_edge_cases(spark):
    txt = (
        "Disallow: /ignored-no-group\n"      # before any group: dropped
        "# top comment\n"
        "User-agent: alpha\n"
        "User-agent: beta\n"                  # multi-agent group
        "Disallow: /a   # trailing comment\n"
        "Crawl-delay: 10\n"                   # unknown directive: ignored
        "Allow: /a/ok\n"
        "\n"
        "User-agent: *\n"
        "Disallow:\n"                         # empty pattern: dropped
        "DISALLOW: /b\n"                      # case-insensitive field
    )
    parsed = _rules(spark, txt).collect()
    rows = {
        (r["agent"], r["rule_type"], r["pattern"])
        for r in parsed
        if r["rule_type"] != "member"
    }
    assert rows == {
        ("alpha", "disallow", "/a"),
        ("alpha", "allow", "/a/ok"),
        ("beta", "disallow", "/a"),
        ("beta", "allow", "/a/ok"),
        ("*", "disallow", "/b"),
    }
    # one NULL-pattern membership marker per (host, agent) group —
    # group existence must survive even when all its rules drop
    members = {
        (r["agent"], r["pattern"], r["pattern_regex"])
        for r in parsed
        if r["rule_type"] == "member"
    }
    assert members == {
        ("alpha", None, None), ("beta", None, None), ("*", None, None)
    }


def test_ruleless_specific_group_shields_from_star(spark):
    """RFC 9309 §2.2.1 (the r18 ADVICE-high regression): 'User-agent:
    mybot / Disallow:' followed by 'User-agent: * / Disallow: /' —
    mybot's group EXISTS (empty-pattern rule drops, membership does
    not), so mybot is allowed everywhere while others are blocked."""
    txt = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    rules = _rules(spark, txt)
    got = _gate(spark, rules, ["http://a.com/a"], agent="mybot")
    assert got["http://a.com/a"] == (True, None)
    got = _gate(spark, rules, ["http://a.com/a"], agent="otherbot")
    assert got["http://a.com/a"] == (False, "/")


def test_pattern_regex_translation(spark):
    df = spark.createDataFrame(
        [("/a*b.php$",), ("/plain",), ("/q?x=(1)",)], "pattern string"
    )
    out = [
        r["rx"]
        for r in df.select(
            rb.pattern_regex(F.col("pattern")).alias("rx")
        ).collect()
    ]
    assert out[0] == r"^/a.*b\.php$"
    assert out[1] == "^/plain"
    assert out[2] == r"^/q\?x=\(1\)"


def _gate(spark, rules, urls, agent="*"):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        r["url"]: (r["allowed"], r["matched_rule"])
        for r in rb.robots_allowed(u, rules, agent=agent).collect()
    }


def test_longest_match_and_allow_ties(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /p\n"
        "Allow: /p/deep\n"       # longer → wins over /p
        "Disallow: /q/x\n"
        "Allow: /q/y\n"
        "Allow: /same\n"
        "Disallow: /same\n"      # equal length → Allow wins
    )
    rules = _rules(spark, txt)
    got = _gate(
        spark,
        rules,
        [
            "http://a.com/p/shallow",
            "http://a.com/p/deep/file",
            "http://a.com/same",
            "http://a.com/other",
        ],
    )
    assert got["http://a.com/p/shallow"] == (False, "/p")
    assert got["http://a.com/p/deep/file"] == (True, "/p/deep")
    assert got["http://a.com/same"] == (True, "/same")
    assert got["http://a.com/other"] == (True, None)


def test_dollar_anchor_and_query_matching(spark):
    txt = "User-agent: *\nDisallow: /f/*.pdf$\nDisallow: /s?id=9\n"
    rules = _rules(spark, txt)
    got = _gate(
        spark,
        rules,
        [
            "http://a.com/f/x.pdf",
            "http://a.com/f/x.pdf?dl=1",  # $ anchors the FULL path+query
            "http://a.com/s?id=9",        # query participates in match
            "http://a.com/s?id=10",
        ],
    )
    assert got["http://a.com/f/x.pdf"][0] is False
    assert got["http://a.com/f/x.pdf?dl=1"][0] is True
    assert got["http://a.com/s?id=9"][0] is False
    # '/s?id=9' is a PREFIX of '/s?id=10'? no — 9 ≠ 1, so allowed
    assert got["http://a.com/s?id=10"][0] is True


def test_pct_normalize_gate(spark):
    """robots_allowed(pct_normalize=True) — RFC 9309 §2.2.2's
    allowed normalization: '%7E' rules gate '~' URLs (and the
    reverse), reserved octets stay distinct from their literals
    ('%2F' never gates '/'), and the default raw-octet gate is
    unchanged."""
    txt = (
        "User-agent: *\n"
        "Disallow: /%7eadmin\n"    # lowercase-hex encoded '~'
        "Disallow: /a%2Fb\n"       # encoded reserved '/': stays encoded
    )
    rules = _rules(spark, txt)
    urls = [
        "http://a.com/~admin/x",   # literal ~ — gated only normalized
        "http://a.com/%7Eadmin/y",  # uppercase-hex — gated only normalized
        "http://a.com/a/b",        # literal path ≠ encoded %2F rule
        "http://a.com/a%2fb",      # encoded — gated either way (case-fold
                                   # only matters normalized)
    ]
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    norm = {
        r["url"]: (r["allowed"], r["matched_rule"])
        for r in rb.robots_allowed(u, rules, pct_normalize=True).collect()
    }
    assert norm["http://a.com/~admin/x"] == (False, "/~admin")
    assert norm["http://a.com/%7Eadmin/y"] == (False, "/~admin")
    assert norm["http://a.com/a/b"] == (True, None)
    assert norm["http://a.com/a%2fb"] == (False, "/a%2Fb")
    raw = _gate(spark, rules, urls)
    assert raw["http://a.com/~admin/x"] == (True, None)
    assert raw["http://a.com/%7Eadmin/y"] == (True, None)
    assert raw["http://a.com/a/b"] == (True, None)
    # raw octets: '%2f' ≠ '%2F'
    assert raw["http://a.com/a%2fb"] == (True, None)


def test_agent_group_selection(spark):
    txt = (
        "User-agent: mybot\nDisallow: /only-mybot\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    rules = _rules(spark, txt)
    # specific group exists → star group does NOT apply to mybot
    got = _gate(spark, rules, ["http://a.com/x"], agent="MyBot")
    assert got["http://a.com/x"][0] is True
    got = _gate(spark, rules, ["http://a.com/only-mybot/z"], agent="mybot")
    assert got["http://a.com/only-mybot/z"][0] is False
    # unknown agent falls back to star
    got = _gate(spark, rules, ["http://a.com/x"], agent="otherbot")
    assert got["http://a.com/x"][0] is False
    # host with no rules at all → allowed
    got = _gate(spark, rules, ["http://norules.net/x"], agent="mybot")
    assert got["http://norules.net/x"][0] is True


def test_robots_crawl_delays(spark):
    """robots_crawl_delays (advisory, non-standard): group-existence
    selection like the gate, MIN over selected groups, ms rounding
    of fractional seconds, unparseable values dropped, a delay line
    between two ua runs terminates the first run."""
    robots = spark.createDataFrame(
        [
            # specific group for mybot (2.5s) + star group (10s)
            ("a.com", "User-agent: mybot\nCrawl-delay: 2.5\n\n"
                      "User-agent: *\nCrawl-delay: 10\nDisallow: /x"),
            # two star groups: min wins (5 over 8)
            ("b.com", "User-agent: *\nCrawl-delay: 8\n\n"
                      "User-agent: *\nCrawl-delay: 5"),
            # mybot group EXISTS but declares no delay -> absent for
            # mybot even though * declares one (group selection)
            ("c.com", "User-agent: mybot\nDisallow: /p\n\n"
                      "User-agent: *\nCrawl-delay: 7"),
            # unparseable + negative-shaped values drop
            ("d.com", "User-agent: *\nCrawl-delay: fast\n"
                      "Crawl-delay: -3"),
            # delay line TERMINATES the ua run: the delay belongs to
            # alpha; beta opens a fresh (delay-less) group
            ("e.com", "User-agent: alpha\nCrawl-delay: 4\n"
                      "User-agent: beta\nDisallow: /q"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["crawl_delay_ms"]
        for r in rb.robots_crawl_delays(robots, agent="mybot").collect()
    }
    assert got == {"a.com": 2500, "b.com": 5000}
    star = {
        r["host"]: r["crawl_delay_ms"]
        for r in rb.robots_crawl_delays(robots).collect()
    }
    assert star["a.com"] == 10000 and star["c.com"] == 7000
    assert "d.com" not in star and "e.com" not in star
    alpha = {
        r["host"]: r["crawl_delay_ms"]
        for r in rb.robots_crawl_delays(robots, agent="alpha").collect()
    }
    assert alpha.get("e.com") == 4000
    beta = {
        r["host"]: r["crawl_delay_ms"]
        for r in rb.robots_crawl_delays(robots, agent="beta").collect()
    }
    assert "e.com" not in beta


def test_crawl_allowed_urls_one_call(spark):
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/"),
            ("b.com", "User-agent: *\nDisallow:"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("http://a.com/private/x", 1),
            ("http://a.com/ok", 2),
            ("http://b.com/anything", 3),
        ],
        "url string, n long",
    )
    out = rb.crawl_allowed_urls(urls, robots)
    rows = {r["url"]: r["n"] for r in out.collect()}
    # gate filters, payload columns survive, verdict columns dropped
    assert set(rows) == {"http://a.com/ok", "http://b.com/anything"}
    assert out.columns == ["url", "n"]


def test_gate_deterministic_under_repartition(spark):
    txt = (
        "User-agent: *\nDisallow: /p\nAllow: /p/a*\nDisallow: /p/a$\n"
    )
    rules = _rules(spark, txt)
    urls = [
        (f"http://a.com/p/a{i % 5}" if i % 3 else f"http://a.com/p/a",)
        for i in range(40)
    ]
    u1 = spark.createDataFrame(urls, "url string")
    u2 = spark.createDataFrame(urls, "url string").repartition(7)
    r1 = sorted(map(tuple, rb.robots_allowed(u1, rules).collect()))
    r2 = sorted(map(tuple, rb.robots_allowed(u2, rules).collect()))
    assert r1 == r2

def test_robots_sitemap_declarations(spark):
    txt = (
        "Sitemap: https://a.com/sitemap.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "SITEMAP: https://a.com/sitemap2.xml  # case-insensitive\n"
        "Sitemap:\n"  # empty: dropped
    )
    rows = {
        (r["host"], r["sitemap_url"])
        for r in rb.robots_sitemaps(
            spark.createDataFrame(
                [("a.com", txt)], "host string, robots_txt string"
            )
        ).collect()
    }
    assert rows == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/sitemap2.xml"),
    }


def test_parse_sitemaps(spark):
    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.com/p1 </loc><lastmod>2026-01-01</lastmod>"
        "</url><url><loc>https://a.com/p2?a=1&amp;b=2</loc></url>"
        "<url><loc><![CDATA[https://a.com/p3]]></loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "</sitemap><sitemap><loc>https://a.com/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://a.com/sitemap.xml", urlset),
         ("https://a.com/index.xml", index)],
        "url string, body string",
    )
    rows = {
        (r["sitemap_url"], r["loc"], r["kind"])
        for r in rb.parse_sitemaps(df).collect()
    }
    assert rows == {
        ("https://a.com/sitemap.xml", "https://a.com/p1", "url"),
        ("https://a.com/sitemap.xml", "https://a.com/p2?a=1&b=2", "url"),
        ("https://a.com/sitemap.xml", "https://a.com/p3", "url"),
        ("https://a.com/index.xml", "https://a.com/s1.xml", "sitemap"),
        ("https://a.com/index.xml", "https://a.com/s2.xml", "sitemap"),
    }
