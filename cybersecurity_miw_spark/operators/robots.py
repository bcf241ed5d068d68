"""robots.txt parsing and the crawl-permission gate (RFC 9309) — the
politeness check between frontier expansion (operators/linkgraph.py)
and the fetcher: parse each host's robots.txt into a rules table,
then gate candidate URLs by the longest-match allow/disallow
decision. Both halves are pure relational compositions (line
explode + window group assignment; broadcast-able rules join +
max-of-struct winner), so the gate runs against a billion-URL
frontier without any driver-side state.

Semantics implemented (RFC 9309 + the de-facto Googlebot rules the
RFC codified):

* groups: one or more consecutive ``User-agent:`` lines followed by
  ``Allow:`` / ``Disallow:`` lines; rules before any user-agent line
  are ignored; unknown directives are ignored; ``#`` starts a
  comment; field names are case-insensitive.
* group selection: the group(s) whose agent token equals the
  caller's (case-insensitive, exact product-token match), when any
  exist for the host; otherwise the ``*`` group(s). No group → the
  URL is allowed.
* rule matching: patterns match the URL's path+query as a prefix;
  ``*`` matches any span; a TRAILING ``$`` anchors the end of the
  URL (mid-pattern ``$`` is literal — the Googlebot convention);
  empty patterns match nothing. The most specific match wins —
  longest raw pattern; at equal length ``Allow`` wins (RFC 9309
  §2.2.2 "least restrictive"). No matching rule → allowed.

Discovery companions: :func:`robots_sitemaps` extracts ``Sitemap:``
declarations (legal anywhere in the file, outside groups) and
:func:`parse_sitemaps` parses fetched sitemap/sitemapindex XML into
frontier seeds. Percent-encoding normalization of rule/URL octets
(RFC 9309 §2.2.2's allowance) is available as
``robots_allowed(pct_normalize=True)`` (r18 — rides
urlcurate.pct_normalize_url); the default matches raw octets, the
python-robotparser behavior the reference-model suite pins.
``Crawl-delay`` (non-standard but ubiquitous) is parsed ADVISORY by
:func:`robots_crawl_delays` — it never gates a URL; it feeds the
fetch scheduler's per-host time slots
(:func:`~cybersecurity_miw_spark.operators.linkgraph.
fetch_schedule`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# regex metacharacters escaped when translating a robots pattern to
# an RE2/Java regex — backslash FIRST (it escapes the escapes)
_REGEX_SPECIALS = ["\\", ".", "^", "$", "+", "?", "(", ")", "[", "]",
                   "{", "}", "|"]


def pattern_regex(pattern: Column) -> Column:
    """Translate a robots path pattern into the anchored regex both
    engines evaluate identically: trailing ``$`` → end anchor, ``*``
    → ``.*``, every other regex metachar escaped, ``^`` prepended
    (patterns are prefix matches)."""
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, F.lit(1), F.length(pattern) - 1)
    ).otherwise(pattern)
    for ch in _REGEX_SPECIALS:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into the rules table the gate joins:
    one row per (host, agent, rule_type, pattern, pattern_regex)
    with ``rule_type`` ∈ {'allow', 'disallow'}, PLUS one
    ``rule_type='member'`` marker row (NULL pattern) per (host,
    agent) group — group MEMBERSHIP must survive even when every
    rule in the group is dropped, because RFC 9309 §2.2.1 selects
    the most specific matching group before evaluating rules: a
    rule-less ``User-agent: mybot`` group means mybot is allowed
    everywhere, NOT that mybot falls back to ``*``. Group structure
    per RFC 9309: a rule attaches to every agent of the maximal run
    of ``User-agent:`` lines immediately preceding it; rules before
    any group and empty patterns are dropped (they match nothing).

    Plan: one line posexplode; one host-keyed window pass assigning
    group ids (a group starts at each ua-line whose predecessor is
    not a ua-line — gaps-and-islands); one self-join of rule lines
    to agent lines on (host, group). Robots bodies are KB-bounded by
    convention (RFC 9309 §2.5 requires parsers to handle ≥ 500 KiB),
    so per-host line counts are bounded and the window never skews."""
    grouped = _grouped_kv(robots, host_col, text_col)
    agents = _group_agents(grouped)
    is_ua = F.col("_field") == "user-agent"
    rules = grouped.filter(
        ~is_ua
        & (F.col("_field") != "crawl-delay")
        & (F.col("_grp") >= 1)
    ).select(
        "host",
        F.col("_grp").alias("_g"),
        F.col("_field").alias("rule_type"),
        F.col("_value").alias("pattern"),
        "line_no",
    ).filter(F.col("pattern") != "")
    rule_rows = (
        rules.join(agents, ["host", "_g"])
        .select(
            "host",
            "agent",
            "rule_type",
            "pattern",
            pattern_regex(F.col("pattern")).alias("pattern_regex"),
        )
        .distinct()
    )
    members = agents.select(
        "host",
        "agent",
        F.lit("member").alias("rule_type"),
        F.lit(None).cast("string").alias("pattern"),
        F.lit(None).cast("string").alias("pattern_regex"),
    ).distinct()
    return rule_rows.unionByName(members)


def _grouped_kv(
    robots: DataFrame, host_col: str, text_col: str
) -> DataFrame:
    """Shared parse core: ``(host, line_no, _field, _value, _grp)``
    for the group-scoped robots fields (``user-agent`` / ``allow`` /
    ``disallow`` / ``crawl-delay``), group ids assigned by the
    RFC 9309 gaps-and-islands rule — a group starts at each ua line
    whose retained predecessor is not a ua line. Including
    ``crawl-delay`` in the retained set means a delay line between
    two ua runs TERMINATES the first run (the python robotparser
    behavior): the delay belongs to the preceding agents, and the
    next ua line opens a fresh group."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")
        ).alias("line_no", "_raw"),
    )
    # strip comments + whitespace; classify
    clean = F.trim(F.regexp_replace(F.col("_raw"), r"#.*$", ""))
    kv = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract(clean, r"^([^:]+):", 1))).alias(
            "_field"
        ),
        F.trim(F.regexp_extract(clean, r"^[^:]+:(.*)$", 1)).alias("_value"),
    ).filter(
        F.col("_field").isin(
            "user-agent", "allow", "disallow", "crawl-delay"
        )
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("_field") == "user-agent"
    starts = F.when(
        is_ua & (F.lag("_field").over(w) != "user-agent"), 1
    ).when(is_ua & F.lag("_field").over(w).isNull(), 1).otherwise(0)
    return kv.withColumn("_grp", F.sum(starts).over(w))


def _group_agents(grouped: DataFrame) -> DataFrame:
    """Distinct ``(host, _g, agent)`` membership rows of a
    :func:`_grouped_kv` frame."""
    return (
        grouped.filter(F.col("_field") == "user-agent")
        .select(
            "host",
            F.col("_grp").alias("_g"),
            F.lower(F.col("_value")).alias("agent"),
        )
        .distinct()
    )


def robots_crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Advisory ``Crawl-delay`` extraction (non-standard — RFC 9309
    deliberately omits it — but declared by a large share of real
    robots files and honored by most non-Google crawlers): per host
    the effective delay for ``agent`` in integer milliseconds,
    ``(host, crawl_delay_ms)``. Group selection is the gate's
    group-EXISTENCE rule (the caller's agent when any of the host's
    groups names it, else the ``*`` groups); within the selected
    groups the MINIMUM declared delay wins (most conservative —
    a file declaring both 5 and 10 for overlapping agents is obeyed
    at 5). Values must be non-negative numbers (``10``, ``2.5``);
    unparseable declarations drop. Hosts with no applicable
    declaration are ABSENT — the scheduler supplies its own default
    (:func:`~cybersecurity_miw_spark.operators.linkgraph.
    fetch_schedule` ``default_delay_ms``).

    Plan: the shared line-explode + host-window group pass, one
    (host, group) join to agents, one host-key min agg — host-roster
    bounded throughout, broadcast-able like the rules table."""
    agent_l = str(agent).lower()
    grouped = _grouped_kv(robots, host_col, text_col)
    agents = _group_agents(grouped)
    vals = grouped.filter(
        (F.col("_field") == "crawl-delay")
        & (F.col("_grp") >= 1)
        & F.col("_value").rlike(r"^[0-9]+(\.[0-9]+)?$")
    ).select(
        "host",
        F.col("_grp").alias("_g"),
        (F.col("_value").cast("double") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("_ms"),
    )
    has_specific = (
        agents.filter(F.col("agent") == agent_l)
        .select("host")
        .distinct()
        .withColumn("_has", F.lit(True))
    )
    eff = (
        vals.join(agents, ["host", "_g"])
        .join(has_specific, "host", "left")
        .filter(
            F.when(F.col("_has").isNotNull(), F.col("agent") == agent_l)
            .otherwise(F.col("agent") == "*")
        )
    )
    return eff.groupBy("host").agg(F.min("_ms").alias("crawl_delay_ms"))


def _path_query(url: Column) -> Column:
    """path+query of an absolute URL — the robots match subject.
    A URL with no path matches as '/'."""
    pq = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    return F.when(pq == "", F.lit("/")).otherwise(pq)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    pct_normalize: bool = False,
) -> DataFrame:
    """The gate: every input row plus ``allowed`` (boolean),
    ``matched_rule`` (the winning pattern, NULL when no rule
    matched) and ``matched_type``. Host-keyed join against the
    parsed rules (group selection: the caller's agent when the host
    has such a group, else ``*``), regex prefix match on path+query,
    longest-pattern winner with Allow breaking ties; hosts with no
    robots rules — and URLs matching no rule — are allowed (RFC
    9309 §2.3.1).

    Plan: one host-key join (rules side is hosts×rules-bounded —
    broadcast-able for any real crawl), one regex filter, one
    max-of-struct per URL, one left join back. The per-row regex is
    a column (not a literal), evaluated by the same RE2-class engine
    on both sides of the oracle.

    ``pct_normalize`` (r18): apply RFC 3986 §6.2.2 percent
    normalization (urlcurate.pct_normalize_url) to BOTH the rule
    patterns and the URL's path+query before matching — the
    normalization RFC 9309 §2.2.2 allows, so ``Disallow: /%7Eadmin``
    gates ``/~admin`` and vice versa. Safe for the pattern language:
    the metachars ``*`` and ``$`` are reserved octets, which the
    normalizer never decodes INTO (``%2A``/``%24`` stay encoded), so
    normalization cannot create a wildcard or anchor. The longest-
    match length and ``matched_rule`` then use the NORMALIZED
    pattern (documented — both sides of a tie normalize alike). Off
    by default: the default gate matches raw octets, the
    python-robotparser behavior the reference-model suite pins."""
    agent_l = str(agent).lower()
    # Group EXISTENCE (any row — including the rule-less 'member'
    # markers parse_robots emits) decides selection, per RFC 9309
    # §2.2.1: a rule-less specific group still wins over '*'.
    has_specific = (
        rules.filter(F.col("agent") == agent_l)
        .select("host")
        .distinct()
        .withColumn("_has", F.lit(True))
    )
    eff = (
        rules.join(has_specific, "host", "left")
        .filter(
            F.when(F.col("_has").isNotNull(), F.col("agent") == agent_l)
            .otherwise(F.col("agent") == "*")
        )
        .filter(F.col("rule_type").isin("allow", "disallow"))
        .select("host", "rule_type", "pattern", "pattern_regex")
    )
    from cybersecurity_miw_spark.operators import urlcurate

    if pct_normalize:
        eff = eff.withColumn(
            "pattern", urlcurate.pct_normalize_url(F.col("pattern"))
        ).withColumn("pattern_regex", pattern_regex(F.col("pattern")))

    u = urls.withColumn("_host", urlcurate.url_host(F.col(url_col)))
    pq = _path_query(F.col(url_col))
    if pct_normalize:
        pq = urlcurate.pct_normalize_url(pq)
    matched = (
        u.select(url_col, "_host", pq.alias("_pq"))
        .join(eff, u["_host"] == eff["host"])
        .filter(F.expr("_pq rlike pattern_regex"))
        .groupBy(url_col)
        .agg(
            F.max(
                F.struct(
                    F.length("pattern").alias("_len"),
                    # allow sorts above disallow at equal length
                    (F.col("rule_type") == "allow").alias("_a"),
                    F.col("pattern").alias("p"),
                    F.col("rule_type").alias("t"),
                )
            ).alias("_w")
        )
        .select(
            url_col,
            (F.col("_w._a")).alias("_allowed"),
            F.col("_w.p").alias("matched_rule"),
            F.col("_w.t").alias("matched_type"),
        )
    )
    return u.drop("_host").join(matched, url_col, "left").select(
        *urls.columns,
        F.coalesce("_allowed", F.lit(True)).alias("allowed"),
        "matched_rule",
        "matched_type",
    )


def crawl_allowed_urls(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """One-call politeness gate: parse the fetched robots bodies and
    keep only the allowed URLs — the frontier post-filter
    (linkgraph.crawl_frontier → this → the fetcher)."""
    rules = parse_robots(robots, host_col, text_col)
    gated = robots_allowed(urls, rules, agent, url_col)
    return gated.filter(F.col("allowed")).drop(
        "allowed", "matched_rule", "matched_type"
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` declarations from robots.txt bodies (RFC 9309
    §2.6 / sitemaps.org: the line is legal anywhere in the file,
    outside any group): one ``(host, sitemap_url)`` row per
    declaration — the crawl-discovery seeds the frontier fetches
    first. One line explode, no exchange beyond the dedup."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")
        ).alias("_raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("_raw"), r"#.*$", ""))
    return (
        lines.select(
            "host",
            F.lower(F.trim(F.regexp_extract(clean, r"^([^:]+):", 1))).alias(
                "_f"
            ),
            F.trim(F.regexp_extract(clean, r"^[^:]+:(.*)$", 1)).alias(
                "sitemap_url"
            ),
        )
        .filter((F.col("_f") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("host", "sitemap_url")
        .distinct()
    )


def parse_sitemaps(
    sitemaps: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """Parse fetched sitemap XML bodies (sitemaps.org protocol): one
    row per ``<loc>`` with ``(sitemap_url, loc, kind)`` — ``kind`` is
    ``'sitemap'`` for ``<sitemapindex>`` children (fetch those next,
    recursively) and ``'url'`` for ``<urlset>`` page entries (seed
    the frontier). XML entities in locs decode through the bounded
    named set (``&amp;`` in query strings is mandatory XML escaping);
    surrounding whitespace/CDATA trims. One regexp extract + one
    explode — corpus-linear, no exchange."""
    from cybersecurity_miw_spark.operators.htmlextract import ENTITY_MAP

    body = F.coalesce(F.col(body_col), F.lit(""))
    kind = F.when(
        body.rlike(r"(?is)<\s*sitemapindex"), F.lit("sitemap")
    ).otherwise(F.lit("url"))
    locs = F.regexp_extract_all(
        body, F.lit(r"(?is)<loc[^>]*>\s*(?:<!\[CDATA\[)?([^<\]]+)"), 1
    )
    out = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        kind.alias("kind"),
        F.explode(locs).alias("loc"),
    )
    loc = F.trim(F.col("loc"))
    for ent, ch in ENTITY_MAP:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return out.select("sitemap_url", loc.alias("loc"), "kind").filter(
        F.col("loc") != ""
    )
