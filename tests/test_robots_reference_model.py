"""Property check: the Spark robots gate vs an INDEPENDENT Python
reference model of RFC 9309 (written straight from the module
contract, sharing no code with the operator) over seeded-random
robots files and URLs — the tokenizer-reference-model discipline:
two implementations, one spec, exact agreement on every generated
case including the degenerate ones (empty files, rules before
groups, wildcard/$ collisions, equal-length allow/disallow ties)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import robots as rb

AGENTS = ["*", "mybot", "otherbot"]
SEGS = ["/a", "/b", "/a/b", "/p", "/p/q", "/x.pdf", "/a*", "/p*q",
        "/a$", "/p/q$", "/*.pdf$", "/"]


def _ref_pattern_match(pattern: str, pq: str) -> bool:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
    return re.search(rx, pq) is not None


def _ref_allowed(groups, agent: str, url: str):
    """groups: list of (agents:set, rules:[(type, pattern)])."""
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)([^#]*)", url)
    host = re.sub(r"\.+$", "", re.sub(r"^.*@", "", m.group(1)).split(":")[0].lower())
    pq = m.group(2) or "/"
    # effective rules for this host's file: specific-agent groups if
    # any mention the agent, else the star groups
    has_specific = any(agent in g[0] for g in groups)
    if has_specific:
        picked = [g for g in groups if agent in g[0]]
    else:
        picked = [g for g in groups if "*" in g[0]]
    rules = [(t, p) for g in picked for (t, p) in g[1] if p != ""]
    matches = [
        (len(p), t == "allow", p, t)
        for (t, p) in rules
        if _ref_pattern_match(p, pq)
    ]
    if not matches:
        return True, None
    win = max(matches)
    return win[1], win[2]


def _gen_robots(rng: random.Random):
    """A random robots.txt plus its parsed group structure."""
    lines, groups = [], []
    # maybe junk before any group
    if rng.random() < 0.3:
        lines.append(f"Disallow: {rng.choice(SEGS)}")
    for _ in range(rng.randint(1, 3)):
        agents = {rng.choice(AGENTS) for _ in range(rng.randint(1, 2))}
        for a in sorted(agents):
            lines.append(f"User-agent: {a}")
        rules = []
        for _ in range(rng.randint(0, 4)):
            t = rng.choice(["allow", "disallow"])
            p = rng.choice(SEGS + [""])
            rules.append((t, p))
            lines.append(f"{t.capitalize()}: {p}")
        if rng.random() < 0.5:
            lines.append("")
        groups.append((agents, rules))
    return "\n".join(lines), groups


def test_gate_agrees_with_reference_model(spark):
    rng = random.Random(170817)
    robots_rows, expected, url_rows = [], {}, []
    for h in range(12):
        host = f"h{h}.example"
        txt, groups = _gen_robots(rng)
        robots_rows.append((host, txt))
        for u in range(8):
            path = rng.choice(
                ["/a", "/a/b", "/a/bc", "/p/q", "/p/qq", "/x.pdf",
                 "/x.pdfz", "/", "/b?x=1", "/p/q?d=.pdf"]
            )
            url = f"http://{host}{path}#frag{u}" if rng.random() < 0.2 \
                else f"http://{host}{path}"
            # the gate matches path+query; fragments are not part of
            # the subject — strip for the reference the same way the
            # operator's _path_query regex does (it stops at '#')
            url_rows.append((url,))
            allowed, rule = _ref_allowed(groups, "mybot", url)
            expected[url] = (allowed, rule)
    # a host with no robots file at all: always allowed
    url_rows.append(("http://norobots.example/any",))
    expected["http://norobots.example/any"] = (True, None)

    rules = rb.parse_robots(
        spark.createDataFrame(robots_rows, "host string, robots_txt string")
    )
    urls = spark.createDataFrame(url_rows, "url string")
    got = {
        r["url"]: (r["allowed"], r["matched_rule"])
        for r in rb.robots_allowed(urls, rules, agent="mybot").collect()
    }
    diffs = {
        u: (got[u], expected[u]) for u in expected if got[u] != expected[u]
    }
    assert not diffs, f"{len(diffs)} disagreements, first: " + str(
        list(diffs.items())[:3]
    )
    assert len(got) == len(expected)