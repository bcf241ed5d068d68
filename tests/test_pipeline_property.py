"""End-to-end pipeline property: random log lines through the real
format-compiler plan (tokenize → project → aggregate) must equal a
pure-Python reference reducer implementing the documented semantics
(A1 key, A2 logs, A3 count, A4 sum, A5 max, A8 sorted union, A12
first=min, P1 tokenize-collapse-empties, P4 drop-short-rows, P7 atoi).

Only exactly-representable aggregations are used (ints and string
orderings) so the comparison is equality, not approx.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cybersecurity_miw_spark.plans.compiler import compile_pipeline
from cybersecurity_miw_spark.plans.logdef import LogDef
from cybersecurity_miw_spark.sources.text import from_lines

FMT = {
    "format_name": "prop",
    "delims": ",",
    "fields": [
        {"name": "k", "pos": 0, "type": "string", "key": True},
        {"name": "s", "pos": 1, "type": "int",
         "aggregated": True, "aggregation": "sum"},
        {"name": "mx", "pos": 2, "type": "int",
         "aggregated": True, "aggregation": "max"},
        {"name": "u", "pos": 3, "type": "string",
         "aggregated": True, "aggregation": "union"},
        {"name": "c", "pos": 4, "type": "string",
         "aggregated": True, "aggregation": "count"},
    ],
}

# token alphabet: letters/digits/sign/space (no delimiter, no quote —
# the tokenizer properties cover those separately)
token = st.text(
    alphabet=st.sampled_from(list("ab1 2-x")), min_size=0, max_size=6
)
# a line is 0..7 tokens joined with "," — short lines must be dropped
line = st.lists(token, min_size=0, max_size=7).map(",".join)


def spec_atoi(s: str) -> int:
    m = re.match(r"^[-+]?\d+", s.strip())
    if not m:
        return 0
    v = int(m.group(0))
    return v if -(2**63) <= v < 2**63 else 0


def spec_pipeline(lines: list[str]) -> dict[str, tuple]:
    """Reference reducer → {id: (logs, s, mx, union, c_count)}."""
    groups: dict[str, list] = {}
    for ln in lines:
        if ln.strip() == "":
            continue  # S8 empty-line filter
        toks = [t for t in re.findall(r"[^,]+", ln)]
        if len(toks) < 5:
            continue  # P4 drop-short-rows
        vals = [t.strip() for t in toks]  # P5/P6 (no quotes in alphabet)
        k = vals[0]
        g = groups.setdefault(k, [0, 0, None, set(), 0])
        g[0] += 1                            # logs
        g[1] += spec_atoi(vals[1])           # sum
        mx = spec_atoi(vals[2])              # max
        g[2] = mx if g[2] is None else max(g[2], mx)
        g[3].add(vals[3])                    # union (dedup, sorted later)
        g[4] += 1                            # count of non-null values
    return {
        k: (g[0], g[1], g[2], sorted(g[3]), g[4]) for k, g in groups.items()
    }


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(line, min_size=0, max_size=80))
def test_pipeline_matches_reference_reducer(spark, lines):
    ldef = LogDef.from_json(FMT)
    out = compile_pipeline(from_lines(spark, lines, ldef), ldef)
    got = {
        r["k"]: (r["logs"], r["s"], r["mx"], list(r["u"]), r["c_count"])
        for r in out.collect()
    }
    expected = spec_pipeline(lines)
    assert got == expected
    # id column parity: composite key equals the key value here
    ids = {r["k"]: r["id"] for r in out.collect()}
    assert all(ids[k] == k for k in ids)
