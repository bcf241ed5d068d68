"""Match-predicate property: random match specs over random token
lines through the real tokenize+match plan must equal a pure-Python
spec of the documented semantics matrix (positive/negative,
exact/substring, AND/OR, key-implies-AND, contains-ALL for positive
substring AND)."""

from __future__ import annotations

import os
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cybersecurity_miw_spark.plans.compiler import parse
from cybersecurity_miw_spark.plans.logdef import LogDef
from cybersecurity_miw_spark.sources.text import from_lines

SETTINGS = settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

token = st.text(alphabet=st.sampled_from(list("abcx 1")), min_size=0, max_size=5)
line = st.lists(token, min_size=3, max_size=3).map(",".join)
value = st.text(alphabet=st.sampled_from(list("abc1")), min_size=1, max_size=2)

match_spec = st.fixed_dictionaries(
    {
        "match_str": value,
        "negative": st.booleans(),
        "exact": st.booleans(),
        "logic": st.sampled_from(["and", "or"]),
    }
)


def spec_keep(
    tokens: list[str], specs: list[tuple[int, dict, bool]]
) -> bool:
    """Python twin of match_condition for fields at given positions."""
    and_conds: list[bool] = []
    or_conds: list[bool] = []
    for pos, m, is_key in specs:
        vals = [m["match_str"]]
        tok = tokens[pos].replace('"', "").strip() if pos < len(tokens) else None
        is_and = m["logic"] == "and" or is_key
        if tok is None:
            hit = False
        elif not m["negative"] and not m["exact"] and is_and:
            hit = all(v in tok for v in vals)
        elif m["exact"]:
            hit = tok in vals
        else:
            hit = any(v in tok for v in vals)
        cond = (not hit) if m["negative"] else hit
        (and_conds if is_and else or_conds).append(cond)
    ok = all(and_conds)
    if or_conds:
        ok = ok and any(or_conds)
    return ok


@SETTINGS
@given(
    st.lists(line, min_size=0, max_size=50),
    match_spec,
    match_spec,
    st.booleans(),
)
def test_match_semantics_matrix(spark, lines, m1, m2, second_is_key):
    fmt = {
        "format_name": "m",
        "delims": ",",
        "fields": [
            {"name": "f0", "pos": 0, "type": "string", "match": m1},
            {"name": "f1", "pos": 1, "type": "string",
             "key": second_is_key, "match": m2},
            {"name": "f2", "pos": 2, "type": "string"},
        ],
    }
    ldef = LogDef.from_json(fmt)
    out = parse(from_lines(spark, lines, ldef), ldef)
    got = sorted((r["f0"], r["f1"], r["f2"]) for r in out.collect())

    expected = []
    for ln in lines:
        if ln.strip() == "":
            continue
        toks = re.findall(r"[^,]+", ln)
        if len(toks) < 3:
            continue
        specs = [(0, m1, False), (1, m2, second_is_key)]
        if spec_keep(toks, specs):
            expected.append(tuple(t.replace('"', "").strip() for t in toks[:3]))
    assert got == sorted(expected)
