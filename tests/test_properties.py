"""Property-based tests: the parse primitives against independent
pure-Python spec implementations (state-machine tokenizer, C-style
atoi/atof, textual time bucketing) over hypothesis-generated inputs.

Each property evaluates one batched Spark job per hypothesis example
set (examples ride in a single DataFrame with an index column), so the
suite stays fast despite JVM round-trips.
"""

from __future__ import annotations

import os
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cybersecurity_miw_spark.functions.datetime import bucket_time
from cybersecurity_miw_spark.functions.strings import tokenize
from cybersecurity_miw_spark.operators.derive import atof, atoi

# soak with PROP_EXAMPLES=50 for deeper runs; 8 keeps CI fast
SETTINGS = settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# printable-ascii text without the surrogate/control noise that would
# test Python's codec layer rather than our operators
line_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


def run_expr(spark, values: list[str], expr_fn):
    """Evaluate expr_fn(F.col('v')) over the values in one job,
    preserving input order."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, v string"
    )
    rows = df.select("i", expr_fn(F.col("v")).alias("out")).collect()
    return [r["out"] for r in sorted(rows, key=lambda r: r["i"])]


# ---- spec implementations ----


def spec_atoi(s: str) -> int:
    m = re.match(r"^[-+]?\d+", s.strip())
    if not m:
        return 0
    v = int(m.group(0))
    # our column is a long; overflow behaves like try_cast -> null -> 0
    return v if -(2**63) <= v < 2**63 else 0


def spec_atof(s: str) -> float:
    m = re.match(r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?", s.strip())
    return float(m.group(0)) if m else 0.0


def spec_tokenize(s: str, delims: str, quotechar: str = "") -> list[str]:
    """Intent-model tokenizer (reference quote-rejoin semantics with
    accurate offsets — see tests/test_tokenizer_reference_model.py,
    which validates it against a faithful port of
    miw/log_format.cc:121-173): Q opens only at run START, closes at
    the first run ENDING with Q, intermediate delimiters are kept,
    an unterminated open token runs to the last non-delimiter char."""
    from tests.test_tokenizer_reference_model import intent_tokenize

    if not quotechar:
        return [t for t in re.split("[" + re.escape(delims) + "]", s) if t]
    return intent_tokenize(s, delims, quotechar)


def spec_bucket_time(s: str, processing: str, offset: int) -> str:
    """Reference semantics (miw/log_format.cc:445-472): empty segments
    dropped before the 3-part check (char_separator), unsigned stoi
    prefix per segment, passthrough where the reference warns (or its
    stoi would throw)."""
    chomped = s.strip()
    parts = [p for p in chomped.split(":") if p != ""]
    if len(parts) != 3:
        return chomped

    def floored(tok: str) -> str | None:
        m = re.match(r"^\d+", tok)
        if not m:
            return None
        v = int(m.group(0))
        if offset > 1:
            v = int(v / offset) * offset
        return str(v).zfill(2)

    h, m, sec = parts
    if processing == "hour":
        b = floored(h)
    elif processing == "minute":
        fm = floored(m)
        b = None if fm is None else f"{h}:{fm}"
    else:
        fs = floored(sec)
        b = None if fs is None else f"{h}:{m}:{fs}"
    return chomped if b is None else b


# ---- properties ----


@SETTINGS
@given(st.lists(line_text, min_size=1, max_size=60))
def test_atoi_matches_spec(spark, values):
    got = run_expr(spark, values, atoi)
    assert got == [spec_atoi(v) for v in values]


@SETTINGS
@given(st.lists(line_text, min_size=1, max_size=60))
def test_atof_matches_spec(spark, values):
    got = run_expr(spark, values, atof)
    assert got == [spec_atof(v) for v in values]


@SETTINGS
@given(st.lists(line_text, min_size=1, max_size=60))
def test_tokenizer_plain_matches_state_machine(spark, values):
    got = run_expr(spark, values, lambda c: tokenize(c, ", "))
    assert got == [spec_tokenize(v, ", ") for v in values]


quoted_text = st.text(
    alphabet=st.sampled_from(list("ab,\" ;x")), max_size=30
)


@SETTINGS
@given(st.lists(quoted_text, min_size=1, max_size=60))
def test_tokenizer_quoted_matches_state_machine(spark, values):
    got = run_expr(spark, values, lambda c: tokenize(c, ",;", '"'))
    assert got == [spec_tokenize(v, ",;", '"') for v in values]


time_like = st.one_of(
    st.builds(
        lambda h, m, s: f"{h}:{m:02d}:{s:02d}",
        st.integers(0, 23),
        st.integers(0, 59),
        st.integers(0, 59),
    ),
    line_text,
)


@SETTINGS
@given(
    st.lists(time_like, min_size=1, max_size=60),
    st.sampled_from(["hour", "minute", "second"]),
    st.sampled_from([1, 2, 5, 15]),
)
def test_bucket_time_matches_spec(spark, values, processing, offset):
    got = run_expr(
        spark, values, lambda c: bucket_time(c, processing, offset)
    )
    assert got == [spec_bucket_time(v, processing, offset) for v in values]


# strptime prefix parse: valid datetimes with arbitrary trailing text
# parse to the datetime (C strptime ignores the tail); garbage -> NULL

date_like = st.one_of(
    st.builds(
        lambda dt, tail: (dt, dt.strftime("%m/%d/%Y %H:%M:%S") + tail),
        st.datetimes(
            min_value=__import__("datetime").datetime(1971, 1, 1),
            max_value=__import__("datetime").datetime(2099, 12, 31),
        ).map(lambda d: d.replace(microsecond=0)),
        line_text.filter(lambda t: not t[:1].isdigit()),
    ),
    line_text.map(lambda s: (None, s)),
)


@SETTINGS
@given(st.lists(date_like, min_size=1, max_size=60))
def test_strptime_prefix_parse_matches_spec(spark, pairs):
    from cybersecurity_miw_spark.functions.datetime import parse_date

    values = [s for _, s in pairs]
    got = run_expr(
        spark, values, lambda c: parse_date(c, "%m/%d/%Y %H:%M:%S")
    )
    for (expected_dt, s), out in zip(pairs, got):
        if expected_dt is not None:
            assert out == expected_dt, (s, out)
        else:
            # plain text: either unparseable (NULL) or it happens to
            # start with a valid datetime prefix — verify via spec
            import datetime as _dt
            import re as _re

            m = _re.match(
                r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{1,2}:\d{1,2}", s.strip()
            )
            if not m:
                assert out is None, (s, out)


# date bucketing: valid dates bucket per strftime; unparseable tokens
# (including regex-prefix-valid but calendar-invalid like 2/30/2020)
# pass through raw (the reference warns and keeps, log_format.cc:443)

import datetime as _dt


def spec_bucket_date_day(s: str) -> str:
    m = re.match(r"^(\d{1,2})/(\d{1,2})/(\d{4}) (\d{1,2}):(\d{1,2}):(\d{1,2})", s.strip())
    if m:
        try:
            d = _dt.datetime(
                int(m.group(3)), int(m.group(1)), int(m.group(2)),
                int(m.group(4)), int(m.group(5)), int(m.group(6)),
            )
            if all(x <= y for x, y in ((d.hour, 23), (d.minute, 59), (d.second, 59))):
                return d.strftime("%Y-%m-%d")
        except ValueError:
            pass
    return s.strip()


maybe_date = st.one_of(
    st.builds(
        lambda mo, dy, yr, h, mi, sec, tail: f"{mo}/{dy}/{yr} {h}:{mi:02d}:{sec:02d}{tail}",
        st.integers(1, 13), st.integers(1, 32), st.integers(1971, 2099),
        st.integers(0, 24), st.integers(0, 59), st.integers(0, 59),
        st.sampled_from(["", " extra", "Z"]),
    ),
    line_text,
)


@SETTINGS
@given(st.lists(maybe_date, min_size=1, max_size=60))
def test_bucket_date_day_matches_spec(spark, values):
    from cybersecurity_miw_spark.functions.datetime import bucket_date, parse_date

    def expr(c):
        ts = parse_date(c, "%m/%d/%Y %H:%M:%S")
        return F.coalesce(bucket_date(ts, "day"), F.trim(c))

    got = run_expr(spark, values, expr)
    assert got == [spec_bucket_date_day(v) for v in values]
