"""Property-test strptime_prefix_regex against the REAL C library.

The engine's parity claim is "the prefix regex consumes exactly what C
strptime(fmt) consumes" (the reference parses dates with strptime,
miw/log_format.cc:401-415). Rather than trusting a hand model of
glibc, these tests call libc's strptime via ctypes and assert the
regex's match length equals glibc's consumed byte count — both ways:
if glibc fails, the regex must not match either.

Known, documented divergence (functions/datetime.py): offsets beyond
Java ZoneOffset's ±18:00 are consumed identically but parse to NULL
in Spark while glibc returns a struct tm — same observable as a
failed parse downstream, and outside any real-world timezone.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cybersecurity_miw_spark.functions.datetime import (
    strptime_prefix_regex,
    strptime_to_java,
)

_libc = ctypes.CDLL(ctypes.util.find_library("c"))


class _Tm(ctypes.Structure):
    _fields_ = [
        (n, ctypes.c_int)
        for n in (
            "tm_sec", "tm_min", "tm_hour", "tm_mday", "tm_mon",
            "tm_year", "tm_wday", "tm_yday", "tm_isdst",
        )
    ] + [("tm_gmtoff", ctypes.c_long), ("tm_zone", ctypes.c_char_p)]


_libc.strptime.restype = ctypes.c_char_p
_libc.strptime.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(_Tm),
]


def glibc_consumed(s: str, fmt: str) -> int | None:
    """Bytes of ``s`` consumed by glibc strptime(fmt), None on fail."""
    t = _Tm()
    rest = _libc.strptime(s.encode(), fmt.encode(), ctypes.byref(t))
    return None if rest is None else len(s.encode()) - len(rest)


def regex_consumed(s: str, fmt: str) -> int | None:
    m = re.match(strptime_prefix_regex(fmt), s)
    return None if m is None else len(m.group(0))


# --- %z corners -----------------------------------------------------------

_OFFSET_LIKE = st.one_of(
    # structured: sign + digits with optional colon placement
    st.tuples(
        st.sampled_from("+-"),
        st.integers(0, 30),
        st.sampled_from([":", ""]),
        st.integers(0, 99),
    ).map(lambda t: f"{t[0]}{t[1]:02d}{t[2]}{t[3]:02d}"),
    st.tuples(st.sampled_from("+-"), st.integers(0, 30)).map(
        lambda t: f"{t[0]}{t[1]:02d}"
    ),
    # raw noise around the alphabet glibc inspects
    st.text(alphabet="+-:0123456789Zz ", min_size=0, max_size=8),
)

# NUL would truncate the C string inside the ctypes harness (a harness
# artifact, not a semantics case), so keep it out of generated input
_NO_NUL = st.text(max_size=4).filter(lambda x: "\x00" not in x)


@settings(max_examples=400, deadline=None)
@given(s=_OFFSET_LIKE, suffix=_NO_NUL)
def test_z_prefix_matches_glibc(s, suffix):
    inp = s + suffix
    assert regex_consumed(inp, "%z") == glibc_consumed(inp, "%z")


# --- %p corners -----------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    s=st.one_of(
        st.sampled_from(["AM", "PM", "am", "pm", "Am", "aM", "Pm", "pM"]),
        st.text(alphabet="APMapm xz", min_size=0, max_size=4),
    ),
    suffix=_NO_NUL,
)
def test_p_prefix_matches_glibc(s, suffix):
    inp = s + suffix
    assert regex_consumed(inp, "%p") == glibc_consumed(inp, "%p")


# --- composite formats the reference's logs use ---------------------------

@settings(max_examples=200, deadline=None)
@given(
    h=st.integers(0, 12), mi=st.integers(0, 59),
    ampm=st.sampled_from(["AM", "PM", "am", "pm"]),
    off=st.sampled_from(["+0000", "+05:30", "-08", "Z", "+24:00", "junk"]),
    garbage=st.text(max_size=6).filter(lambda x: "\x00" not in x),
)
def test_composite_format_consumption(h, mi, ampm, off, garbage):
    fmt = "%H:%M %p %z"
    inp = f"{h}:{mi:02d} {ampm} {off}{garbage}"
    assert regex_consumed(inp, fmt) == glibc_consumed(inp, fmt)


# --- Spark parse parity for the carved prefix -----------------------------

def test_spark_parse_of_z_forms(spark):
    """All four glibc %z forms parse to the same instant in Spark; the
    >±18h form is consumed but parses NULL (documented)."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    fmt = "%Y-%m-%d %H:%M:%S %z"
    rx = strptime_prefix_regex(fmt)
    rows = [
        ("2012-11-30 23:05:12 +0000", 1354316712),
        ("2012-11-30 23:05:12 Z", 1354316712),
        ("2012-11-30 23:05:12 +05:30", 1354316712 - 5 * 3600 - 30 * 60),
        ("2012-11-30 23:05:12 +0530", 1354316712 - 5 * 3600 - 30 * 60),
        ("2012-11-30 23:05:12 -08", 1354316712 + 8 * 3600),
        ("2012-11-30 23:05:12 +24:00", None),  # Java ZoneOffset limit
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["raw"])
    got = (
        df.select(
            "raw",
            parse_date(
                F.regexp_extract("raw", rx, 0), fmt
            ).cast("long").alias("epoch"),
        )
        .collect()
    )
    for (raw, want), r in zip(rows, got):
        assert re.match(rx, raw), raw
        assert r.epoch == want, (raw, r.epoch, want)


# --- whitespace skipping (numeric directives + format whitespace) ---------

@settings(max_examples=300, deadline=None)
@given(
    pad1=st.text(alphabet=" \t", max_size=3),
    pad2=st.text(alphabet=" \t", max_size=3),
    d=st.integers(1, 31),
    h=st.integers(0, 23),
    garbage=st.text(alphabet=" 0123456789abcZ+-:", max_size=5),
)
def test_whitespace_skip_matches_glibc(pad1, pad2, d, h, garbage):
    """Numeric directives skip leading whitespace; format whitespace
    matches any amount including none (syslog's space-padded day)."""
    fmt = "%d %H"
    inp = f"{pad1}{d}{pad2} {h}{garbage}"
    assert regex_consumed(inp, fmt) == glibc_consumed(inp, fmt)


def test_spark_parses_syslog_space_padded_day(spark):
    """The canonical real-world case: syslog pads day-of-month with a
    space ("Jan  7"), which C strptime accepts via whitespace skip —
    the engine must parse it, not null it."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    fmt = "%b %d %H:%M:%S"
    rows = [
        ("Jan  7 05:06:12", "01-07 05:06:12"),
        ("Jan 17 05:06:12", "01-17 05:06:12"),
        ("Feb  1 23:59:01", "02-01 23:59:01"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["raw"])
    got = df.select(
        F.date_format(
            parse_date(F.col("raw"), fmt), "MM-dd HH:mm:ss"
        ).alias("out")
    ).collect()
    assert [r.out for r in got] == [want for _, want in rows]


# --- numeric directive consumption bounds ---------------------------------

@settings(max_examples=600, deadline=None)
@given(
    d=st.sampled_from(["%Y", "%y", "%m", "%d", "%H", "%M", "%S", "%j"]),
    s=st.one_of(
        st.integers(0, 9999).map(str),
        st.integers(0, 99).map(lambda n: f"{n:02d}"),
        st.integers(0, 999).map(lambda n: f"{n:03d}"),
        st.text(alphabet="0123456789", min_size=0, max_size=5),
    ),
    suffix=st.text(alphabet="x 0123456789", max_size=3),
)
def test_numeric_consumption_matches_glibc(d, s, suffix):
    """glibc get_number: greedy digits while val*10 <= max (up to the
    width), then hard fail when out of range — '%H' on '30' consumes
    '3', on '24' fails entirely. The regex encodes exactly this."""
    inp = s + suffix
    assert regex_consumed(inp, d) == glibc_consumed(inp, d), (d, inp)


# --- adjacent numeric directives: commit, don't backtrack -----------------

@settings(max_examples=400, deadline=None)
@given(
    fmt=st.sampled_from(["%Y%m", "%y%m", "%H%M", "%Y%m%d", "%d%H", "%m%d"]),
    s=st.text(alphabet="0123456789", min_size=0, max_size=7),
    suffix=st.text(alphabet="x ", max_size=2),
)
def test_adjacent_numeric_directives_match_glibc(fmt, s, suffix):
    """glibc commits each directive's consumption — "%Y%m" on "2013"
    fails (the year takes all four digits) instead of backtracking the
    year to "201"; the atomic groups in the regex must do the same."""
    inp = s + suffix
    assert regex_consumed(inp, fmt) == glibc_consumed(inp, fmt), (fmt, inp)


# --- review-finding regressions -------------------------------------------

def test_trailing_percent_never_matches_and_never_hangs():
    """glibc fails unconditionally on a trailing bare '%' (it compares
    the NUL terminator against input); the builders must terminate and
    produce a never-matching carve instead of hanging."""
    assert glibc_consumed("5x", "%H%") is None
    assert regex_consumed("5x", "%H%") is None
    assert strptime_to_java("%H%") == "'unreachable'"


def test_unicode_whitespace_in_format_is_literal():
    """NBSP in a format is a literal to glibc's C locale, not
    whitespace — the regex must match it literally, not as [ \\t...]."""
    fmt = "%d\xa0%H"
    inp = "7\xa08"
    # glibc matches the NBSP byte-for-byte (consumes all 4 UTF-8
    # bytes); the regex matches it as one literal char (3 chars)
    assert glibc_consumed(inp, fmt) == len(inp.encode())
    assert regex_consumed(inp, fmt) == 3
    assert regex_consumed("7 8", fmt) is None  # plain space != NBSP


def test_spark_parses_adjacent_numeric_directives(spark):
    """Value parity for glibc's committed consumption: "%Y%m%d" packs
    all digits together; the capture-group normalization re-separates
    them so Spark parses the same instant glibc does."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    rows = [
        ("20130105", "%Y%m%d", "2013-01-05 00:00:00"),
        # time-only formats fill the epoch date (glibc leaves a zeroed
        # struct tm; Spark defaults missing fields the same way)
        ("305", "%H%M", "1970-01-01 03:05:00"),
        ("2013010512", "%Y%m%d%H", "2013-01-05 12:00:00"),
        ("991231", "%y%m%d", "1999-12-31 00:00:00"),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], ["raw", "fmt"]
    )
    for raw, fmt, want in rows:
        got = (
            df.filter(F.col("raw") == raw)
            .select(
                F.date_format(
                    parse_date(F.col("raw"), fmt), "yyyy-MM-dd HH:mm:ss"
                ).alias("out")
            )
            .head()["out"]
        )
        assert got == want, (raw, fmt, got, want)


def test_two_digit_year_posix_pivot(spark):
    """%y follows glibc's POSIX pivot: 69-99 -> 19xx, 00-68 -> 20xx
    (Java's native yy would put 99 in 2099)."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    rows = [("99/12/31", "1999"), ("68/01/01", "2068"), ("69/06/15", "1969")]
    df = spark.createDataFrame([(r[0],) for r in rows], ["raw"])
    got = df.select(
        F.date_format(parse_date(F.col("raw"), "%y/%m/%d"), "yyyy").alias("y")
    ).collect()
    assert [r.y for r in got] == [want for _, want in rows]


# --- %b/%B month names (full + abbreviated, case-insensitive) -------------

_MONTH_FRAGMENTS = st.one_of(
    st.sampled_from([
        "January", "Jan", "June", "Jun", "July", "Jul", "May",
        "September", "Sep", "Sept", "Dec", "December", "Januar",
        "Junex", "Januaryfoo", "ma", "XYZ", "",
    ]),
    st.text(alphabet="JanuaryFebMchpilgstOcov", min_size=0, max_size=10),
)


@settings(max_examples=400, deadline=None)
@given(
    name=_MONTH_FRAGMENTS,
    casing=st.sampled_from(["as-is", "upper", "lower"]),
    d=st.sampled_from(["%b", "%B"]),
    tail=st.text(alphabet=" 0123456789abce", max_size=4),
)
def test_month_name_consumption_matches_glibc(name, casing, d, tail):
    """glibc %b == %B: full name tried before abbreviation per month,
    case-insensitive, committed (no backtracking into the name when a
    following literal fails)."""
    if casing == "upper":
        name = name.upper()
    elif casing == "lower":
        name = name.lower()
    inp = name + tail
    for fmt in (d, d + " %d", d + "e"):
        assert regex_consumed(inp, fmt) == glibc_consumed(inp, fmt), (
            inp, fmt
        )


def test_spark_parses_full_and_abbreviated_month_names(spark):
    """'%B %d' and '%b %d' must both take 'January 07' AND 'Jan 07'
    (the ADVICE r5 case: MMM-only consumed 'Jan' and derailed)."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    rows = ["January 07", "Jan 07", "september 30", "SEP 30", "May 1"]
    want = ["01-07", "01-07", "09-30", "09-30", "05-01"]
    df = spark.createDataFrame([(r,) for r in rows], ["raw"])
    for fmt in ("%b %d", "%B %d"):
        got = [
            r.out
            for r in df.select(
                F.date_format(
                    parse_date(F.col("raw"), fmt), "MM-dd"
                ).alias("out")
            ).collect()
        ]
        assert got == want, (fmt, got)


@settings(max_examples=200, deadline=None)
@given(y=st.integers(1, 9999), tail=st.text(alphabet=" abc-", max_size=3))
def test_short_year_consumption_matches_glibc(y, tail):
    inp = f"{y}{tail}"
    assert regex_consumed(inp, "%Y") == glibc_consumed(inp, "%Y")


def test_spark_parses_short_years(spark):
    """%Y on 1-3 digit years must yield the year glibc returns (Java
    'yyyy' would demand 4 digits and null them); even year 0 agrees
    (Spark's 'y' parses it prolepticly, glibc returns tm_year -1900)."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    rows = [("201", "0201"), ("5", "0005"), ("1999", "1999"), ("0", "0000")]
    df = spark.createDataFrame([(r[0],) for r in rows], ["raw"])
    got = [
        r.out
        for r in df.select(
            F.date_format(parse_date(F.col("raw"), "%Y"), "yyyy").alias(
                "out"
            )
        ).collect()
    ]
    assert got == [want for _, want in rows]
