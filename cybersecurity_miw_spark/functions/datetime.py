"""Date/time parsing and bucketing.

The reference parses date fields with strptime(``date_format``) (or
unix epoch seconds when date_format == "unix") and re-formats them into
a *bucket string* — day/month/year/hour/minute/second, minute and
second rounded down to a ``processing_offset`` width (reference:
miw/log_format.cc:401-472). Time-typed fields are bucketed purely
textually from HH:MM:SS (miw/log_format.cc:445-472).

Everything here is built-in Spark date/string functions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime → Java DateTimeFormatter fragments (public, documented
# mappings; only the directives the reference's formats use, plus the
# common ones).
# Single-letter Java forms (M, d, H, m, s, D) accept 1-2 digits like
# C strptime's %m/%d/%H/%M/%S/%j — the double-letter forms (MM, dd, …)
# REQUIRE zero-padding and silently fail "1/1/1971 0:00:00"
# (hypothesis-found parity bug; real logs are often unpadded).
_STRPTIME_MAP = {
    # single 'y' parses 1+ digits: glibc %Y consumes 1-4 digits and
    # happily returns year 201 for "201", while Java "yyyy" demands 4
    # at parse time (golden: test_spark_parses_short_years; year 0
    # agrees too — Spark parses it prolepticly).
    "%Y": "y",
    # %y: parse_date expands the captured 2-digit year to 4 digits
    # with the POSIX pivot (69-99 -> 19xx, 00-68 -> 20xx) because
    # Java's "yy" pivots into 2000-2099 and would put 99 in 2099
    "%y": "yyyy",
    "%m": "M",
    "%d": "d",
    "%H": "H",
    "%M": "m",
    "%S": "s",
    # %b/%B both accept full OR abbreviated names in glibc;
    # parse_date rewrites the captured name to its month NUMBER, so
    # the Java side parses "M" — neither MMM (abbrev-only) nor MMMM
    # (full-only) could take both forms
    "%b": "M",
    "%B": "M",
    "%j": "D",
    "%p": "a",
    # glibc strptime %z takes Z, ±hh, ±hhmm AND ±hh:mm (verified via
    # ctypes in tests/test_datetime_glibc_property.py); Java needs an
    # optional-section chain to accept all four — XXX = ±hh:mm|Z,
    # XX = ±hhmm|Z, X = ±hh|Z; exactly one consumes the offset since
    # the prefix regex guarantees one is present. Offsets beyond
    # ±18:00 (Java ZoneOffset's limit) parse to NULL even though
    # glibc consumes them — documented divergence, same observable
    # as a failed parse.
    "%z": "[XXX][XX][X]",
    "%%": "%",
}


# directives whose glibc parse skips leading whitespace (get_number
# does `while isspace`; %z shares the behavior — probed via ctypes in
# tests/test_datetime_glibc_property.py). %p/%b/%B match strings and
# do NOT skip.
_WS_SKIPPING = frozenset(
    {"%Y", "%y", "%m", "%d", "%H", "%M", "%S", "%j", "%z"}
)


# the C locale's isspace set — deliberately NOT str.isspace(), which
# is Unicode-wide (NBSP, NEL,  ...) and would turn those format
# chars into ASCII whitespace matchers instead of literals
_C_WS = " \t\n\x0b\f\r"


# C-locale month names in glibc's match order: calendar order, full
# name tried before the abbreviation for each month ("May" is both).
_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
# (lowercased name -> month number) pairs in match order, for the
# capture->number rewrite in parse_date
_MONTH_LOOKUP = [
    (name, i + 1)
    for i, full in enumerate(_MONTHS)
    for name in dict.fromkeys([full.lower(), full[:3].lower()])
]
_MONTH_NAME_RE = "(?>(?i:" + "|".join(
    name for name, _ in _MONTH_LOOKUP
) + "))"


def _walk_strptime(fmt: str):
    """Single tokenizer shared by the regex and Java-pattern builders:
    yields ("directive", "%X") / ("ws",) / ("lit", text) / ("fail",).
    A trailing bare '%' yields ("fail",): glibc strptime compares the
    byte after '%' (the NUL terminator) against the input and fails
    unconditionally (probed via ctypes), so the format can never
    match — and naive loops hang on it (review finding)."""
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            if i + 1 >= len(fmt):
                yield ("fail",)
                return
            d = fmt[i : i + 2]
            if d not in _STRPTIME_MAP:
                raise ValueError(f"unsupported strptime directive {d!r} in {fmt!r}")
            yield ("lit", "%") if d == "%%" else ("directive", d)
            i += 2
        elif fmt[i] in _C_WS:
            while i < len(fmt) and fmt[i] in _C_WS:
                i += 1
            yield ("ws",)
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%" and fmt[j] not in _C_WS:
                j += 1
            yield ("lit", fmt[i:j])
            i = j


def strptime_to_java(fmt: str) -> str:
    """Convert a strptime pattern to the Java DateTimeFormatter pattern
    parse_date applies to the NORMALIZED prefix: the regex carve
    captures each directive's consumed text and parse_date reassembles
    the captures joined by single spaces (literals and format
    whitespace drop out on both sides), so this emits directive
    patterns joined by single spaces. Normalization is what buys
    value parity for glibc's quirky consumption: adjacent numerics
    ("%Y%m%d" on "20130105" → "2013 01 05"), whitespace skips
    (syslog's "Jan  7" → "Jan 7"), and blocked short reads ("%H" on
    "30" → "3") all become unambiguous for the Java parse."""
    out: list[str] = []
    for tok in _walk_strptime(fmt):
        if tok[0] == "directive":
            out.append(_STRPTIME_MAP[tok[1]])
        elif tok[0] == "fail":
            # never matched by the regex side; pattern is unreachable
            return "'unreachable'"
    return " ".join(out)


# strptime → prefix-matching regex fragments: C strptime consumes the
# pattern and IGNORES any trailing text in the input ("11/30/2012
# 23:05:12" parses fine with "%m/%d/%Y"). Spark's to_timestamp needs a
# full match, so the matching prefix is extracted first.
# Numeric fragments encode glibc get_number()'s exact behavior
# (property-tested against libc): digits are consumed greedily while
# val*10 <= max (up to the width), then the directive FAILS — no
# backtracking — if the value is out of [min, max]. So "%H" on "30"
# consumes just "3" (30>23 blocks the second digit) while "24" fails
# outright (2 accepts a second digit, 24 > 23). Each alternation
# lists: full-width in-range values, then shorter reads that glibc's
# blocking rule permits, with negative lookaheads where a following
# digit would force a failing wide read.
# every numeric fragment is an ATOMIC group (?>...): glibc get_number
# commits to what it consumed — "%Y%m" on "2013" fails outright (the
# year takes all four digits, the month finds none) rather than
# backtracking the year to "201" the way a plain regex alternation
# would. Atomic groups are supported by both engines that run these
# patterns (Python 3.11 re for the property tests, Java regex inside
# regexp_extract); no DuckDB oracle embeds them.
_STRPTIME_RE_MAP = {
    "%Y": r"(?>\d{1,4})",
    "%y": r"(?>\d{1,2})",
    "%m": r"(?>0[1-9]|1[0-2]|[2-9]|1(?!\d))",
    "%d": r"(?>0[1-9]|[12]\d|3[01]|[4-9]|[1-3](?!\d))",
    "%H": r"(?>[01]\d|2[0-3]|[3-9]|[0-2](?!\d))",
    "%M": r"(?>[0-5]\d|[6-9]|[0-5](?!\d))",
    "%S": r"(?>[0-5]\d|6[01]|[7-9]|[0-6](?!\d))",
    # glibc %b and %B are IDENTICAL: for each month in calendar order
    # it tries the full name then the abbreviation, case-insensitive,
    # and COMMITS to the first hit (match_string never backtracks —
    # "%be" on "June" fails rather than re-reading the month as
    # "Jun"), hence the atomic group around the ordered alternation.
    "%b": _MONTH_NAME_RE,
    "%B": _MONTH_NAME_RE,
    "%j": r"(?>00[1-9]|0[1-9]\d|[12]\d\d|3[0-5]\d|36[0-6]"
          r"|3[7-9]|[4-9]\d|(?:0[1-9]|[12]\d|3[0-6])(?!\d)|[1-9](?!\d))",
    "%p": r"[APap][Mm]",
    # exactly glibc's %z consumption (property-tested against libc via
    # ctypes in tests/test_datetime_glibc_property.py): Z; or sign +
    # 2-digit hour (glibc does NOT range-check the hour), then minutes
    # as mm or :mm (<= 59 in both), or nothing. glibc COMMITS rather
    # than backtracking: a digit right after ±hh commits to the
    # 4-digit form ("+123" fails, it never re-reads as bare "+12"),
    # and ":" + digit commits to the colon form ("+00:5" and "+00:60"
    # fail while "+00:" and "+00:x" fall back to bare ±hh) — hence the
    # trailing negative lookahead instead of plain alternation.
    "%z": r"(?>[-+]\d{2}(?>[0-5]\d|:[0-5]\d|(?!\d|:\d))|Z)",
    "%%": "%",
}


# the C locale's isspace set — deliberately NOT regex \s, which is
# Unicode-wide in Python and would disagree with both glibc and
# Java's ASCII \s
_WS_RE = r"[ \t\n\x0b\f\r]"


def strptime_prefix_regex(fmt: str) -> str:
    """Regex matching exactly the prefix a C strptime(fmt) consumes:
    numeric directives and %z skip leading whitespace, format
    whitespace matches zero-or-more input whitespace, everything else
    is literal (property-tested against libc via ctypes). Each
    directive's consumption is a CAPTURE group (1-based, in format
    order) so parse_date can reassemble a normalized parse string; a
    trailing bare '%' compiles to a never-matching regex, mirroring
    glibc's unconditional failure."""
    out: list[str] = ["^"]
    for tok in _walk_strptime(fmt):
        if tok[0] == "directive":
            d = tok[1]
            if d in _WS_SKIPPING:
                out.append(_WS_RE + "*")
            out.append("(" + _STRPTIME_RE_MAP[d] + ")")
        elif tok[0] == "ws":
            out.append(_WS_RE + "*")
        elif tok[0] == "lit":
            out.append(re.escape(tok[1]))
        else:  # fail
            out.append(r"(?!)")
    return "".join(out)


def _strptime_group_count(fmt: str) -> int:
    return sum(1 for tok in _walk_strptime(fmt) if tok[0] == "directive")


def parse_date(col: Column, date_format: str) -> Column:
    """Parse a raw token to TimestampType: strptime pattern, or literal
    "unix" = epoch seconds (miw/log_format.cc:405-415). Null-safe under
    ANSI mode: an unparseable token yields NULL (the caller passes the
    raw token through, mirroring the reference's warn-and-keep path at
    miw/log_format.cc:443) instead of aborting the job. Like strptime,
    trailing text after the pattern is ignored (prefix extraction)."""
    if date_format == "unix":
        # timestamp_seconds is timezone-free (epoch → instant), unlike
        # from_unixtime which renders in the session zone.
        return F.timestamp_seconds(F.trim(col).try_cast("long"))
    rx = strptime_prefix_regex(date_format)
    n = _strptime_group_count(date_format)
    if n == 0:
        # directive-less format: nothing to parse a timestamp from
        return F.lit(None).cast("timestamp")
    # reassemble the normalized parse string from the per-directive
    # captures, single-space separated — literals, format whitespace,
    # glibc whitespace skips, and adjacent-numeric boundaries all
    # become unambiguous for the Java pattern (strptime_to_java). On
    # no-match every capture extracts '', the joined string is
    # separators-only, and try_to_timestamp yields NULL.
    trimmed = F.trim(col)
    directives = [
        tok[1] for tok in _walk_strptime(date_format)
        if tok[0] == "directive"
    ]
    if not any(d in ("%b", "%B", "%y") for d in directives):
        # Single-match fast path (r18): no directive needs a per-group
        # rewrite, so the normalized parse string can be assembled by
        # ONE regexp_replace("$1 $2 … $n") over the whole token instead
        # of n regexp_extract calls that each re-run the full prefix
        # match (the flagship parse paid 6 matches per row, the
        # 5-bucket date query 30). The [\s\S]* tail makes the single
        # match consume the trailing text strptime ignores; the rlike
        # guard keeps the no-match path identical — without it an
        # unmatched token would pass through raw and could coincidentally
        # parse under the Java pattern. 2 regex executions per row
        # regardless of n; the capture semantics are unchanged, so the
        # glibc ctypes property suite pins equivalence.
        repl = " ".join(f"${g}" for g in range(1, n + 1))
        normalized = F.when(
            trimmed.rlike(rx),
            F.regexp_replace(trimmed, rx + r"[\s\S]*$", repl),
        ).otherwise(F.lit(""))
        return F.try_to_timestamp(
            normalized, F.lit(strptime_to_java(date_format))
        )
    parts = []
    for g, d in enumerate(directives, start=1):
        part = F.regexp_extract(trimmed, rx, g)
        if d in ("%b", "%B"):
            # rewrite the captured month name (full or abbreviated,
            # any case) to its number so the Java side parses "M";
            # '' (no match) stays '' so the null path is preserved.
            # F.get is 0-based and out-of-range-safe (no ANSI error
            # when array_position returns 0 for the empty capture).
            names = F.array(*[F.lit(n) for n, _ in _MONTH_LOOKUP])
            nums = F.array(
                *[F.lit(str(m)) for _, m in _MONTH_LOOKUP]
            )
            pos = F.array_position(names, F.lower(part))
            part = F.when(
                pos > 0, F.get(nums, (pos - 1).cast("int"))
            ).otherwise(F.lit(""))
        elif d == "%y":
            # POSIX two-digit-year pivot (glibc: 69-99 -> 19xx,
            # 00-68 -> 20xx); Java's own yy pivot disagrees (99 ->
            # 2099), so expand to an explicit 4-digit year here
            yr = part.try_cast("int")
            part = F.when(part == "", F.lit("")).otherwise(
                (F.when(yr <= 68, yr + 2000).otherwise(yr + 1900))
                .cast("string")
            )
        parts.append(part)
    normalized = F.concat_ws(" ", *parts) if n > 1 else parts[0]
    return F.try_to_timestamp(
        normalized, F.lit(strptime_to_java(date_format))
    )


def bucket_date(ts: Column, processing: str, offset: int = 1) -> Column:
    """Re-format a timestamp into the reference's bucket string
    (miw/log_format.cc:416-444):

    day→"Y-m-d", month→"Y-m", year→"Y", hour→"Y-m-dTH:00:00",
    minute→"Y-m-dTH:MM:00" with MM floored to ``offset`` width,
    second→full with SS floored to ``offset``.
    """
    if processing == "day":
        return F.date_format(ts, "yyyy-MM-dd")
    if processing == "month":
        return F.date_format(ts, "yyyy-MM")
    if processing == "year":
        return F.date_format(ts, "yyyy")
    if processing == "hour":
        return F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH"), F.lit(":00:00"))
    if processing == "minute":
        m = _floored(F.minute(ts), offset)
        return F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:"), _pad2(m), F.lit(":00")
        )
    if processing == "second":
        s = _floored(F.second(ts), offset)
        return F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:"), _pad2(s))
    # no processing: day-resolution string (reference default emits the
    # strftime'd value at day granularity, miw/log_format.cc:416-418)
    return F.date_format(ts, "yyyy-MM-dd")


def bucket_time(col: Column, processing: str, offset: int = 1) -> Column:
    """Bucket an HH:MM:SS time string textually
    (miw/log_format.cc:445-472): hour→"HH" (floored to offset,
    zero-padded), minute→"HH:MM" (MM floored, padded; hour token kept
    raw), second→"HH:MM:SS" (SS floored, padded).

    Split parity: the reference tokenizes with a char_separator that
    DROPS empty tokens ("1:2:3:" has 3 parts, "::" has none), so empty
    segments are filtered before the 3-part check; a token without
    exactly 3 non-empty parts passes through chomped (warn-and-keep).
    Number parse is the unsigned-digit prefix of the segment (stoi
    prefix semantics, "12abc"→12); where the reference's stoi would
    THROW (no leading digit) we pass the token through chomped instead
    of aborting — the null-safe analog."""
    chomped = F.trim(col)
    parts = F.filter(F.split(chomped, ":"), lambda x: x != F.lit(""))
    ok = F.size(parts) == 3

    def num(seg: Column) -> Column:
        return F.regexp_extract(seg, r"^\d+", 0).try_cast("int")

    p0, p1, p2 = F.get(parts, 0), F.get(parts, 1), F.get(parts, 2)
    if processing == "hour":
        n = num(p0)
        b = _pad2(_floored(n, offset))
    elif processing == "minute":
        n = num(p1)
        b = F.concat_ws(":", p0, _pad2(_floored(n, offset)))
    elif processing == "second":
        n = num(p2)
        b = F.concat_ws(":", p0, p1, _pad2(_floored(n, offset)))
    else:
        return chomped
    return F.when(ok & n.isNotNull(), b).otherwise(chomped)


def _floored(val: Column, offset: int) -> Column:
    if offset <= 1:
        return val
    return (val / offset).cast("int") * offset


def _pad2(val: Column) -> Column:
    return F.lpad(val.cast("string"), 2, "0")
