"""Property-test the quote-aware tokenizer (P1/P2/P3) against a
behavioral model of the reference's re-join algorithm
(miw/log_format.cc:121-173): boost char_separator runs + a quote
accumulator where Q opens only at run START, closes only at run END,
intermediate delimiters are preserved, and an unterminated open token
flushes at end-of-line.

The model reproduces the algorithm faithfully INCLUDING its byte
offset bookkeeping (pos += len + 1 per emitted token), which assumes
exactly one delimiter per token boundary; with consecutive delimiters
ahead of an open quote the reference re-reads stale offsets and drops
or corrupts the rejoined delimiters. The property suite therefore
generates single-delimiter boundaries (where the reference is
well-defined) and the divergence itself is pinned by an explicit
golden below.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cybersecurity_miw_spark.functions.strings import token_pattern

DELIMS = " \t"
Q = '"'


def reference_tokenize(s: str, delims: str = DELIMS, q: str = Q) -> list[str]:
    """Python behavioral model of log_format::tokenize
    (miw/log_format.cc:121-173), pos arithmetic included."""
    runs = [r for r in re.split("[" + re.escape(delims) + "]", s) if r]
    tokens: list[str] = []
    tmp = ""
    has_quote = False
    pos = 0
    for item in runs:
        begin = False
        if not has_quote and item[0] == q:
            begin = True
            tmp += item
            has_quote = True
        if has_quote:
            if not begin:
                while (
                    pos + len(tmp) < len(s)
                    and s[pos + len(tmp)] in delims
                ):
                    tmp += s[pos + len(tmp)]
                tmp += item
            if item[-1] == q:
                item = tmp
                tmp = ""
                has_quote = False
        if not has_quote:
            tokens.append(item)
            pos += len(item) + 1
    if tmp:
        tokens.append(tmp)
    return tokens


def intent_tokenize(s: str, delims: str = DELIMS, q: str = Q) -> list[str]:
    """The reference algorithm with ACCURATE byte offsets: identical
    to :func:`reference_tokenize` wherever the reference is
    well-defined (single-delimiter boundaries ahead of each quote
    open) and preserves the true intermediate delimiters where the
    reference's pos arithmetic drifts. This is the semantics
    token_pattern implements on ALL inputs."""
    tokens: list[str] = []
    runs = list(
        re.finditer("[^" + re.escape(delims) + "]+", s)
    )
    tmp = ""
    open_from = -1  # start offset of the accumulating quoted token
    for m in runs:
        item = m.group(0)
        if open_from < 0 and item[0] == q:
            open_from = m.start()
        if open_from >= 0:
            tmp = s[open_from : m.end()]
            if item[-1] == q:
                tokens.append(tmp)
                tmp = ""
                open_from = -1
        else:
            tokens.append(item)
    if tmp:
        tokens.append(tmp)
    return tokens


def regex_tokenize(s: str, delims: str = DELIMS, q: str = Q) -> list[str]:
    return [m.group(0) for m in re.finditer(token_pattern(delims, q), s)]


# --- properties -----------------------------------------------------------

_RUN_CHARS = st.text(alphabet='ab"x/.', min_size=1, max_size=6)


@settings(max_examples=1000, deadline=None)
@given(runs=st.lists(_RUN_CHARS, min_size=0, max_size=8),
       trailing=st.sampled_from(["", " "]))
def test_single_delim_boundaries_match_reference(runs, trailing):
    """Arbitrary runs (quotes anywhere: stray, unterminated, opening,
    closing, lone) joined by single delimiters — the regime where the
    reference's offset bookkeeping is exact."""
    s = " ".join(runs) + trailing
    assert regex_tokenize(s) == reference_tokenize(s), s


@settings(max_examples=1000, deadline=None)
@given(s=st.text(alphabet='ab" \tx', max_size=24))
def test_arbitrary_inputs_match_intent_model(s):
    """On FULLY arbitrary input (any delimiter runs, quotes anywhere)
    the regex implements the intent model — the reference algorithm
    with accurate offsets."""
    assert regex_tokenize(s) == intent_tokenize(s), repr(s)


@settings(max_examples=500, deadline=None)
@given(s=st.text(alphabet="ab \t", max_size=20))
def test_no_quote_inputs_match_reference_any_delim_runs(s):
    """Without a quote-opening run the offset arithmetic is unused:
    arbitrary consecutive-delimiter runs must agree too."""
    assert regex_tokenize(s) == reference_tokenize(s), repr(s)


@settings(max_examples=500, deadline=None)
@given(
    prefix=st.lists(st.text(alphabet="abx", min_size=1, max_size=4),
                    min_size=0, max_size=3),
    quoted_runs=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4),
        min_size=0, max_size=3,
    ),
    inner_delims=st.lists(st.sampled_from([" ", "\t", "  ", " \t "]),
                          min_size=4, max_size=4),
    close=st.booleans(),
)
def test_multi_delim_runs_inside_quote_match_reference(
    prefix, quoted_runs, inner_delims, close
):
    """CONSECUTIVE delimiters are exact in the reference while a
    quote is OPEN (the inner while-loop walks them byte-accurately),
    provided every boundary before the open is single-delimiter and
    nothing follows the close (any later token would see the drifted
    offset — the documented divergence class)."""
    s = " ".join(prefix)
    if s:
        s += " "
    s += '"q'  # open (never self-closes: len>1, ends non-Q)
    for r, d in zip(quoted_runs, inner_delims):
        s += d + r  # runs over [ab]: never close mid-way
    if close:
        s += inner_delims[-1] + 'x"'
    assert regex_tokenize(s) == reference_tokenize(s), repr(s)


# --- pinned divergence + adversarial goldens ------------------------------


def test_documented_divergence_consecutive_delims_before_quote():
    """'a  "b c"': the reference's stale byte offset drops the space
    inside the rejoined token ('"bc"'); this engine preserves the
    actual text. Pinned so the divergence is visible, not silent."""
    s = 'a  "b c"'
    assert reference_tokenize(s) == ["a", '"bc"']
    assert regex_tokenize(s) == ["a", '"b c"']


def test_adversarial_goldens_match_reference():
    cases = [
        'plain "quoted token" tail',
        '"unterminated stays open to the end',
        '" a b',               # lone Q self-closes
        '"" empty-quote',
        'a"b c"d',             # mid-run quotes: TWO bare tokens
        'ab" cd"',             # run-final quotes without Q-start: bare
        '"a b"c d"',           # closes at run END ('b"c' does not end it)
        '"x"y" z"',            # open run not self-closed (ends y")...
        'a "b\tc" d',
        '"',
    ]
    for s in cases:
        assert regex_tokenize(s) == reference_tokenize(s), repr(s)


def test_spark_java_regex_agrees_with_python_model(spark):
    """Bridge Java regexp_extract_all to the Python model on the
    adversarial corpus (lookaheads + lazy quantifiers must behave
    identically in both engines)."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.strings import tokenize

    cases = [
        'plain "quoted token" tail',
        '"unterminated stays open to the end',
        '" a b',
        'a"b c"d',
        '"a b"c d"',
        'a "b\tc" d',
        'GET /path?q="v w" HTTP/1.1',
        '"Mozilla/5.0 (X11; Linux x86_64)" 200 -',
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["line"])
    got = [
        list(r["toks"])
        for r in df.select(
            tokenize(F.col("line"), DELIMS, Q).alias("toks")
        ).collect()
    ]
    assert got == [reference_tokenize(s) for s in cases]
