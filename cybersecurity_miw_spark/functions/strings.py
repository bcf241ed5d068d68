"""String helpers: tokenizer pattern construction, quote stripping,
substring-set matching.

The reference tokenizes each line on a SET of delimiter characters with
boost::char_separator — consecutive delimiters collapse and empty
tokens are dropped (reference: miw/log_format.cc:121-173), and tokens
opening with the quote character are re-joined until the closing quote
(miw/log_format.cc:138-172). Both behaviors compile to a single
`regexp_extract_all` over a token regex — JVM-side, codegen-friendly,
no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _char_class(chars: str) -> str:
    """A regex character class matching any of ``chars``."""
    return "[" + "".join(re.escape(c) for c in chars) + "]"


def token_pattern(delims: str, quotechar: str = "") -> str:
    """Regex whose successive matches are the line's tokens.

    * no quotechar: a token is a maximal run of non-delimiter chars —
      `[^D]+` — which drops empty tokens exactly like the reference's
      char_separator (miw/log_format.cc:121-137).
    * with quotechar Q: a quoted region `Q[^Q]*Q` binds tighter than
      delimiter splitting, so `"Mozilla/5.0 (X11; ...)"` stays one
      token (miw/log_format.cc:138-172). A token may mix quoted and
      bare segments (`a"b c"d`), hence the outer `(?:...)+`.
    """
    neg = "[^" + "".join(re.escape(c) for c in set(delims + quotechar)) + "]"
    if quotechar:
        q = re.escape(quotechar)
        quoted = f"{q}[^{q}]*{q}"
        return f"(?:{quoted}|{neg})+"
    return f"{neg}+"


def tokenize(col: Column, delims: str, quotechar: str = "") -> Column:
    """Split a line column into an array of tokens (reference P1/P2/P3
    semantics: delimiter-set split, empty-token collapse, quote
    re-joining)."""
    return F.regexp_extract_all(col, F.lit(token_pattern(delims, quotechar)), 0)


def strip_quotes(col: Column) -> Column:
    """Remove every double-quote char from a token — the reference does
    this to ALL tokens unconditionally (miw/log_format.cc:272-275)."""
    return F.regexp_replace(col, '"', "")


def chomp(col: Column) -> Column:
    """Trim surrounding whitespace (reference chomp_cpp,
    miw/log_format.cc:79-98)."""
    return F.trim(col)


def contains_any(col: Column, values: list[str], exact: bool = False) -> Column:
    """Membership/substring test against a small value set.

    exact: ``col IN (values)`` (miw/log_format.cc:330-338);
    else: ``col`` contains ANY value as a substring
    (miw/log_format.cc:341-367) — compiled to one RLIKE alternation of
    escaped literals so it stays a single JVM regex evaluation. For
    large sets prefer a broadcast semi-join (operators.matching).
    """
    if not values:
        return F.lit(False)
    if exact:
        return col.isin(values)
    alternation = "|".join(re.escape(v) for v in values)
    return col.rlike(alternation)


def contains_all(col: Column, values: list[str]) -> Column:
    """``col`` contains EVERY value as a substring — the reference's
    positive AND-logic / key-field substring match returns NULL (drops
    the row) on the first non-contained value
    (miw/log_format.cc:341-353)."""
    if not values:
        return F.lit(False)
    cond = col.contains(values[0])
    for v in values[1:]:
        cond = cond & col.contains(v)
    return cond
