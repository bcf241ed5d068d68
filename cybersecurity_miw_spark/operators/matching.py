"""Row-level match predicates (the WHERE clause).

The reference's `match` message supports positive/negative,
exact/substring, AND/OR matching against a literal or a file-backed
value set (reference: miw/log_definition.proto:24-31, applied in
miw/log_format.cc:277-399 with the final OR-survival check at
:566-568). Semantics matrix:

* positive + logic "and" (or the field is a key): the row is KEPT only
  if the token matches the set (exact membership / substring of any
  element) — miw/log_format.cc:330-367.
* positive + logic "or": the row is kept iff AT LEAST ONE of the
  or-fields matched — miw/log_format.cc:566-568.
* negative: inverted — an "and"-negative drops matching rows; an
  "or"-negative contributes "did not match" to the OR pool
  (miw/log_format.cc:369-398).

Small sets compile to `isin` / one RLIKE alternation (JVM-side, pushes
down); large file-backed sets should use the broadcast semi/anti join
helpers below instead — same semantics, broadcast-hash execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cybersecurity_miw_spark.functions.strings import contains_all, contains_any
from cybersecurity_miw_spark.operators.derive import raw_token
from cybersecurity_miw_spark.plans.logdef import LogDef


def match_condition(ldef: LogDef) -> Column | None:
    """Build the single row-filter Column for all match specs of a
    format, or None when the format has no matches."""
    and_conds: list[Column] = []
    or_conds: list[Column] = []
    for f in ldef.fields:
        m = f.match
        if m is None:
            continue
        values = m.values(ldef.base_dir)
        if not values:
            continue
        tok = raw_token(f)
        is_and = m.logic == "and" or f.key
        if not m.negative and not m.exact and is_and:
            # positive substring AND-match: the token must contain ALL
            # values (the reference bails on the first non-contained
            # value, miw/log_format.cc:341-353)
            hit = contains_all(tok, values)
        else:
            hit = contains_any(tok, values, exact=m.exact)
        cond = ~hit if m.negative else hit
        # key fields match with implicit AND (miw/log_format.cc:348,374)
        if is_and:
            and_conds.append(cond)
        else:
            or_conds.append(cond)
    conds = list(and_conds)
    if or_conds:
        acc = or_conds[0]
        for c in or_conds[1:]:
            acc = acc | c
        conds.append(acc)
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def apply_matches(df: DataFrame, ldef: LogDef) -> DataFrame:
    cond = match_condition(ldef)
    return df if cond is None else df.filter(cond)


# ---- scale path: set membership as broadcast semi/anti join ----


def semi_join_filter(
    df: DataFrame,
    col: str,
    values_df: DataFrame,
    negative: bool = False,
) -> DataFrame:
    """Keep (or drop) rows whose ``col`` appears in ``values_df``'s
    single column — the reference's match_file as a broadcast
    semi/anti join (miw/log_format.cc:283-311 loads the file once into
    a shared hash set; broadcast is the cluster analog)."""
    vcol = values_df.columns[0]
    how = "left_anti" if negative else "left_semi"
    return df.join(
        # bcast-bound: match-set values = logdef config file lines
        #   (config-bounded)
        F.broadcast(values_df.select(F.col(vcol).alias(col)).distinct()),
        on=col,
        how=how,
    )
