"""Format compiler: LogDef -> DataFrame pipeline.

This is the heart of the engine. The reference runs a fixed 4-phase
physical plan (split → map/parse → reduce/merge → sort,
metis/application.cc:278-339); here the same semantics are *declared*
as one DataFrame plan and Catalyst/Tungsten choose the physical
strategy — whole-stage codegen for the parse/filter, partial hash
aggregation for the reduce, range-partitioned sort for the ordering,
AQE for shuffle sizing (replacing the reference's sampling-based
reduce-task predictor, metis/predictor.hh:40-78).

Stages:

1. tokenize   — regexp_extract_all token array (P1/P2/P3)
2. match      — row predicates on raw tokens (F1-F6), BEFORE
                projection so Catalyst can push the cheap ones down
3. project    — typed/derived per-field columns (P4-P16)
4. aggregate  — groupBy(keys) + algebraic aggs + ratio (A1-A12)
5. finalize   — id/logs/format_name/std_date_dt + ordering (§2.6, O1)

Scale notes (100 TB design):

* Steps 1-3 are a single narrow stage — no shuffle until the groupBy.
* The only shuffle is the aggregation exchange on the group keys;
  every aggregate here is algebraic, so map-side partial aggregation
  bounds the shuffle volume by the number of distinct groups per task,
  not the input size.
* Heavy-tailed composite keys (e.g. date_hour_user in proxy logs) are
  handled by AQE skew handling plus, for `union`/`union_count` fields
  with pathological groups, the optional `two-phase` strategy which
  pre-reduces on (keys, value) — the classic salting-free histogram.
* No Python UDFs anywhere: the whole plan is JVM expressions inside
  WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cybersecurity_miw_spark.functions.strings import token_pattern
from cybersecurity_miw_spark.operators.aggregate import aggregate
from cybersecurity_miw_spark.operators.derive import TOKENS_COL, project_fields
from cybersecurity_miw_spark.operators.matching import apply_matches
from cybersecurity_miw_spark.plans.logdef import LogDef
from cybersecurity_miw_spark.sources.text import LINE_COL


def tokenize_lines(df: DataFrame, ldef: LogDef, keep_raw: bool = False) -> DataFrame:
    """line DataFrame (column ``value``) → token-array DataFrame; with
    ``keep_raw`` the original line rides along as ``_raw`` (reference
    -store_content, miw/log_format.cc:596-597)."""
    pattern = token_pattern(ldef.delims, ldef.quotechar)
    cols = [
        F.regexp_extract_all(F.col(LINE_COL), F.lit(pattern), 0).alias(TOKENS_COL)
    ]
    if keep_raw:
        cols.append(F.col(LINE_COL).alias("_raw"))
    return df.select(*cols)


def parse(df: DataFrame, ldef: LogDef, keep_raw: bool = False) -> DataFrame:
    """Tokenize + match-filter + typed projection (no aggregation)."""
    toks = tokenize_lines(df, ldef, keep_raw)
    toks = apply_matches(toks, ldef)
    return project_fields(toks, ldef, passthrough=("_raw",) if keep_raw else ())


def compile_pipeline(
    df: DataFrame,
    ldef: LogDef,
    union_count_strategy: str = "two-phase",
) -> DataFrame:
    """Full pipeline: lines → grouped/aggregated result (unordered;
    sinks apply the final ordering)."""
    return aggregate(parse(df, ldef), ldef, union_count_strategy)
