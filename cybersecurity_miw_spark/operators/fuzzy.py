"""Fuzzy (edit-distance) join: match strings across two tables with
``levenshtein(a, b) <= k`` WITHOUT the all-pairs cross join — the
entity-resolution / log-field-reconciliation primitive (host names
with typos, rule names across product versions, usernames with
suffixes).

Scalable shape: q-gram blocking → exact refine.

The q-gram filter (Gravano et al., the standard approximate-string-
join bound): if ``ed(a, b) <= k`` then a and b share at least
``max(|a|,|b|) - q + 1 - k*q`` q-grams. Whenever the LONGER string
has at least ``q*(k+1)`` characters that bound is >= 1, so every true
match shares at least one q-gram — exploding distinct q-grams on both
sides and equi-joining on the gram finds ALL such pairs (a uniform
hash join; popular grams fan out but never all-pairs). Pairs where
BOTH strings are shorter than ``q*(k+1)`` can evade the filter, so
the short-string minority joins via a guarded broadcast cross of the
two (tiny) short sets. The union of both candidate streams is then
refined with the exact ``levenshtein`` predicate — no false
negatives by construction (property-tested against the naive
quadratic model), no false positives after the refine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hard cap on each side's short-string set: the cross join over the
# sub-q*(k+1)-character minority must stay broadcast-sized
MAX_SHORT = 100_000


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """All (left row, right row) pairs with
    ``levenshtein(left_col, right_col) <= max_distance``, plus the
    distance. Every left/right column survives (alias collisions are
    the caller's problem). Null strings match nothing.

    Row multiplicity is preserved: each side is tagged with a
    DETERMINISTIC row id — md5 of the full row content plus an
    occurrence number (row_number over the content hash) — before gram
    explosion, so the candidate-pair ``distinct()`` collapses only the
    gram fan-out, never duplicate input rows: two identical left rows
    each pair with a matching right row. Content-derived ids matter
    for correctness, not just reproducibility: the gram branch and the
    short-string branch evaluate the tagged frames independently, and
    a partition-layout-dependent id (``monotonically_increasing_id``)
    could tag the same row differently in the two streams, so a pair
    qualifying via BOTH paths would survive the union's ``distinct()``
    twice. Identical rows are interchangeable, so the content tag is
    stable as a multiset across recomputations and task retries.
    (``_lid``/``_rid`` are reserved column names for the tags and are
    dropped from the output.)"""
    k, short_len = max_distance, q * (max_distance + 1)

    def content_tag(df: DataFrame, tag: str) -> DataFrame:
        h = F.md5(
            F.to_json(
                F.struct(*df.columns), {"ignoreNullFields": "false"}
            )
        )
        w = Window.partitionBy(h).orderBy(F.lit(1))
        return df.withColumn(
            tag,
            F.struct(
                h.alias("h"), F.row_number().over(w).alias("n")
            ),
        )

    # staged: the gram branch, the short-string branch, and the
    # MAX_SHORT guard counts all read the tagged frames — persist them
    # once so the to_json+md5 window (a full-table shuffle+sort) runs
    # one time per side, and cross-branch tag consistency holds by
    # construction rather than by the identical-rows argument alone
    from cybersecurity_miw_spark.operators.dedup import staged

    left = staged(content_tag(left, "_lid"))
    right = staged(content_tag(right, "_rid"))

    def gram_explode(df, col, side):
        c = F.col(col)
        idx = F.sequence(
            F.lit(1), F.greatest(F.length(c) - (q - 1), F.lit(0))
        )
        grams = F.array_distinct(
            F.transform(idx, lambda i: c.substr(i, F.lit(q)))
        )
        return df.select(
            F.struct("*").alias(side), F.explode(grams).alias("_g")
        )

    lg = gram_explode(left.where(F.col(left_col).isNotNull()), left_col, "_lrow")
    rg = gram_explode(right.where(F.col(right_col).isNotNull()), right_col, "_rrow")
    gram_pairs = (
        lg.join(rg, "_g")
        .select("_lrow", "_rrow")
        .distinct()
    )

    # both-short pairs can share zero grams yet be within k edits
    ls = left.where(
        F.col(left_col).isNotNull() & (F.length(left_col) < short_len)
    )
    rs = right.where(
        F.col(right_col).isNotNull() & (F.length(right_col) < short_len)
    )
    # one guard job for both sides (was two limit().count() actions —
    # each materialized its staged frame in its own Spark job)
    guard_counts = dict(
        ls.limit(MAX_SHORT + 1)
        .select(F.lit("left").alias("_side"))
        .unionByName(
            rs.limit(MAX_SHORT + 1).select(F.lit("right").alias("_side"))
        )
        .groupBy("_side")
        .count()
        .collect()
    )
    for side in ("left", "right"):
        if guard_counts.get(side, 0) > MAX_SHORT:
            raise ValueError(
                f"{side} side has >{MAX_SHORT} strings shorter than "
                f"{short_len} chars — the short-string cross join would "
                "not be broadcast-sized; raise q or pre-bucket the data"
            )
    short_pairs = ls.select(F.struct("*").alias("_lrow")).crossJoin(
        # bcast-bound: rs <= MAX_SHORT rows (guarded by the raise above)
        F.broadcast(rs.select(F.struct("*").alias("_rrow")))
    )

    cand = gram_pairs.unionByName(short_pairs).distinct()
    dist = F.levenshtein(
        F.col(f"_lrow.{left_col}"), F.col(f"_rrow.{right_col}")
    )
    out = (
        cand.where(dist <= k)
        .select("_lrow.*", "_rrow.*", dist.alias("edit_distance"))
        .drop("_lid", "_rid")
    )
    return out
