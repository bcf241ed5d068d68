"""Distributed BPE tokenizer training and application (the merge-
learning algorithm of Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the step that turns
a curated corpus into an actual subword vocabulary.

Scale shape: training iterates ``n_merges`` rounds; each round is ONE
pair-count aggregation over the distinct-word vocabulary (weighted by
word frequency, so corpus size only matters once, in the initial
word-count agg) plus ONE argmax row collected to the driver. The
corpus-sized work happens exactly once; every later round runs over
the vocabulary table (≪ corpus), re-segmented in place with a single
regexp pass per merge. Lineage is truncated every few rounds so the
plan stays shallow regardless of merge count.

Merging uses the space-separated symbol-string representation:
"hello" → "h e l l o"; applying merge (x, y) is one
``regexp_replace`` with non-consuming boundaries
(``(?<= )x y(?= )`` on a space-padded string), which performs exactly
the leftmost non-overlapping merge pass the reference algorithm
defines. Lookbehind keeps this Spark-side only — RE2 lacks it, so the
op is golden-verified against a pure-Python reference model rather
than SQL-oracled (see tests/test_bpe.py).

Ties break (count desc, pair lexicographically asc) so the learned
merge sequence is deterministic.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_JAVA_REPL_SPECIALS = {"\\": r"\\", "$": r"\$"}


def _esc_repl(s: str) -> str:
    return "".join(_JAVA_REPL_SPECIALS.get(c, c) for c in s)


def _merge_pattern(x: str, y: str) -> str:
    return f"(?<= ){_re.escape(x)} {_re.escape(y)}(?= )"


def to_symbols(word: Column) -> Column:
    """'hello' → 'h e l l o' (space-separated single-char symbols)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def _adjacent_pairs(sym_str: Column) -> Column:
    s = F.split(sym_str, " ")
    n = F.size(s)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("x"),
                F.element_at(s, i + 1).alias("y"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) frequency table — the one corpus-sized aggregation."""
    words = df.select(
        F.explode(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+",
            )
        ).alias("w")
    ).filter(F.length("w") > 0)
    return words.groupBy("w").agg(F.count("*").alias("n"))


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns
    the ordered merge list [(x, y), ...]. Stops early when the best
    remaining pair occurs fewer than ``min_pair_count`` times."""
    vocab = word_vocab(df, text_col).select(
        to_symbols(F.col("w")).alias("s"), "n"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            vocab.select(F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "n")
            .groupBy("p.x", "p.y")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        x, y = top[0]["x"], top[0]["y"]
        merges.append((x, y))
        vocab = vocab.select(
            F.trim(
                F.regexp_replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    _merge_pattern(x, y),
                    _esc_repl(x + y),
                )
            ).alias("s"),
            "n",
        )
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def apply_merges(sym: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply an ordered merge list to a symbol string; returns the
    array of subword tokens. Nested regexp passes — one per merge —
    all inside whole-stage codegen."""
    c = F.concat(F.lit(" "), sym, F.lit(" "))
    for x, y in merges:
        c = F.regexp_replace(c, _merge_pattern(x, y), _esc_repl(x + y))
    return F.split(F.trim(c), " ")


def tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """Subword-tokenize each document with a learned merge list:
    per-word symbol split → merge passes → flattened token array.
    Pure expressions, shuffle-free, linear in text length. Null text
    tokenizes to an empty array (same null-as-empty contract as the
    rest of the corpus-filter family)."""
    words = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    staged = df.select(id_col, words.alias("_w"))
    toks = F.flatten(
        F.transform(
            F.filter("_w", lambda w: F.length(w) > 0),
            lambda w: apply_merges(to_symbols(w), merges),
        )
    )
    return staged.select(id_col, toks.alias(out_col))
