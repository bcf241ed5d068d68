"""Corpus-quality filtering for training-data pipelines (Gopher/C4
style): per-document repetition statistics, rule-based keep/drop
flags, within-document repeated-segment removal, and PII redaction.

Beyond the reference surface (the reference engine has no corpus
curation stage); the rule set follows the published Gopher
(Rae et al. 2021, §A1.1) and C4 (Raffel et al. 2020, §2.2) filters.

Scale notes (100 TB): the narrow metrics (`quality_metrics`,
`remove_repeated_lines`, `pii_redact`) are pure per-row expressions —
whole-stage-codegen'd, shuffle-free, trivially parallel. The only
shuffle in the family is `top_ngram_fraction`'s explode→groupBy on
(doc_id, gram), a uniform composite key (doc_id alone is unique, so
no skew is possible); the per-doc reduce is algebraic (max-by) and
map-side combines. An expression-only variant (count each gram by
filtering the gram array per element) would avoid the shuffle but is
O(L²) per document — quadratic in document length is the thing that
does NOT survive 10k-word web documents, so the explode shape is the
scale-correct one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    # null text behaves as empty (coalesce mirrored in every SQL twin)
    return F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")


def _round6(c: Column) -> Column:
    # floor(x*1e6+0.5)/1e6: decimal-half-exact across engines, unlike
    # ROUND (see textstats.quality_score)
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def quality_metrics(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Narrow per-document quality statistics (no shuffle):

    * ``n_words`` — whitespace token count
    * ``mean_word_len`` — mean characters per word
    * ``alpha_word_frac`` — fraction of words containing a letter
    * ``dup_word_frac`` — fraction of word occurrences that repeat an
      earlier occurrence (1 - distinct/total), the cheap repetition
      signal Gopher's duplicate-line family approximates
    """
    w = _words(F.col(text_col))
    staged = df.select(*keep, w.alias("_w"))
    n = F.greatest(F.size("_w"), F.lit(1))
    total_chars = F.aggregate(
        F.transform("_w", F.length), F.lit(0), lambda acc, x: acc + x
    )
    alpha_words = F.size(F.filter("_w", lambda x: x.rlike("[a-z]")))
    return staged.select(
        *keep,
        F.size("_w").alias("n_words"),
        _round6(total_chars / n).alias("mean_word_len"),
        _round6(alpha_words / n).alias("alpha_word_frac"),
        _round6(
            F.lit(1.0) - F.size(F.array_distinct("_w")) / n
        ).alias("dup_word_frac"),
    )


def top_ngram_fraction(
    df: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """Gopher top-n-gram fraction: the share of (normalized) document
    characters covered by the single most frequent word n-gram —
    ``count(top) * len(top) / len(join(words, ' '))``. Ties break to
    the lexicographically LARGEST gram so the result is deterministic
    AND the per-doc reduce stays a single algebraic ``max(struct(c,
    gram))`` — struct comparison orders by count first, then gram,
    identically in Spark and DuckDB.

    Plan: explode n-grams → groupBy(doc_id, gram) count (map-side
    combined) → groupBy(doc_id) max-struct — exactly two exchanges on
    uniform composite keys, linear in document length. (A min-gram
    tie-break would need a second pass over the counted grams plus a
    self-join — measured 7 exchanges vs 2 for this shape.)
    """
    w = _words(F.col(text_col))
    staged = df.select("doc_id", w.alias("_w"))
    nw = F.size("_w")
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_w", i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", "_w")))
    norm_len = F.greatest(F.length(F.concat_ws(" ", "_w")), F.lit(1))
    exploded = staged.select(
        "doc_id", norm_len.alias("_len"), F.explode(grams).alias("gram")
    )
    counted = exploded.groupBy("doc_id", "_len", "gram").agg(
        F.count("*").alias("c")
    )
    top = counted.groupBy("doc_id", "_len").agg(
        F.max(F.struct(F.col("c"), F.col("gram"))).alias("_top")
    )
    return top.select(
        "doc_id",
        F.col("_top.gram").alias("top_gram"),
        F.col("_top.c").alias("top_count"),
        _round6(
            F.col("_top.c") * F.length("_top.gram") / F.col("_len")
        ).alias("top_gram_frac"),
    )


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_word_frac: float = 0.55,
    max_top_bigram_frac: float = 0.10,
) -> DataFrame:
    """Gopher-style rule filter: per-doc metrics plus a boolean
    ``keep``. Thresholds follow the Gopher defaults' spirit, adapted
    to whitespace corpora; all tunable. One shuffle total (the
    top-bigram agg); the metric join is doc_id-to-doc_id, co-hashed
    with it under AQE."""
    m = quality_metrics(df, text_col)
    t = top_ngram_fraction(df, 2, text_col)
    joined = m.join(t.select("doc_id", "top_gram_frac"), "doc_id")
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_gram_frac") <= max_top_bigram_frac)
    )
    return joined.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "dup_word_frac",
        "top_gram_frac",
        keep.alias("keep"),
    )


def remove_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    sep: str = "\n",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Within-document repetition removal (C4 §2.2 drops repeated
    lines; Gopher drops docs dominated by them): keep the FIRST
    occurrence of each line, preserve order, re-join. Pure array
    expressions — ``filter`` with an index lambda testing membership
    in the preceding prefix — so the op is shuffle-free and
    codegen'd; O(L_lines²) per doc in line COUNT (not chars), which
    stays small even for book-length documents."""
    lines = F.split(F.col(text_col), sep)
    staged = df.select(*keep, lines.alias("_l"))
    first_only = F.filter(
        "_l",
        lambda x, i: F.array_position(F.slice("_l", 1, i), x) == 0,
    )
    return staged.select(
        *keep,
        F.array_join(first_only, sep).alias(out_col),
        (F.size("_l") - F.size(first_only)).alias("n_removed"),
    )


# PII patterns: valid and equivalent in both Java regex (Spark) and
# RE2 (DuckDB) — no lookaround, no backreferences.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "longnum": (r"\b[0-9]{9,}\b", "<NUM>"),
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Redact emails, IPv4 addresses, and long digit runs, emitting
    the scrubbed text plus one count column per pattern class.
    Order matters (emails first: an address can embed digit runs);
    counts are taken on the original text. All JVM `regexp_count` /
    `regexp_replace` — shuffle-free, no Python."""
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    red = t
    for name, (pat, repl) in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, repl)
    return df.select(*keep, red.alias(out_col), *counts)


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Statistical language-model quality score (the CCNet-style
    perplexity-proxy filter): train an add-one-smoothed bigram model
    on the corpus itself, then score each document by the mean
    conditional probability of its bigrams under that model. Fluent
    in-domain text scores high; gibberish and boilerplate score low.

    All model arithmetic is INTEGER-exact so the score is bit-stable
    across engines: p_micro(w2|w1) = (1e6 * (c2+1)) div (c1+V) with
    corpus bigram counts c2, unigram occurrence counts c1 and vocab
    size V; the doc score is the mean of p_micro over its bigram
    occurrences (single int/int division, then the usual
    floor-rounding to 6 places).

    Plan: one explode for words, one for bigrams; two count
    aggregations (the model — uniform word keys); two joins of doc
    bigrams against the model (model side is corpus-vocab-sized, tiny
    relative to the corpus, broadcast-able); one final per-doc mean.
    Docs with <2 words have no bigrams and are absent from the
    output."""
    w = _words(F.col(text_col))
    staged = df.select(id_col, w.alias("_w"))
    nw = F.size("_w")
    words = staged.select(id_col, F.explode("_w").alias("w1"))
    bigrams = staged.filter(nw >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), nw - 1),
                lambda i: F.struct(
                    F.element_at("_w", i).alias("w1"),
                    F.element_at("_w", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # the bigram explode feeds BOTH the model build (c2) and the
    # scoring join; persist it so the split+transform+explode runs
    # once (Spark can't ReuseExchange through the lambda)
    from cybersecurity_miw_spark.operators.dedup import staged

    bigrams = staged(bigrams)

    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = words.groupBy("w1").agg(F.count("*").alias("c1"))
    # V collapses to ONE integer on the driver (the IVF-centroid
    # precedent: bounded model-size driver traffic) so the smoothing
    # denominator is a literal — no scalar cross join in the plan
    v = c1.count()

    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select(
            id_col,
            F.expr(f"div(1000000 * (c2 + 1), c1 + {v})").alias("p_micro"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        _round6(
            F.sum("p_micro") / F.count("*") / F.lit(1000000.0)
        ).alias("lm_score"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    max_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Cross-document boilerplate removal (the C4 rule that is NOT
    within-doc dedup): drop every line that appears in more than
    ``max_doc_freq`` distinct documents — cookie banners, nav bars,
    shared footers — and reassemble each document in original line
    order.

    Plan: ONE posexplode of the text column (persisted — it feeds the
    document-frequency count, the anti-join, and the doc roster, and
    re-scanning a 100 TB text column three times would dwarf the agg
    cost) → line document-frequency count (uniform line-hash key) →
    anti-join against the frequent set → per-doc re-assembly with an
    order-preserving sort_array(collect_list(struct(pos, line))).
    Empty documents (all lines boilerplate) come back as empty
    strings, not dropped — the caller decides.
    """
    from cybersecurity_miw_spark.operators.dedup import staged

    split_col = F.split(F.col(text_col), sep)
    lines = staged(
        df.select(
            id_col,
            F.size(split_col).alias("_n"),
            F.posexplode(split_col).alias("pos", "line"),
        )
    )
    doc_freq = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("line")
    )
    kept = lines.join(doc_freq, "line", "left_anti")
    reassembled = (
        kept.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "line"))
            ).alias("_sl")
        )
        .select(
            id_col,
            F.array_join(
                F.transform("_sl", lambda s: s["line"]), sep
            ).alias("clean_text"),
            F.size("_sl").alias("_kept"),
        )
    )
    # roster from the SAME exploded frame (no text re-scan): docs
    # whose every line was boilerplate still appear (empty clean_text)
    n_lines = lines.select(id_col, "_n").distinct()
    return (
        n_lines.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n") - F.coalesce("_kept", F.lit(0))).alias("n_removed"),
        )
    )


# ---- the full Gopher repetition battery (Rae et al. 2021, Table A1) ----

GOPHER_TOP_NGRAM_DEFAULTS = (0.20, 0.18, 0.16)  # n = 2, 3, 4
GOPHER_DUP_NGRAM_DEFAULTS = (0.15, 0.14, 0.13, 0.12, 0.11, 0.10)  # n = 5..10


def _dup_element_fracs(elems: Column) -> tuple[Column, Column]:
    """(dup_frac, dup_char_frac) of a per-row string array — the
    Gopher line/paragraph duplicate measures: an element's occurrences
    beyond its first are duplicates; the char variant weights each by
    its length. Pure array expressions (O(L²) per row in ELEMENT
    count — lines/paragraphs per document, tens not thousands, the
    opposite trade from the gram battery below)."""
    total = F.size(elems)
    distinct = F.size(F.array_distinct(elems))
    dup_frac = F.when(total > 0, (total - distinct) / total).otherwise(
        F.lit(0.0)
    )
    # chars of every non-first occurrence / chars of all occurrences
    idx = F.sequence(F.lit(1), total)
    rep_chars = F.aggregate(
        F.zip_with(
            idx,
            elems,
            lambda i, e: F.when(
                F.array_position(F.slice(elems, 1, (i - 1).cast("int")), e)
                > 0,
                F.length(e),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    all_chars = F.aggregate(
        F.transform(elems, lambda e: F.length(e)),
        F.lit(0),
        lambda a, x: a + x,
    )
    dup_char_frac = F.when(
        all_chars > 0, rep_chars.cast("double") / all_chars
    ).otherwise(F.lit(0.0))
    return dup_frac, dup_char_frac


def gopher_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top_ngram_char_frac: tuple = GOPHER_TOP_NGRAM_DEFAULTS,
    max_dup_ngram_char_frac: tuple = GOPHER_DUP_NGRAM_DEFAULTS,
) -> DataFrame:
    """The COMPLETE within-document repetition battery of Gopher
    Table A1 — the signals :func:`gopher_flags` (word-level) leaves
    out: duplicate line / paragraph fractions (row- and
    char-weighted), top-{2,3,4}-gram char mass, and the char fraction
    COVERED by duplicated {5..10}-grams. Returns one row per doc with
    every metric (rounded micro-exact) plus ``keep`` under the
    paper's default thresholds.

    Metric definitions (engine-exact, integer-derived):

    * lines split on ``\\n``, paragraphs on ``\\n\\n`` (trimmed,
      empties dropped); an element's occurrences beyond the first are
      duplicates, char variants weight by element length;
    * top-n char mass = max over n-grams of count·len(gram) (spaces
      included) / normalized text chars — the max PRODUCT, so no
      tie-break is needed where the paper's "most frequent" is
      ambiguous under count ties;
    * dup-n coverage = chars inside the UNION of word spans of grams
      occurring ≥ 2× in the doc (gaps-and-islands merge — overlapping
      hits never double-count) / normalized text chars, with
      word-length slice sums mapping token spans to chars.

    Plan shape (100 TB): line/paragraph metrics are shuffle-free row
    expressions; the gram battery is ONE posexplode over 9 n values →
    count agg on the uniform (doc, n, gram) key → join back to
    occurrences (occurrence-sized, never pairwise) → one window pass
    per (doc, n) for the islands — the `duplicated_ngram_spans`
    machinery turned within-doc. Quadratic-in-length work appears
    nowhere; the O(L²) element scan runs over LINES, not words."""
    if len(max_top_ngram_char_frac) != 3:
        raise ValueError("max_top_ngram_char_frac must cover n = 2, 3, 4")
    if len(max_dup_ngram_char_frac) != 6:
        raise ValueError("max_dup_ngram_char_frac must cover n = 5..10")

    norm = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    raw = F.coalesce(F.col(text_col), F.lit(""))

    def _elems(sep: str) -> Column:
        return F.filter(
            F.transform(F.split(raw, sep), lambda e: F.trim(e)),
            lambda e: F.length(e) > 0,
        )

    line_f, line_cf = _dup_element_fracs(_elems("\n"))
    para_f, para_cf = _dup_element_fracs(_elems("\n\n"))

    w = F.filter(F.split(norm, r"\s+"), lambda x: F.length(x) > 0)
    # per-doc word-length array `_wl`: built once (one linear
    # transform), then every span-to-chars mapping is a bounded slice
    # sum over it — gram chars sum ≤ 10 elements, island chars sum
    # disjoint ranges totalling ≤ words per (doc, n). NOT a prefix-sum
    # array: aggregate-with-concat copies the accumulator every step
    # (O(words²) time/alloc per doc — ADVICE r15), which a 10k-word
    # web page turns into the task's dominant cost. The slice sums
    # keep total work O(Σn · words) with scalar accumulators only.
    # The per-word hash array `_hw` lets every gram hash be a hash of
    # a LONG slice instead of a built string (measured at the 10x
    # corpus: explode+count 10.8 s -> 7.2 s, full battery 16.7 s ->
    # 15.5 s, SCALE.md r15)
    # pre-partition by the doc key BEFORE the 9-way gram explode: the
    # gram count groupBy (id, n, h), the occurrence join, and the
    # island windows (id, n) all cluster on supersets of {id}, so
    # hash-partitioning the COMPACT doc rows here lets every one of
    # them reuse this exchange — the alternative is Spark exchanging
    # the exploded gram rows (≈ 9·words rows/doc, ~45× the text
    # bytes). Measured at sf0.1: 13 exchanges → see SCALE.md r16.
    base = df.repartition(F.col(id_col)).select(
        F.col(id_col),
        w.alias("_w"),
        line_f.alias("dup_line_frac"),
        line_cf.alias("dup_line_char_frac"),
        para_f.alias("dup_para_frac"),
        para_cf.alias("dup_para_char_frac"),
    ).withColumn(
        "_hw", F.expr("transform(_w, x -> xxhash64(x))")
    ).withColumn(
        "_wl", F.expr("transform(_w, x -> length(x))")
    ).withColumn(
        "_tc",
        (
            F.expr("aggregate(_wl, 0L, (a, x) -> a + x)")
            + F.greatest(F.size("_w") - 1, F.lit(0))
        ).cast("long"),
    )
    from cybersecurity_miw_spark.cache import tracked_persist

    base = tracked_persist(base)

    # one positional explode across all 9 n values; n rides the row.
    # The gram never exists as a string: its identity is
    # xxhash64(slice of the word-hash array) and its char length is a
    # ≤10-element slice sum — the count key only needs identity, so
    # shuffling (hash, len) instead of up-to-10-word strings keeps
    # exchange bytes flat in n. A within-doc collision
    # (≈ grams²/2⁶⁴ per doc) would merge two counts — beyond
    # negligible at any real document length.
    ns = list(range(2, 11))
    gram_rows = base.select(
        id_col,
        "_tc",
        F.explode(F.array(*[F.lit(n) for n in ns])).alias("_n"),
        "_hw",
        "_wl",
    ).select(
        id_col,
        "_tc",
        "_n",
        F.posexplode(
            # sequence(a, b) DESCENDS when b < a, so short docs must
            # take the empty-array branch explicitly
            F.expr(
                "IF(size(_hw) >= _n, "
                "transform(sequence(0, size(_hw) - _n), "
                "i -> named_struct("
                "'h', xxhash64(slice(_hw, i + 1, _n)), "
                "'l', aggregate(slice(_wl, i + 1, _n), 0, "
                "(a, x) -> a + x) + _n - 1)), "
                "array())"
            )
        ).alias("_pos", "_hg"),
    ).select(
        id_col,
        "_tc",
        "_n",
        "_pos",
        F.col("_hg.h").alias("_h"),
        F.col("_hg.l").alias("_len"),
    )
    from cybersecurity_miw_spark.operators.dedup import staged

    gram_rows = staged(gram_rows)
    counted = gram_rows.groupBy(id_col, "_n", "_h").agg(
        F.count(F.lit(1)).alias("_c"),
        F.first("_len").alias("_len"),
        F.first("_tc").alias("_tc"),
    )

    # top-{2,3,4}: max char mass of any single gram
    top = (
        counted.where(F.col("_n") <= 4)
        .groupBy(id_col, "_n")
        .agg(
            (
                F.max(F.col("_c") * F.col("_len")).cast("double")
                / F.first("_tc")
            ).alias("_frac")
        )
    )

    # dup-{5..10}: char coverage of the union of duplicated-gram spans
    dup_occ = (
        gram_rows.join(
            counted.where((F.col("_n") >= 5) & (F.col("_c") >= 2)).select(
                id_col, "_n", "_h"
            ),
            [id_col, "_n", "_h"],
        )
        .select(
            id_col,
            "_n",
            F.col("_pos").cast("long").alias("_s"),
            (F.col("_pos") + F.col("_n")).cast("long").alias("_e"),
        )
    )
    w_prev = (
        Window.partitionBy(id_col, "_n")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col, "_n")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = (
        dup_occ.withColumn(
            "_new",
            F.when(F.col("_s") > F.max("_e").over(w_prev), 1).otherwise(0),
        )
        .withColumn("_span", F.sum("_new").over(w_run))
        .groupBy(id_col, "_n", "_span")
        .agg(F.min("_s").alias("_s"), F.max("_e").alias("_e"))
    )
    # map word spans to chars via the per-doc word-length array
    # (already on base): chars in [s, e) = Σ len(word_i) for i in
    # [s, e) + (e - s - 1) separators. Islands are disjoint per
    # (doc, n), so these slice sums total ≤ words per (doc, n) —
    # linear, with no prefix-sum array to build quadratically.
    wlens = base.select(id_col, "_tc", "_wl")
    dupn = (
        islands.join(wlens, id_col)
        .select(
            id_col,
            "_n",
            "_tc",
            (
                F.expr(
                    "aggregate(slice(_wl, cast(_s + 1 as int), "
                    "cast(_e - _s as int)), 0L, (a, x) -> a + x)"
                )
                + (F.col("_e") - F.col("_s") - 1)
            ).alias("_chars"),
        )
        .groupBy(id_col, "_n")
        .agg(
            (F.sum("_chars").cast("double") / F.first("_tc")).alias("_frac")
        )
    )

    frac_rows = top.unionByName(dupn)
    pivoted = frac_rows.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("_n", "_frac"))
        ).alias("_m")
    )
    out = base.join(pivoted, id_col, "left")
    cols = {
        **{f"top_{n}_gram_char_frac": n for n in (2, 3, 4)},
        **{f"dup_{n}_gram_char_frac": n for n in (5, 6, 7, 8, 9, 10)},
    }
    for name, n in cols.items():
        out = out.withColumn(
            name,
            F.coalesce(
                F.expr(f"element_at(_m, {n})"), F.lit(0.0)
            ),
        )
    thresholds = dict(
        zip(
            [f"top_{n}_gram_char_frac" for n in (2, 3, 4)],
            max_top_ngram_char_frac,
        )
    ) | dict(
        zip(
            [f"dup_{n}_gram_char_frac" for n in (5, 6, 7, 8, 9, 10)],
            max_dup_ngram_char_frac,
        )
    ) | {
        "dup_line_frac": max_dup_line_frac,
        "dup_para_frac": max_dup_para_frac,
        "dup_line_char_frac": max_dup_line_char_frac,
        "dup_para_char_frac": max_dup_para_char_frac,
    }
    metric_cols = [
        "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
    ] + list(cols)
    # round FIRST, then threshold the rounded values — keep is then a
    # pure function of the emitted metrics (and the SQL twin agrees
    # bit for bit at the threshold boundary)
    rounded = out.select(
        id_col, *[_round6(F.col(c)).alias(c) for c in metric_cols]
    )
    keep = F.lit(True)
    for name, t in thresholds.items():
        keep = keep & (F.col(name) <= F.lit(float(t)))
    return rounded.withColumn("keep", keep)


def c4_page_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple = (),
) -> DataFrame:
    """The C4 §2.2 page-cleaning rules (Raffel et al. 2020) as one
    per-row operator — the WITHIN-page half
    (:func:`remove_boilerplate_lines` covers the cross-document
    rule):

    * keep only lines ending in terminal punctuation (. ! ? or a
      closing quote after one),
    * drop lines with fewer than ``min_words_per_line`` words or
      containing the word "javascript" (case-insensitive),
    * flag the whole page when it contains "lorem ipsum" or a curly
      brace, has fewer than ``min_sentences`` sentences after line
      cleaning, or (when ``badwords`` is supplied) any badword as a
      whole word.

    Returns (id, clean_text, n_lines, n_lines_kept, n_sentences,
    has_lorem_ipsum, has_brace, has_badword, keep). Pure per-row
    array/string expressions: shuffle-free, whole-stage-codegen'd,
    trivially parallel at any corpus size. Flagging, not deletion —
    ``keep`` is the paper's page rule, the caller filters."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(raw, "\n"), lambda e: F.trim(e)),
        lambda e: F.length(e) > 0,
    )

    def line_ok(e: Column) -> Column:
        terminal = e.rlike('[.!?]["\']?$')
        words = F.size(
            F.filter(F.split(e, r"\s+"), lambda x: F.length(x) > 0)
        )
        has_js = F.lower(e).rlike(r"\bjavascript\b")
        return terminal & (words >= F.lit(min_words_per_line)) & ~has_js

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    # sentence count over the CLEANED page: terminal-punct runs
    n_sent = F.size(F.split(clean, r"[.!?]+")) - 1
    low = F.lower(clean)
    has_lorem = low.contains("lorem ipsum")
    has_brace = clean.contains("{")
    if badwords:
        # regex-escape each term: a badword like "c++" or "a.b" must
        # match literally, not as a (possibly invalid) pattern
        # (ADVICE r15). A SQL twin must escape identically — DuckDB's
        # regexp_matches reads the same alternation.
        import re

        pat = "\\b(" + "|".join(re.escape(b) for b in badwords) + ")\\b"
        has_bad = low.rlike(pat)
    else:
        has_bad = F.lit(False)
    keep = (
        (n_sent >= F.lit(min_sentences))
        & ~has_lorem
        & ~has_brace
        & ~has_bad
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_badword"),
        keep.alias("keep"),
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Cross-document paragraph dedup, KEEP-FIRST policy (the Dolma
    paragraph-level dedup: every paragraph survives exactly once in
    the corpus, at its first occurrence — unlike
    :func:`remove_boilerplate_lines`, which drops ALL copies of
    over-frequent lines including the first): a paragraph occurrence
    is kept iff it is the canonical first (smallest ``(id, position)``
    over its exact text) — later copies excise and the document
    reassembles in original order. Empty/whitespace-only segments
    pass through untouched (they are structure, not content).
    Returns ``df`` with ``text_col`` replaced and a
    ``removed_paragraphs`` count.

    Plan: ONE posexplode (staged — it feeds the canonical-first agg
    and the reassembly; re-scanning a 100 TB text column twice would
    dwarf the agg), one uniform md5-key min aggregation, one
    shuffle join back on the hash (skew-safe: the hot boilerplate
    paragraph's group reduces map-side to one row; the join fans it
    back out but never windows over it), one per-doc order-preserving
    re-assembly. The exact-substring analog of the Lee et al. span
    machinery one level up."""
    import re as _re

    from cybersecurity_miw_spark.operators.dedup import staged

    # sep is a LITERAL separator on both sides: F.split takes a regex
    # but array_join reassembles verbatim, so regex metachars in a
    # caller-supplied sep (e.g. '||') must be escaped for the split
    # (re.escape emits only backslash-punct escapes, which Java regex
    # reads as the same literals)
    paras = staged(
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.split(
                    F.coalesce(F.col(text_col), F.lit("")),
                    _re.escape(sep),
                )
            ).alias("_pos", "_p"),
        ).withColumn("_blank", F.trim(F.col("_p")) == "")
    )
    first = (
        paras.filter(~F.col("_blank"))
        .groupBy(F.md5("_p").alias("_h"))
        .agg(
            F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_first")
        )
    )
    kept = paras.join(
        first, F.md5(paras["_p"]) == first["_h"], "left"
    ).filter(
        F.col("_blank")
        | (
            (F.col("_first._id") == F.col("_id"))
            & (F.col("_first._pos") == F.col("_pos"))
        )
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", F.col("_p")))
                ),
                lambda s: s["_p"],
            ),
            sep,
        ).alias("_new"),
        F.sum(F.when(F.col("_blank"), 0).otherwise(1)).alias("_nkept"),
    ).select(F.col("_id").alias("_rid"), "_new", "_nkept")
    totals = paras.groupBy("_id").agg(
        F.sum(F.when(F.col("_blank"), 0).otherwise(1)).alias("_ntot")
    ).select(F.col("_id").alias("_tid"), "_ntot")
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_rid"], "left")
        .join(totals, df[id_col] == totals["_tid"], "left")
        .select(
            *[c for c in df.columns if c != text_col],
            F.coalesce("_new", F.lit("")).alias(text_col),
            (
                F.coalesce("_ntot", F.lit(0))
                - F.coalesce("_nkept", F.lit(0))
            ).cast("long").alias("removed_paragraphs"),
        )
    )
