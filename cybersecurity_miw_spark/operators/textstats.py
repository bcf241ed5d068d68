"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting over a
`documents(doc_id, text, ...)` table. All pure JVM expressions —
`regexp_count`, `split`, `md5`, `transform` — so they run inside
whole-stage codegen at 100 TB without Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID (deterministic, oracle-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}


def _word_hits(text: Column, words: list[str]) -> Column:
    """Count of whole-word occurrences of any marker word."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def lang_id(text: Column) -> Column:
    """Stopword-scored language guess: the language whose marker set
    hits most; ties and zero-hits → 'und' (undetermined)."""
    scores = F.array(
        *[
            F.struct(
                _word_hits(text, w).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang, w in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


# Whitespace-free scripts where "word" boundaries are not spaces:
# Han (+ ext A + compat), Hiragana, Katakana (+ halfwidth), Thai.
# Each codepoint counts as ONE token in token_count — a Chinese page
# used to count as a single "word", making every token-thresholded
# gate (gopher word counts, chunk budgets, mix token budgets)
# meaningless on CJK text (VERDICT r16 missing #4). Per-codepoint
# counting slightly OVERCOUNTS multi-char words (Thai words average
# 3-5 chars); published CJK thresholds are usually stated per
# character, so this is the convention that keeps them applicable.
# Java regex form (Spark) — the DuckDB twin spells the same ranges
# as RE2 \\x{...} escapes.
CJK_CLASS = (
    "[ぁ-ゖァ-ヺｦ-ﾝ"
    "㐀-䶿一-鿿豈-﫿ก-๛]"
)


def token_count(text: Column) -> Column:
    """Token count: whitespace tokens, plus a char-class fallback for
    whitespace-free scripts — every CJK/Thai codepoint (CJK_CLASS)
    counts as one token, and the whitespace count is taken over the
    text with those codepoints removed. Non-CJK text keeps the exact
    historical whitespace semantics (including the size(split(''))=1
    empty-string quirk), so the fallback only engages when CJK
    codepoints are present."""
    n_cjk = F.regexp_count(text, F.lit(CJK_CLASS))
    stripped = F.regexp_replace(text, CJK_CLASS, " ")
    n_ws = F.size(
        F.filter(
            F.split(F.trim(stripped), r"\s+"), lambda x: F.length(x) > 0
        )
    )
    return F.when(n_cjk > 0, n_ws + n_cjk).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punctuation-run
    matches (a regex analog of common pre-tokenizers). Already
    CJK-robust by construction: a CJK codepoint is neither ASCII
    alphanumeric nor whitespace, so each one matches the
    punctuation-run alternative individually — one subtoken per
    codepoint, the same per-char convention as token_count."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: penalize very short docs,
    high punctuation ratio, and low alphabetic ratio. Deterministic
    arithmetic only."""
    n = F.length(text)
    alpha = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    punct = F.regexp_count(text, F.lit(r"[^\sA-Za-z0-9]"))
    alpha_ratio = alpha / F.greatest(n, F.lit(1))
    punct_ratio = punct / F.greatest(n, F.lit(1))
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    raw = F.greatest(
        F.least(
            0.5 * alpha_ratio + 0.3 * len_score + 0.2 * (1.0 - punct_ratio),
            F.lit(1.0),
        ),
        F.lit(0.0),
    )
    # quantize with plain double arithmetic (floor(x*1e6+0.5)/1e6)
    # rather than ROUND: given bit-identical inputs any engine computes
    # the bit-identical result, whereas ROUND(x, 6) differs between
    # engines exactly on decimal halves
    return F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of normalized text) —
    whitespace-collapsed, lowercased. Cross-engine stable (DuckDB md5
    matches), so exact-dup detection can be oracle-checked."""
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(norm)


# Latin-1 accent folding map: identical literal on both engines so
# the aggressive fingerprint stays oracle-able (Spark has no
# strip_accents; an explicit translate IS the cross-engine contract)
ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyy"


# surface-preserving unicode cleanup (the Dolma/OLMo "fix text"
# stage, ftfy-lite): characters DROPPED outright (zero-width resp.
# format controls that break tokenizers and fingerprints), characters
# mapped to ASCII lookalikes (typographic quotes/dashes the crawl
# injects inconsistently across mirrors of the same page), and the
# unicode space class folded to plain space. All literal codepoints —
# the CJK_CLASS convention: both engines treat them as literals, so
# the twin is the same pattern text.
CLEAN_DROP = "\ufeff\u00ad\u200b\u200c\u200d\u2060"
CLEAN_SPACES = (
    "\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006"
    "\u2007\u2008\u2009\u200a\u202f\u205f\u3000"
)
CLEAN_MAP = [
    ("\u2018", "'"), ("\u2019", "'"), ("\u201a", "'"), ("\u201b", "'"),
    ("\u201c", '"'), ("\u201d", '"'), ("\u201e", '"'), ("\u201f", '"'),
    ("\u2012", "-"), ("\u2013", "-"), ("\u2014", "-"), ("\u2015", "-"),
    ("\u2026", "..."),
]
# C0 controls except \t \n \r, plus DEL -- hex-escaped so both regex
# engines (Java, RE2) read the identical class
_CTRL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean_text(text: Column) -> Column:
    """Surface-preserving text cleanup — the pre-everything
    normalization published pipelines run before any rule or
    fingerprint sees the text (Dolma's unicode fixing; C4 implicitly
    via its extractor): drop zero-width/format controls and the C0
    control class (tabs/newlines kept — line structure is a signal
    the line rules consume), fold the unicode space class to plain
    space, map typographic quotes/dashes/ellipsis to their ASCII
    forms, collapse runs of spaces (NOT newlines), and trim each
    line's trailing space. Case, wording, and line structure are
    untouched — unlike :func:`normalize_aggressive`, this output IS
    the document text downstream. Pure codegen expression chain."""
    t = F.coalesce(text, F.lit(""))
    t = F.translate(t, CLEAN_DROP, "")
    t = F.translate(t, CLEAN_SPACES, " " * len(CLEAN_SPACES))
    for src, dst in CLEAN_MAP:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.regexp_replace(t, _CTRL_CLASS, "")
    t = F.regexp_replace(t, "  +", " ")
    # lookahead-free (RE2 has none — the htmlextract idiom): runs are
    # single spaces by now, so one pass per edge suffices
    t = F.regexp_replace(t, " ?\n ?", "\n")
    return F.regexp_replace(t, "^ +| +$", "")


def normalize_aggressive(text: Column) -> Column:
    """Aggressive dedup normalization: lowercase → fold Latin-1
    accents (explicit translate map, ACCENT_SRC→ACCENT_DST) → strip
    everything but [a-z0-9 ] → collapse whitespace. Catches the
    near-exact duplicates plain fingerprinting misses (curly quotes,
    accent variants, punctuation-only edits) while staying
    deterministic and cross-engine exact — the standard pre-MinHash
    canonicalization step."""
    t = F.translate(F.lower(F.coalesce(text, F.lit(""))), ACCENT_SRC, ACCENT_DST)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def fingerprint_aggressive(text: Column) -> Column:
    """md5 of :func:`normalize_aggressive` — the canonical-form
    fingerprint for exact dedup across cosmetic variants."""
    return F.md5(normalize_aggressive(text))


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles as an array<string> (distinct). Built with
    sequence+transform over the split array — no UDF.

    NOTE: inlining this single expression repeats the split() of the
    full text several times (the CASE and the lambda each reference
    ``words`` and Catalyst does not CSE through them — measured ~6× the
    cost at sf0.1). Hot paths should use :func:`with_shingles`, which
    stages the words array in its own projection."""
    return shingles_from_words(F.split(F.lower(F.trim(text)), r"\s+"), k)


def shingles_from_words(words: Column, k: int = 5) -> Column:
    """k-shingles from an already-computed words array."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def with_shingles(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    out_col: str = "_sh",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """``keep`` columns + a ``out_col`` shingle array, with the words
    array materialized in its own projection so the text is split
    exactly once (CollapseProject keeps the two stages apart because
    the alias is referenced more than once — measured 3.9 s → 0.7 s at
    sf0.1).

    Both projections are assembled as SQL strings: the Column-built
    shingle expression (sequence + transform lambda + the CASE) cost
    ~0.1 s of py4j round-trips per call on the hot dedup paths that
    build this twice per query (OPTIMIZATION_r18 finding 6); the
    string parses JVM-side in ~1 ms to the identical tree —
    tests/test_expr_string_builders.py pins string ≡ Column form."""
    k = int(k)
    keep_q = [f"`{c}`" for c in keep]
    # '\\\\s+' in SQL-literal escaping reaches the regex engine as \s+
    staged = df.selectExpr(
        *keep_q, f"split(lower(trim(`{text_col}`)), '\\\\s+') AS _w"
    )
    sh = (
        f"array_distinct(CASE WHEN size(_w) >= {k} THEN "
        f"transform(sequence(0, greatest(size(_w) - {k}, 0)), "
        f"i -> concat_ws(' ', slice(_w, i + 1, {k}))) "
        f"ELSE array(concat_ws(' ', _w)) END)"
    )
    return staged.selectExpr(*keep_q, f"{sh} AS `{out_col}`")


def profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_mode: str = "ngram",
    lang_profiles: dict | None = None,
) -> DataFrame:
    """One-stop text profile: adds lang_guess, n_tokens, quality,
    fingerprint columns.

    ``lang_mode="ngram"`` (default, r17): ``lang_guess`` comes from
    the char-trigram profile classifier
    (:mod:`~cybersecurity_miw_spark.operators.langid` — 21 profiled
    + 8 script-gated languages, the C4/RefinedWeb-grade gate),
    joined back on ``id_col``. ``lang_mode="stopword"`` keeps the
    legacy 4-language stopword heuristic (:func:`lang_id`) — the
    documented fallback for frames WITHOUT a row id, where the
    detector's join has no key."""
    t = F.col(text_col)
    row_cols = [
        token_count(t).alias("n_tokens"),
        word_token_count(t).alias("n_subtokens"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    ]
    if lang_mode == "stopword":
        return df.select("*", lang_id(t).alias("lang_guess"), *row_cols)
    if lang_mode != "ngram":
        raise ValueError(f"lang_mode must be ngram|stopword, got {lang_mode!r}")
    if id_col not in df.columns:
        raise ValueError(
            f"profile(lang_mode='ngram') needs id column {id_col!r} to "
            "join the detected language back; pass "
            "lang_mode='stopword' for id-less frames"
        )
    from cybersecurity_miw_spark.operators import langid

    langs = langid.detect_language(
        df, text_col=text_col, id_col=id_col, profiles=lang_profiles
    ).select(id_col, F.col("lang").alias("lang_guess"))
    return df.select("*", *row_cols).join(langs, id_col, "left")


def tfidf_top_terms(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-n TF-IDF terms per document (smooth idf = ln(N/df)).

    Plan: explode terms → per-(doc, term) counts (one shuffle,
    map-side combined) → per-term document frequency joined back
    (broadcast when the vocabulary fits, shuffle join otherwise —
    Catalyst's choice) → row_number window per doc. The idf state is
    one row per distinct term: vocabulary-bounded, not corpus-bounded.
    Ties broken by term for determinism; scores scaled to 1e-6 ints
    for cross-engine comparison."""
    from pyspark.sql.window import Window

    n_docs = df.count()
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "term"
        ),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs")
    )
    scored = tf.join(docfreq, on="term").select(
        id_col,
        "term",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df_docs"))
        ).alias("_score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc("term")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select(
            id_col,
            "term",
            F.floor(F.col("_score") * 1e6 + 0.5).cast("long").alias("score_u"),
        )
    )


def char_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies within words —
    the candidate-scoring step of a BPE tokenizer-training round (the
    first merge is argmax of exactly this table). Words are
    whitespace tokens, lowercased; pairs never span word boundaries
    (the standard pre-tokenized BPE setting).

    Plan: split → explode words → per-word pair array (sequence +
    substr, no Python) → explode pairs → ONE count aggregation on the
    pair key (map-side combined; key space is alphabet², naturally
    tiny). Top-N by (count desc, pair asc) via TakeOrdered — no
    global sort."""
    words = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("w")
    staged = df.select(words)
    n = F.length("w")
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.substring(F.col("w"), i, 2),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = staged.select(F.explode(pairs).alias("pair"))
    counted = exploded.groupBy("pair").agg(F.count("*").alias("n_pair"))
    return counted.orderBy(F.desc("n_pair"), F.asc("pair")).limit(top_n)


def hashed_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Classical feature-hashing document embedding (the hashing
    trick, Weinberger et al. 2009): every word hashes to a bucket in
    [0, dim) with a ±1 sign bit, buckets accumulate term counts, and
    the vector is L2-normalized — a deterministic, training-free text
    embedding that feeds the ANN/near-dup operators directly from
    text (no model container required).

    Integer-exact until the final normalize: bucket sums are int64
    (md5-derived bucket + sign, the engine-portable hash the sampling
    ops use), the norm is one sqrt over an exact integer
    sum-of-squares, and each component is a single division — so the
    result is bit-stable across engines and SQL-oracle-able.

    Plan: explode words → groupBy(doc, bucket) count — one shuffle on
    the uniform (doc_id, bucket) key — then a per-doc array pivot via
    map_from_entries (no second shuffle: the collect_list groups on
    doc_id, co-partitioned under AQE with the count)."""
    words = df.select(
        id_col,
        F.explode(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+",
            )
        ).alias("w"),
    ).filter(F.length("w") > 0)
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
    bucket = F.pmod(h, F.lit(dim)).cast("int")
    sign = F.when(F.pmod(F.floor(h / dim), F.lit(2)) == 0, F.lit(1)).otherwise(
        F.lit(-1)
    )
    counted = (
        words.select(id_col, bucket.alias("b"), sign.alias("s"))
        .groupBy(id_col, "b")
        .agg(F.sum("s").alias("v"))
    )
    pivoted = counted.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("b", "v"))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("_m", i.cast("int")), F.lit(0)),
    )
    # stage the int vector AND its norm as plain columns: an aggregate
    # fold referenced inside the normalize lambda would re-evaluate
    # per element (O(dim²) interpreted work per row — measured ~2× the
    # whole query)
    staged = pivoted.select(id_col, vec.alias("_v"))
    with_norm = staged.select(
        id_col,
        "_v",
        F.sqrt(
            F.aggregate("_v", F.lit(0).cast("long"), lambda a, x: a + x * x)
        ).alias("_n"),
    )
    return with_norm.select(
        id_col,
        F.transform(
            "_v",
            lambda x: F.floor(
                x / F.greatest("_n", F.lit(1e-12)) * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0),
        ).alias(out_col),
    )


# ---- count-min sketch (heavy hitters at 100 TB) ----


def _cms_bucket(col: Column, row: int, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), col)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def count_min_table(
    df: DataFrame,
    col: str = "w",
    depth: int = 4,
    width: int = 1024,
) -> list[list[int]]:
    """Build a count-min sketch over a token column: ``depth``
    md5-salted hash rows × ``width`` counters. ONE aggregation job —
    each token contributes depth (row, bucket) pairs via an inline
    explode — and the collected model is depth×width int64s
    (the codebook/centroid precedent: driver traffic bounded by model
    size, never corpus size). Counters are mergeable by addition, so
    sharded corpora sketch independently and sum — the property that
    makes heavy-hitter estimation single-pass at 100 TB where exact
    per-token counts need a vocabulary-sized shuffle."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_bucket(F.col(col), i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p")
    )
    counted = (
        pairs.groupBy("p.r", "p.b").agg(F.count("*").alias("c")).collect()
    )
    table = [[0] * width for _ in range(depth)]
    for row in counted:
        table[row["r"]][row["b"]] = row["c"]
    return table


def cms_estimate(
    table: list[list[int]], token: str, width: int | None = None
) -> int:
    """Point estimate for a token: min over the depth rows — a
    deterministic Python twin of the Spark-side bucket hash, never an
    underestimate (CMS guarantee), overestimate bounded by e·N/width
    with probability 1 - e^-depth."""
    import hashlib

    width = width if width is not None else len(table[0])
    est = None
    for i, row in enumerate(table):
        h = int(hashlib.md5(f"cms{i}:{token}".encode()).hexdigest()[:8], 16)
        v = row[h % width]
        est = v if est is None else min(est, v)
    return int(est or 0)


def ngram_diversity_report(
    df: DataFrame,
    ns: tuple = (1, 2, 3),
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Corpus n-gram diversity — the distinct-n audit (the Self-BLEU
    complement) a training-data pipeline runs on an assembled mix to
    catch diversity collapse (heavy upsampling or aggressive template
    text drags distinct_frac down long before eyeballs notice): per
    ``by`` group (or the whole corpus) and per n, total gram
    occurrences, distinct grams, and distinct_frac = distinct/total
    (micro-rounded).

    ``exact=True`` counts distinct gram strings — the oracle-exact
    form. At 100 TB the corpus-wide distinct on raw grams is the one
    expensive exchange; ``exact=False`` swaps in
    ``approx_count_distinct`` (HyperLogLog, mergeable, ~2% relative
    error) over the same plan — the scale path, rows-only checkable.
    Plan: one gram explode per n (union), one count agg on the
    (group, n) key; the distinct expansion is Spark's standard
    two-phase countDistinct."""
    group_cols = ([by] if by else []) + ["n"]
    w = F.filter(
        F.split(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        lambda x: F.length(x) > 0,
    )
    base_cols = [F.col(by)] if by else []
    staged_df = df.select(*base_cols, w.alias("_w"))
    parts = []
    for n in ns:
        if n < 1:
            raise ValueError(f"ns must be >= 1, got {n}")
        grams = F.expr(
            f"IF(size(_w) >= {n}, "
            f"transform(sequence(0, size(_w) - {n}), "
            f"i -> array_join(slice(_w, i + 1, {n}), ' ')), array())"
        )
        parts.append(
            staged_df.select(
                *base_cols,
                F.lit(int(n)).alias("n"),
                F.explode(grams).alias("_g"),
            )
        )
    allg = parts[0]
    for p in parts[1:]:
        allg = allg.unionByName(p)
    distinct = (
        F.countDistinct("_g") if exact else F.approx_count_distinct("_g")
    )
    return (
        allg.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            distinct.alias("distinct_grams"),
        )
        .withColumn(
            "distinct_frac",
            F.floor(
                F.col("distinct_grams")
                / F.col("total_grams")
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            / F.lit(1_000_000.0),
        )
    )
