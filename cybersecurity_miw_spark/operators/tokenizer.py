"""Exact tokenization with a SHIPPED frozen BPE vocabulary — the
step that turns every budget-shaped number in the pipeline from an
approximation into a real token count. The engine already trains
BPE (operators/bpe.py, Sennrich et al. 2016) and applies small merge
lists as nested regexp passes; that application is merge-count-
bounded (one codegen'd regexp per merge — fine for 50 merges,
unusable for a production-size list). This module is the production
application path: a frozen merges+vocab file under ``data/`` (the
``data/lang_profiles.tsv`` shipped-contract precedent; rebuilt
offline by ``tools/build_bpe_vocab.py``) applied by ONE Arrow pass
over the DISTINCT-WORD vocabulary, never the corpus.

Scale shape (the decisive trick): token counts and token ids are
per-WORD functions, and a 100 TB corpus has a vocabulary orders of
magnitude smaller than its token stream. So: one corpus-sized
explode to per-doc word counts (a uniform groupBy), ONE
``mapInPandas`` segmentation pass over the distinct words (Python
runs |vocab| times, not |corpus| times — the WARC-source rule that
Python appears once, at a bounded choke point), then JVM-side joins
and LONG sums. ``n_tokens_exact`` costs one extra shuffle over the
word-count table; token-id SEQUENCES re-assemble per document with
an order-struct sort (the anchor-index pattern).

Application algorithm: rank-greedy merging (lowest-rank adjacent
pair first, leftmost on ties, re-evaluated after every merge — the
published GPT-2 ``bpe()`` loop). For a TRAINED merge list the
sequential-pass application in operators/bpe.py produces the same
segmentation (a merge can only create pairs whose own merge was
learned LATER, so pass order and rank-greedy order agree — the
equivalence is golden-tested against bpe.tokenize); rank-greedy is
O(word²·ranks-lookup) per word with dict lookups instead of
merge-count regexp passes, and its per-word loop is what the DuckDB
recursive-CTE oracle twin replays exactly.

Vocabulary contract: ``data/bpe_merges.tsv`` (``rank\\tx\\ty``,
rank-ordered) and ``data/bpe_vocab.tsv`` (``id\\ttoken``; id 0 is
``<unk>``). Pre-tokenization matches bpe.tokenize exactly
(lowercase, ``\\s+`` word split) so the two paths are comparable;
a segment whose token is not in the vocab maps to UNK id 0 but
still counts one token (segmentation length is the budget number).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK_ID = 0
UNK_TOKEN = "<unk>"

_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)
DEFAULT_MERGES_FILE = os.path.join(_DATA_DIR, "bpe_merges.tsv")
DEFAULT_VOCAB_FILE = os.path.join(_DATA_DIR, "bpe_vocab.tsv")


def load_bpe_model(
    merges_path: str | None = None, vocab_path: str | None = None
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """The frozen model: ``(merges, vocab)`` — merges rank-ordered,
    vocab token→id with ``<unk>`` at id 0. Raises on a malformed
    file (a silently half-read vocab would mis-tokenize everything
    downstream)."""
    merges: list[tuple[str, str]] = []
    with open(merges_path or DEFAULT_MERGES_FILE, encoding="utf-8") as f:
        for ln, line in enumerate(f):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 3:
                raise ValueError(
                    f"bpe merges line {ln + 1}: expected rank\\tx\\ty, "
                    f"got {line!r}"
                )
            if int(parts[0]) != len(merges):
                raise ValueError(
                    f"bpe merges line {ln + 1}: rank {parts[0]} out of "
                    f"order (expected {len(merges)})"
                )
            merges.append((parts[1], parts[2]))
    vocab: dict[str, int] = {}
    with open(vocab_path or DEFAULT_VOCAB_FILE, encoding="utf-8") as f:
        for ln, line in enumerate(f):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                raise ValueError(
                    f"bpe vocab line {ln + 1}: expected id\\ttoken, "
                    f"got {line!r}"
                )
            vocab[parts[1]] = int(parts[0])
    if vocab.get(UNK_TOKEN) != UNK_ID:
        raise ValueError(
            f"bpe vocab must map {UNK_TOKEN!r} to id {UNK_ID}"
        )
    return merges, vocab


def greedy_bpe_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Rank-greedy BPE segmentation of one word (the GPT-2 loop):
    repeatedly merge the adjacent pair with the LOWEST rank,
    leftmost occurrence on ties, until no pair is mergeable. Driver/
    test helper AND the exact per-word function the Arrow pass
    vectorizes — one implementation, no drift."""
    toks = list(word)
    while len(toks) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        toks[best_i: best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    word_col: str = "word",
) -> DataFrame:
    """THE Arrow pass: distinct words → ``(word, token_ids,
    n_tokens)``. Runs once per distinct word — vocabulary-bounded,
    never corpus-scaled; the merge ranks and vocab ship to executors
    inside the task closure (model-bounded, the broadcast-table
    discipline)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    vb = dict(vocab)

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            words_s = pdf[word_col].astype(str)
            ids = []
            ns = []
            for w in words_s:
                toks = greedy_bpe_word(w, ranks)
                ids.append([vb.get(t, UNK_ID) for t in toks])
                ns.append(len(toks))
            yield pd.DataFrame(
                {word_col: words_s, "token_ids": ids, "n_tokens": ns}
            )

    return words.select(word_col).mapInPandas(
        seg, f"{word_col} string, token_ids array<int>, n_tokens int"
    )


def _doc_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, word) — the bpe.tokenize pre-tokenization verbatim
    (lowercase, \\s+ split), position-kept for sequence re-assembly."""
    words = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    return (
        df.select(
            id_col,
            F.posexplode(words).alias("_pos", "_word"),
        )
        .filter(F.length("_word") > 0)
    )


def token_counts_exact(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "n_tokens_exact",
) -> DataFrame:
    """Every input row plus ``out_col``: the EXACT token count of
    ``text_col`` under the frozen vocabulary — the number
    ``budget_select`` / ``mix_to_budget`` / ``pack_sequences`` /
    ``chunk_documents`` should bind to (pass this column as their
    ``tokens_col``/``weight_col``) when budgets must be real model
    tokens rather than the whitespace+CJK approximation
    (textstats.token_count). Wordless/NULL text counts 0.

    Plan: one explode → (id, word) count agg (uniform keys), ONE
    Arrow segmentation over the DISTINCT words, one word-key join of
    counts to segment lengths, one id-key LONG weighted sum, one
    join back. Python touches |distinct words| rows only."""
    wc = (
        _doc_words(df, text_col, id_col)
        .groupBy(id_col, "_word")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    seg = segment_words(
        wc.select("_word").distinct(), merges, vocab, word_col="_word"
    ).select("_word", F.col("n_tokens").alias("_wt"))
    per_doc = (
        wc.join(seg, "_word")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_n") * F.col("_wt")).cast("long").alias("_tot")
        )
    )
    return df.join(per_doc, id_col, "left").select(
        *df.columns,
        F.coalesce("_tot", F.lit(0)).cast("long").alias(out_col),
    )


def tokenize_ids_exact(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "token_ids",
) -> DataFrame:
    """(id, token_ids) — the exact id sequence per document, word
    order preserved: position explode, distinct-word segmentation,
    order-struct re-assembly (the anchor-index sort pattern).
    Wordless docs yield an empty array. Use this for packing/export;
    use :func:`token_counts_exact` when only budgets are needed (it
    skips carrying the arrays through the shuffle)."""
    pw = _doc_words(df, text_col, id_col)
    seg = segment_words(
        pw.select("_word").distinct(), merges, vocab, word_col="_word"
    ).select("_word", "token_ids")
    assembled = (
        pw.join(seg, "_word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "token_ids"))
                    ),
                    lambda s: s["token_ids"],
                )
            ).alias(out_col)
        )
    )
    return (
        df.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(out_col, F.array().cast("array<int>")).alias(
                out_col
            ),
        )
    )
