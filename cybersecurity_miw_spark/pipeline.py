"""High-level corpus-curation pipeline: the library API version of
examples/training_data_pipeline.py, so a user can run the standard
curation chain as one call and compose the stages explicitly when the
defaults don't fit.

Stage order (each optional, each a documented operator):

    Gopher/C4 rule gate  →  PII redaction  →  heuristic quality floor
    →  exact dedup  →  cluster-correct near-dedup

Everything stays a lazy DataFrame plan until the caller acts; the
only driver-side traffic is near-dedup's one convergence scalar per
connected-components round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    apply_gopher: bool = True,
    redact_pii: bool = True,
    quality_floor: float | None = 0.3,
    near_dup_threshold: float | None = 0.8,
    gopher_kwargs: dict | None = None,
    fingerprint_store: DataFrame | None = None,
    max_bucket_width: int | None = None,
    remove_span_k: int | None = None,
    semantic_threshold: float | None = None,
    semantic_planes: int | None = None,
    embedding_dim: int = 64,
    metrics: list | None = None,
) -> DataFrame:
    """Run the standard curation chain; returns the surviving rows of
    ``df`` with the (possibly PII-redacted) text under ``text_col``
    plus the profile columns (lang_guess, n_tokens, quality,
    fingerprint). Set a stage's parameter to None/False to skip it.

    ``max_bucket_width``: fence near-dup mega-clusters (boilerplate
    templates) out of the quadratic LSH pair join; each fenced bucket
    keeps its minimum id (dedup.near_dedup_clusters semantics).

    ``remove_span_k``: when set, run span-level exact-substring dedup
    LAST (the Lee et al. order — doc-level dedup first, then excise
    cross-doc duplicated ``k``-gram spans from the survivors):
    ``text_col`` is replaced by the span-removed normalized
    reassembly and a ``removed_tokens`` column is added. Runs after
    profiling, so the profile columns describe the pre-removal text.

    ``semantic_threshold``: when set, run SemDeDup-style embedding
    dedup after the token-level near-dedup — hashed-embedding each
    surviving doc and dropping rows with a smaller-id same-bucket
    neighbor at cosine ≥ the threshold
    (similarity.semantic_dedup keep-lowest-id semantics). Catches
    paraphrase-level duplicates token shingles miss.
    ``semantic_planes=None`` (default) applies the occupancy-constant
    schedule automatically: similarity.suggested_planes over the
    surviving row count (one count() job when the stage is enabled),
    so bucket occupancy — and with it the quadratic within-bucket
    pair join — stays at the measured-good level at any corpus size
    (SCALE.md r11: fixed planes ratio 0.32 at 10× vs 0.12 scaled).
    Pass an int to own the schedule explicitly.

    ``metrics``: pass a list to get the curation FUNNEL — one
    ``{'stage', 'n_in', 'n_out', 'n_dropped'}`` dict per enabled
    stage, the report that answers "where did my corpus go". When
    enabled, each stage's output is localCheckpoint'ed so every stage
    computes exactly once and each count reads the cached frame (the
    streaming-ingest metrics discipline) — the monitored run trades
    ~one materialization per stage for the visibility; the default
    unmonitored plan stays fully lazy.

    ``fingerprint_store``: when curating an INCREMENTAL batch against
    an already-curated corpus, pass the persisted exact-dedup index
    (dedup.fingerprint_store schema) — the exact-dedup stage then
    also drops batch docs whose fingerprint exists in history
    (dedup_against_store), without rescanning history text. Append
    ``dedup.fingerprint_store(result)`` to the index after accepting
    the batch."""
    from cybersecurity_miw_spark.operators import corpus_filters, dedup, textstats

    out = df
    n_prev = None
    if metrics is not None:
        out = out.localCheckpoint(eager=True)
        n_prev = out.count()

    def _record(stage: str, new_out: DataFrame) -> DataFrame:
        nonlocal n_prev
        if metrics is None:
            return new_out
        new_out = new_out.localCheckpoint(eager=True)
        n = new_out.count()
        metrics.append({
            "stage": stage,
            "n_in": n_prev,
            "n_out": n,
            "n_dropped": n_prev - n,
        })
        n_prev = n
        return new_out

    if apply_gopher:
        flags = corpus_filters.gopher_flags(
            out, text_col=text_col, **(gopher_kwargs or {})
        )
        out = _record(
            "gopher",
            out.join(flags.filter(F.col("keep")).select(id_col), id_col),
        )
    if redact_pii:
        scrubbed = corpus_filters.pii_redact(
            out, text_col=text_col, out_col="_clean", keep=(id_col,)
        )
        out = _record(
            "pii_redact",
            out.drop(text_col)
            .join(scrubbed.select(id_col, "_clean"), id_col)
            .withColumnRenamed("_clean", text_col),
        )
    out = textstats.profile(out, text_col=text_col)
    if quality_floor is not None:
        out = _record(
            "quality_floor", out.filter(F.col("quality") >= quality_floor)
        )
    if fingerprint_store is not None:
        out = _record(
            "exact_dedup_vs_store",
            dedup.dedup_against_store(
                out, fingerprint_store, text_col=text_col, id_col=id_col
            ),
        )
    else:
        out = _record(
            "exact_dedup",
            dedup.exact_dedup(out, text_col=text_col, id_col=id_col),
        )
    if near_dup_threshold is not None:
        out = _record(
            "near_dedup",
            dedup.near_dedup_clusters(
                out,
                text_col=text_col,
                id_col=id_col,
                threshold=near_dup_threshold,
                max_bucket_width=max_bucket_width,
            ),
        )
    if semantic_threshold is not None:
        from cybersecurity_miw_spark.operators import similarity

        vecs = textstats.hashed_embedding(
            out, dim=embedding_dim, text_col=text_col, id_col=id_col
        ).select(id_col, "embedding")
        if semantic_planes is None:
            semantic_planes = similarity.suggested_planes(out.count())
        keep = similarity.semantic_dedup(
            vecs,
            dim=embedding_dim,
            threshold=semantic_threshold,
            n_planes=semantic_planes,
            id_col=id_col,
        ).select(id_col)
        # Anti-join the REMOVED set rather than semi-joining the
        # survivors: hashed_embedding emits no row for a word-less
        # doc, so it is absent from both vecs and keep — a survivors
        # semi-join would drop it even though it has no semantic
        # duplicate. Docs with no embedding row can never be removed.
        removed = vecs.select(id_col).join(keep, id_col, "anti")
        out = _record(
            "semantic_dedup", out.join(removed, id_col, "anti")
        )
    if remove_span_k is not None:
        spans = dedup.duplicated_ngram_spans(
            out, k=remove_span_k, id_col=id_col, text_col=text_col
        )
        cleaned = dedup.remove_duplicated_spans(
            out, spans, id_col=id_col, text_col=text_col
        )
        out = out.drop(text_col).join(cleaned, id_col)
    return out
