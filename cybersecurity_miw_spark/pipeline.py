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
    url_col: str | None = None,
    url_canonicalize: bool = True,
    url_pct_normalize: bool = False,
    domain_blocklist: tuple = (),
    domain_allowlist: tuple = (),
    url_dedup: bool = True,
    url_store: DataFrame | None = None,
    html_col: str | None = None,
    html_boilerplate: bool = True,
    html_kwargs: dict | None = None,
    clean_unicode: bool = False,
    c4_rules: bool = False,
    c4_kwargs: dict | None = None,
    apply_gopher: bool = True,
    repetition_rules: bool = False,
    repetition_kwargs: dict | None = None,
    redact_pii: bool = True,
    lang_allow: tuple | None = None,
    quality_floor: float | None = 0.3,
    clf_model: dict | None = None,
    clf_model_dir: str | None = None,
    clf_threshold_micro: int = 0,
    lm_model: DataFrame | None = None,
    lm_params: dict | None = None,
    lm_model_dir: str | None = None,
    lm_max_nlp_micro: int | None = None,
    near_dup_threshold: float | None = 0.8,
    gopher_kwargs: dict | None = None,
    fingerprint_store: DataFrame | None = None,
    max_bucket_width: int | None = None,
    remove_span_k: int | None = None,
    paragraph_dedup: bool = False,
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

    ``paragraph_dedup`` (r17): after every doc-level dedup stage,
    run the Dolma keep-first paragraph policy
    (corpus_filters.dedup_paragraphs) — each exact paragraph
    survives once corpus-wide, at its first (doc, position)
    occurrence; ``text_col`` is replaced and ``removed_paragraphs``
    added. Off by default.

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

    ``c4_rules`` (r15): run the C4 §2.2 page cleaning FIRST —
    ``text_col`` is replaced by the line-cleaned page and pages the
    paper's rules reject are dropped, so every later stage (gopher
    stats, profiling, dedup fingerprints) describes the cleaned text,
    the published order. ``repetition_rules`` (r15): after the gopher
    word-level rules, drop docs failing the full Table A1 repetition
    battery (corpus_filters.gopher_repetition_flags). Both off by
    default — the pre-r15 chain is byte-identical.

    ``url_col`` (r16): run the URL/domain curation stage FIRST — the
    order every published web recipe uses (C4 §2.2, RefinedWeb §3.1,
    Dolma: URL rules precede any text rule). When set:
    ``url_canonicalize`` REPLACES ``url_col`` with its canonical form
    (urlcurate.canonical_url — the c4_rules replace-in-place
    convention); ``domain_blocklist`` / ``domain_allowlist`` gate
    rows by host-suffix match (urlcurate.domain_filter); and
    ``url_dedup`` keeps one doc (min id) per canonical URL
    (urlcurate.url_exact_dedup) BEFORE text dedup, so boilerplate
    variants of one page never reach the quadratic-side stages.
    ``url_pct_normalize`` (r18) prepends RFC 3986 §6.2.2
    percent-encoding normalization (urlcurate.pct_normalize_url) to
    the canonicalization, merging ``%7E``-vs-``~`` page variants;
    OFF by default because it changes canonical fingerprints against
    an existing url_store.
    ``url_store`` (the urlcurate.url_fingerprint_store schema): when
    curating an INCREMENTAL batch, the URL-dedup stage also drops
    batch docs whose canonical URL exists in history — the
    fingerprint_store contract, URL-keyed; append
    ``url_fingerprint_store(result)`` after accepting the batch.

    ``html_col`` (r17): HTML→text extraction BEFORE every text
    stage — the published order (RefinedWeb §3.2 runs trafilatura
    extraction between the URL rules and the line rules). When set,
    ``text_col`` is REPLACED by the extracted page text
    (htmlextract.extract_main_text — jusText-lite line-density
    boilerplate removal; ``html_boilerplate=False`` keeps every
    extracted line via the plain tag-strip chain). The raw HTML
    column stays on the frame as provenance; ``html_kwargs`` passes
    min_words / max_link_frac through to the line classifier.

    ``clean_unicode`` (r17): surface-preserving unicode cleanup
    (textstats.clean_text — zero-width/control drop, unicode-space
    fold, typographic-punctuation mapping) applied to ``text_col``
    right after extraction, before every rule and fingerprint — the
    Dolma "fix text" order. Off by default (prior chains stay
    byte-identical).

    ``lang_allow`` (r17): the published language gate — keep only
    docs whose detected language (the r17 char-trigram classifier's
    ``lang_guess``) is in the tuple, e.g. ``("en",)`` for the C4
    recipe (§2.2 keeps pages langdetect scores ≥ 0.99 English — the
    classifier's ln(99) margin is the same bar, so non-confident
    pages are ``'und'`` and drop). Runs right after profiling,
    before the quality floor. Off (None) by default.

    ``clf_model`` / ``clf_model_dir`` (r16): model-based selection
    with the trained quality classifier (qualityclf.py — the
    fastText-recipe gate): score every doc that survived the
    heuristic floor and keep rows with
    ``clf_score_micro >= clf_threshold_micro`` (micro-logits;
    0 = P(target) ≥ 0.5). Pass either the in-memory model dict
    (train_quality_classifier output) or a persisted store dir;
    the score column stays on the output as provenance. Runs after
    the heuristic quality floor and before dedup, the published
    order (classify → dedup keeps the classifier's view independent
    of duplication counts).

    ``lm_model`` / ``lm_model_dir`` + ``lm_max_nlp_micro`` (r17):
    the CCNet §4.3 perplexity gate (operators/ngramlm.py) — score
    every surviving doc under the frozen target-trained bigram LM
    and keep rows with ``nlp_micro_tok <= lm_max_nlp_micro``
    (micro-nat per-token NLL; fit the cut with
    ngramlm.lm_bucket_cuts — CCNet/LLaMA keep head+middle, i.e. pass
    the fit's ``cut_tail_micro``). Pass the in-memory
    ``(lm_model, lm_params)`` pair from train_ngram_lm or a
    persisted ``lm_model_dir``. Runs after the classifier gate,
    before dedup; ``nlp_micro_tok`` stays on the output as
    provenance.

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

    if url_store is not None and (url_col is None or not url_dedup):
        raise ValueError(
            "url_store was passed but the URL-dedup stage is off "
            f"(url_col={url_col!r}, url_dedup={url_dedup}) — the "
            "incremental history index would be silently ignored and "
            "already-seen pages would flow through. Enable url_dedup "
            "with a url_col, or drop url_store."
        )
    if url_col is not None:
        from cybersecurity_miw_spark.operators import urlcurate

        if url_pct_normalize:
            # RFC 3986 §6.2.2 percent normalization BEFORE
            # canonicalization, so '/%7Euser' and '/~user' share one
            # canonical fingerprint; off by default — turning it on
            # changes stored URL-store fingerprints, the
            # url_canonicalize opt-out rationale
            out = out.withColumn(
                url_col, urlcurate.pct_normalize_url(F.col(url_col))
            )
        if url_canonicalize:
            out = out.withColumn(
                url_col, urlcurate.canonical_url(F.col(url_col))
            )
        if domain_blocklist or domain_allowlist:
            out = _record(
                "domain_filter",
                urlcurate.domain_filter(
                    out,
                    url_col=url_col,
                    blocklist=tuple(domain_blocklist),
                    allowlist=tuple(domain_allowlist),
                    id_col=id_col,
                ),
            )
        if url_dedup:
            if url_store is not None:
                deduped = urlcurate.url_dedup_against_store(
                    out,
                    url_store,
                    url_col=url_col,
                    id_col=id_col,
                    canonicalize=not url_canonicalize,
                )
            else:
                deduped = urlcurate.url_exact_dedup(
                    out,
                    url_col=url_col,
                    id_col=id_col,
                    # already canonicalized in place above
                    canonicalize=not url_canonicalize,
                )
            out = _record("url_dedup", deduped)
    if html_col is not None:
        from cybersecurity_miw_spark.operators import htmlextract

        if html_boilerplate:
            extracted = htmlextract.extract_main_text(
                out,
                html_col=html_col,
                id_col=id_col,
                out_col="_xt",
                **(html_kwargs or {}),
            ).select(id_col, "_xt")
        else:
            extracted = out.select(
                id_col,
                htmlextract.extract_text(F.col(html_col)).alias("_xt"),
            )
        out = _record(
            "html_extract",
            out.drop(text_col)
            .join(extracted, id_col)
            .withColumnRenamed("_xt", text_col),
        )
    if clean_unicode:
        # surface-preserving unicode cleanup (textstats.clean_text —
        # the Dolma "fix text" stage) right after extraction, before
        # any rule/fingerprint sees the text — the published order.
        # Row expression: no _record stage (it drops nothing).
        out = out.withColumn(
            text_col, textstats.clean_text(F.col(text_col))
        )
    if c4_rules:
        cleaned = corpus_filters.c4_page_filters(
            out, text_col=text_col, id_col=id_col, **(c4_kwargs or {})
        )
        out = _record(
            "c4_rules",
            out.drop(text_col)
            .join(
                cleaned.filter(F.col("keep")).select(id_col, "clean_text"),
                id_col,
            )
            .withColumnRenamed("clean_text", text_col),
        )
    if apply_gopher:
        flags = corpus_filters.gopher_flags(
            out, text_col=text_col, **(gopher_kwargs or {})
        )
        out = _record(
            "gopher",
            out.join(flags.filter(F.col("keep")).select(id_col), id_col),
        )
    if repetition_rules:
        rep = corpus_filters.gopher_repetition_flags(
            out, text_col=text_col, id_col=id_col,
            **(repetition_kwargs or {}),
        )
        out = _record(
            "repetition",
            out.join(rep.filter(F.col("keep")).select(id_col), id_col),
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
    out = textstats.profile(out, text_col=text_col, id_col=id_col)
    if lang_allow is not None:
        if not lang_allow:
            raise ValueError(
                "lang_allow is empty — an empty allowlist drops the "
                "whole corpus; pass None to skip the language gate"
            )
        out = _record(
            "lang_gate",
            out.filter(F.col("lang_guess").isin(*[str(x) for x in lang_allow])),
        )
    if quality_floor is not None:
        out = _record(
            "quality_floor", out.filter(F.col("quality") >= quality_floor)
        )
    if clf_model is not None or clf_model_dir is not None:
        from cybersecurity_miw_spark.operators import qualityclf

        if clf_model is not None and clf_model_dir is not None:
            raise ValueError(
                "pass clf_model OR clf_model_dir, not both"
            )
        if clf_model is None:
            clf_model, _ = qualityclf.load_quality_model(
                out.sparkSession, clf_model_dir
            )
        scored = qualityclf.score_quality(
            out, clf_model, text_col=text_col, id_col=id_col
        )
        out = _record(
            "clf_select",
            scored.filter(
                F.col("clf_score_micro") >= int(clf_threshold_micro)
            ),
        )
    if (
        lm_model is not None
        or lm_model_dir is not None
        or lm_max_nlp_micro is not None
    ):
        from cybersecurity_miw_spark.operators import ngramlm

        if lm_model is not None and lm_model_dir is not None:
            raise ValueError("pass lm_model OR lm_model_dir, not both")
        if lm_model is None and lm_model_dir is None:
            raise ValueError(
                "lm_max_nlp_micro was passed without a model — pass "
                "lm_model (+ lm_params) or lm_model_dir"
            )
        if lm_max_nlp_micro is None:
            raise ValueError(
                "an LM model was passed without lm_max_nlp_micro — "
                "the gate has no cut; fit one with "
                "ngramlm.lm_bucket_cuts (CCNet keeps head+middle: "
                "pass that fit's cut_tail_micro)"
            )
        if lm_model is not None:
            if lm_params is None or "lp_oov_micro" not in lm_params \
                    or "alpha_ln_micro" not in lm_params:
                raise ValueError(
                    "lm_model requires lm_params (the train_ngram_lm "
                    "params dict — lp_oov_micro is the OOV floor and "
                    "alpha_ln_micro the backoff penalty the scorer "
                    "needs)"
                )
            scored_lm = ngramlm.lm_score(
                out, lm_model, int(lm_params["lp_oov_micro"]),
                text_col=text_col, id_col=id_col,
                alpha_ln_micro=int(lm_params["alpha_ln_micro"]),
            )
        else:
            scored_lm = ngramlm.score_with_lm_model(
                out, lm_model_dir, text_col=text_col, id_col=id_col
            )
        out = _record(
            "lm_ppl_gate",
            scored_lm.filter(
                F.col("nlp_micro_tok") <= int(lm_max_nlp_micro)
            ),
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
    if paragraph_dedup:
        # the Dolma keep-first paragraph policy, AFTER doc-level
        # dedup (survivors only — the Lee et al. ordering the span
        # stage also follows); profile columns describe the
        # pre-removal text, like remove_span_k
        out = _record(
            "paragraph_dedup",
            corpus_filters.dedup_paragraphs(
                out, text_col=text_col, id_col=id_col
            ),
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


def assemble_dataset(
    df: DataFrame,
    out_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    fractions: dict[str, float] | None = None,
    clusters: DataFrame | None = None,
    split_salt: str = "split-v1",
    train_split: str = "train",
    weights: dict[str, float] | None = None,
    temperature: float = 2.0,
    budget_tokens: int | None = None,
    max_epochs: int = 4,
    tokens_col: str = "n_tokens",
    mix_salt: str = "mix-v1",
    chunk_window: int | None = None,
    chunk_stride: int | None = None,
    pack_budget: int | None = None,
    n_packers: int = 64,
    shard_rows: int = 10_000,
    holdout: DataFrame | None = None,
    holdout_threshold: float = 0.8,
    incremental: bool = False,
    target_exemplar: DataFrame | None = None,
    dsir_budget_tokens: int | None = None,
    dsir_n_buckets: int = 10_000,
    dsir_grades: int = 1000,
    dsir_salt: str = "dsir-v1",
    metrics: list | None = None,
) -> DataFrame:
    """The tested back half of the training-data pipeline — the
    one-call twin of :func:`curate_documents` for everything AFTER
    curation (VERDICT r14 #1):

        split → [decontaminate] → [dsir select] → train mix
        → [chunk] → [pack] → [shards]

    Every stage is the library operator it names, every assignment is
    md5-deterministic (re-runs and backfills agree, and a DuckDB twin
    of the whole chain exists by construction), and the same
    ``metrics=[...]`` funnel contract as ``curate_documents`` reports
    where the rows went. Returns the assembled TRAIN DataFrame.

    Stages:

    * **split** — :func:`~cybersecurity_miw_spark.operators.sampling.
      leakage_safe_split` when ``clusters`` (dup_clusters output) is
      given — a near-dup cluster never straddles splits — else plain
      ``split_assign``. ``fractions`` defaults to
      98/1/1 train/val/test.
    * **decontaminate** (``holdout`` — an EXTERNAL benchmark frame
      with the same text/id columns) —
      :func:`~cybersecurity_miw_spark.operators.dedup.decontaminate`
      over the train split: exact-fingerprint + LSH-confirmed
      Jaccard ≥ ``holdout_threshold`` matches are dropped. The
      leakage-safe split handles INTERNAL near-dups; this handles
      benchmarks that were never part of ``df``.
    * **dsir select** (``target_exemplar`` + ``dsir_budget_tokens``,
      r16 — VERDICT r15 #6) — the recipe's model-based SELECTION
      stage between decontamination and mixing:
      :func:`~cybersecurity_miw_spark.operators.dsir.
      dsir_select_to_budget` keeps the most target-like
      ``dsir_budget_tokens`` of the (decontaminated) train split,
      scored against the ``target_exemplar`` frame (same text/id
      columns — the high-quality corpus the importance weights aim
      at, Xie et al. 2023). The selected rows keep their
      ``llr_micro_sum`` / ``dsir_grade`` columns as provenance, so
      the written shards record WHY each doc was chosen; the funnel
      gains a ``dsir_select`` stage and the manifest a ``dsir``
      params block.
    * **mix** (train split only; eval splits stay natural) —
      :func:`~cybersecurity_miw_spark.operators.sampling.
      mix_to_budget` when ``budget_tokens`` is set (repetition-capped
      upsampling to the budget; adds ``epoch``), else
      ``weighted_interleave`` with explicit ``weights``, else
      turnkey ``temperature_interleave``. Also derives ``shard_id =
      floor(mix_key / shard_rows)`` — a DETERMINISTIC range-shard
      assignment with no global rank: interleave keys have unit row
      density (weights summing to 1), so each shard holds
      ~``shard_rows`` rows, hard-bounded by shard_rows × n_sources
      (one row per source per key unit); on the budget path the key
      has unit TOKEN density, so pass shard_rows in tokens.
    * **chunk** (``chunk_window``) — ``chunk_documents`` over the
      mixed docs; chunks inherit the parent doc's mix_key/shard_id
      (shards stay doc-granular).
    * **pack** (``pack_budget``) — ``pack_sequences`` into
      fixed-token bins over a collision-free row key (doc ± epoch ±
      chunk), weighted by ``n_chunk_tokens`` when chunked else
      ``tokens_col``.
    * **write** (``out_dir``) — ordered parquet shards of the train
      set under ``{out_dir}/train`` (``write_shards``: one range
      exchange, deterministic file contents), non-train splits under
      ``{out_dir}/eval`` partitioned by split, and the
      ``_manifest.json`` DATA CARD: recipe params, the
      :func:`~cybersecurity_miw_spark.sources.shards.verify_shards`
      read-back report of the published files, the per-source
      :func:`~cybersecurity_miw_spark.operators.sampling.mix_report`
      card, eval split sizes, and the funnel when one was collected.

    Funnel note: the budget path UPSAMPLES, so its stage can have
    ``n_dropped < 0`` — the report is signed on purpose.

    ``incremental=True`` (r17 — VERDICT r16 missing #3, consuming
    docs/ASSEMBLY.md's growth contract): the train set publishes as
    ``shard_id=N`` partition directories and a RE-RUN over a grown
    corpus rewrites only the shards whose membership fingerprint
    moved (sources/shards.write_shards_incremental — dynamic
    partition overwrite; untouched shard files stay byte-identical
    on disk) with the churn recorded in ``_manifest.json``. Guarded
    loudly: requires explicit ``weights`` and forbids
    ``budget_tokens`` / ``target_exemplar`` (the contract's
    stability-breaking parameters — those recipes are snapshots, a
    re-run rewrites everything by construction), and a re-run over
    an existing manifest raises if any recipe parameter changed
    (recipe drift is a NEW dataset, not a backfill)."""
    from cybersecurity_miw_spark.operators import dedup, packing, sampling

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if incremental:
        broken = [
            name
            for name, bad in (
                ("weights must be explicit", weights is None),
                ("budget_tokens must be None", budget_tokens is not None),
                ("target_exemplar must be None", target_exemplar is not None),
            )
            if bad
        ]
        if broken:
            raise ValueError(
                "incremental=True requires the growth-stable recipe "
                f"(docs/ASSEMBLY.md): {'; '.join(broken)}. Temperature-"
                "derived weights, budget mixing, and DSIR selection "
                "re-derive from corpus totals, so every shard would "
                "rewrite anyway — run them as snapshot builds."
            )
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

    if clusters is not None:
        split = sampling.leakage_safe_split(
            out, clusters, fractions, id_col=id_col, salt=split_salt
        )
    else:
        split = sampling.split_assign(
            out, fractions, id_col=id_col, salt=split_salt
        )
    train = _record(
        "train_split", split.filter(F.col("split") == train_split)
    )

    if holdout is not None:
        # EXTERNAL benchmark hygiene — the leakage-safe split above
        # keeps internal near-dup clusters out of eval; this drops
        # train rows that match a benchmark the split never saw
        # (exact fingerprint + LSH-confirmed Jaccard >= threshold;
        # dedup.decontaminate broadcasts the eval side, never forms a
        # train×train pair)
        train = _record(
            "decontaminate",
            dedup.decontaminate(
                train,
                holdout,
                text_col=text_col,
                id_col=id_col,
                threshold=holdout_threshold,
            ),
        )

    if target_exemplar is not None:
        if dsir_budget_tokens is None:
            raise ValueError(
                "target_exemplar requires dsir_budget_tokens — the "
                "selection stage needs a token budget to fill"
            )
        from cybersecurity_miw_spark.operators import dsir

        train = _record(
            "dsir_select",
            dsir.dsir_select_to_budget(
                train,
                target_exemplar,
                dsir_budget_tokens,
                text_col=text_col,
                id_col=id_col,
                tokens_col=tokens_col,
                n_buckets=dsir_n_buckets,
                grades=dsir_grades,
                salt=dsir_salt,
            ),
        )

    if budget_tokens is not None:
        mixed = sampling.mix_to_budget(
            train,
            budget_tokens,
            source_col=source_col,
            temperature=temperature,
            max_epochs=max_epochs,
            tokens_col=tokens_col,
            id_col=id_col,
            salt=mix_salt,
            weights=weights,
        )
    elif weights is not None:
        mixed = sampling.weighted_interleave(
            train, source_col, weights, id_col, mix_salt
        )
    else:
        mixed = sampling.temperature_interleave(
            train, source_col, temperature, id_col, mix_salt
        )
    out = _record(
        "mix",
        mixed.withColumn(
            "shard_id",
            F.floor(F.col("mix_key") / F.lit(float(shard_rows))),
        ),
    )

    order_cols = ["mix_key", id_col]
    if budget_tokens is not None:
        order_cols.append("epoch")
    if chunk_window is not None:
        docs_text = out.select(id_col, text_col)
        if budget_tokens is not None:
            # (doc, epoch) rows: chunk each doc ONCE, the join below
            # re-attaches the chunks to every epoch row
            docs_text = docs_text.dropDuplicates([id_col])
        chunks = packing.chunk_documents(
            docs_text,
            window=chunk_window,
            stride=chunk_stride,
            text_col=text_col,
            id_col=id_col,
        )
        out = _record("chunk", out.drop(text_col).join(chunks, id_col))
        order_cols.append("chunk_id")

    if pack_budget is not None:
        # collision-free row key: ids repeat across epochs/chunks, and
        # pack_sequences' FFD tie-break must stay deterministic
        key_parts = [F.col(id_col).cast("string")]
        if budget_tokens is not None:
            key_parts.append(F.col("epoch").cast("string"))
        if chunk_window is not None:
            key_parts.append(F.col("chunk_id").cast("string"))
        wcol = "n_chunk_tokens" if chunk_window is not None else tokens_col
        out = _record(
            "pack",
            packing.pack_sequences(
                out.withColumn("_row_key", F.concat_ws(":", *key_parts)),
                pack_budget,
                weight_col=wcol,
                id_col="_row_key",
                n_packers=n_packers,
            ).drop("_row_key"),
        )

    if out_dir is not None:
        import json

        from cybersecurity_miw_spark import fsutil
        from cybersecurity_miw_spark.operators.dedup import staged
        from cybersecurity_miw_spark.sources.shards import (
            verify_partitioned_shards,
            verify_shards,
            write_shards,
            write_shards_incremental,
        )

        spark = out.sparkSession
        recipe_params = {
            "fractions": fractions,
            "leakage_safe": clusters is not None,
            "split_salt": split_salt,
            "train_split": train_split,
            "weights": weights,
            "temperature": temperature,
            "budget_tokens": budget_tokens,
            "max_epochs": max_epochs,
            "decontaminated": holdout is not None,
            "holdout_threshold": (
                holdout_threshold if holdout is not None else None
            ),
            "dsir": (
                {
                    "budget_tokens": dsir_budget_tokens,
                    "n_buckets": dsir_n_buckets,
                    "grades": dsir_grades,
                    "salt": dsir_salt,
                }
                if target_exemplar is not None
                else None
            ),
            "mix_salt": mix_salt,
            "chunk_window": chunk_window,
            "chunk_stride": chunk_stride,
            "pack_budget": pack_budget,
            "shard_rows": shard_rows,
            "order_cols": list(order_cols),
            "incremental": incremental,
        }
        churn = None
        old_hashes = None
        man_path = f"{out_dir}/_manifest.json"
        if incremental and fsutil.exists(spark, man_path):
            old_manifest = json.loads(fsutil.read_text(spark, man_path))
            old_params = old_manifest.get("params", {})
            drift = {
                k: (old_params.get(k), v)
                for k, v in recipe_params.items()
                if old_params.get(k) != v
            }
            if drift:
                raise ValueError(
                    "incremental re-run over a manifest written with a "
                    f"DIFFERENT recipe — changed params: {drift}. A "
                    "recipe change is a new dataset (docs/ASSEMBLY.md); "
                    "write it to a fresh out_dir."
                )
            old_hashes = old_manifest.get("shard_hashes")

        # the eval write and the manifest's eval counts re-reference
        # the split chain (leakage join + md5 hashing) — stage it so
        # the write path computes the split once
        split = staged(split)
        if incremental:
            churn = write_shards_incremental(
                out, f"{out_dir}/train",
                order_cols=tuple(order_cols),
                old_hashes=old_hashes,
            )
        else:
            write_shards(
                out, f"{out_dir}/train", shard_rows,
                order_cols=tuple(order_cols),
            )
        eval_df = split.filter(F.col("split") != train_split)
        eval_df.write.mode("overwrite").partitionBy("split").parquet(
            f"{out_dir}/eval"
        )
        # the DATA CARD sidecar: recipe params, the read-back-verified
        # shard report, the per-source mix card (mix_report), eval
        # split sizes, and the funnel if one was collected — what a
        # training run records next to the data it consumed. All
        # numbers are measured from what was WRITTEN, not from the
        # plan (the shard report reads the published files back).
        if incremental:
            shard_report = verify_partitioned_shards(
                spark, f"{out_dir}/train",
                order_cols=tuple(order_cols),
            )
        else:
            shard_report = verify_shards(
                spark, f"{out_dir}/train",
                order_cols=tuple(order_cols),
            )
        card_tokens = (
            "n_chunk_tokens"
            if chunk_window is not None
            else (tokens_col if tokens_col in out.columns else None)
        )
        card = [
            {k: r[k] for k in r.asDict()}
            for r in sampling.mix_report(
                spark.read.parquet(f"{out_dir}/train"),
                source_col=source_col,
                id_col=id_col,
                tokens_col=card_tokens,
            ).orderBy(source_col).collect()
        ]
        eval_counts = {
            r["split"]: r["n"]
            for r in eval_df.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        manifest = {
            "params": recipe_params,
            "train": shard_report,
            "sources": card,
            "eval": eval_counts,
            "funnel": metrics,
        }
        if churn is not None:
            manifest["shard_hashes"] = churn["shard_hashes"]
            manifest["churn"] = {
                k: churn[k]
                for k in (
                    "n_shards", "n_rewritten", "rewritten",
                    "n_unchanged", "removed",
                )
            }
        fsutil.write_text(
            spark,
            man_path,
            json.dumps(manifest, indent=2, sort_keys=True),
        )
    return out
