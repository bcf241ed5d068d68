"""Deterministic sampling and dataset splitting for training-data
pipelines.

A 100 TB corpus needs reproducible, join-free, restart-stable
train/val/test assignment and per-stratum sampling — `rand()` fails
all three (new sample per retry/backfill, rows move between splits on
re-runs). Everything here derives from md5(salt || id): stable across
engines (the DuckDB oracles recompute it bit-identically), uniform,
and a pure narrow projection — no shuffle for split assignment, one
key shuffle for exact stratified sampling.

No reference analog (the reference has no sampling surface); these are
beyond-reference LLM-pipeline operators like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def hash_bucket(
    id_col: Column, salt: str = "", buckets: int = SPLIT_BUCKETS
) -> Column:
    """Uniform bucket in [0, buckets) from the first 8 md5 hex chars
    of salt:id — 32 bits of hash, engine-portable (DuckDB:
    ('0x' || substr(md5(..),1,8))::BIGINT)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Assign every row a deterministic split label by hash bucket:
    cumulative fraction thresholds over ``hash_bucket`` (insertion
    order of ``fractions``; they must sum to 1). A narrow projection —
    no shuffle, no sampling job, stable under re-runs and backfills:
    a given id lands in the same split forever (the property that
    keeps eval contamination out when the corpus grows).

    Adds ``split``; fraction resolution is 1/buckets."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col), salt, buckets)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        hi = round(acc * buckets)
        cond = b < F.lit(hi)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    # float-sum slack: the last threshold is buckets by construction,
    # but keep an otherwise to be total
    expr = expr.otherwise(F.lit(next(reversed(fractions))))
    return df.withColumn("split", expr)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Split assignment that cannot leak near-duplicates across
    splits: the hash key is the duplicate-cluster representative
    (``cluster_id`` from :func:`~cybersecurity_miw_spark.operators.
    dedup.dup_clusters` — the min reachable id), falling back to the
    doc's own id for unclustered docs. Every member of a component
    therefore lands in the SAME split — hashing raw doc ids instead
    (plain :func:`split_assign`) scatters a near-dup cluster across
    train AND test, which is exactly the eval-contamination channel
    dedup exists to close.

    Adds ``split_key`` (the key that was hashed) and ``split``.
    Unclustered docs get the identical label plain ``split_assign``
    would give them (coalesce to own id), so adopting the safe
    variant re-splits only clustered docs.

    100 TB shape: one left equi-join on the uniform doc-id key
    (clusters holds only docs that appear in >=1 confirmed pair —
    a small fraction of the corpus) followed by the same narrow
    join-free hash projection as ``split_assign``. Deterministic and
    backfill-stable: a cluster keeps its split forever unless new
    edges MERGE components, which only ever moves whole clusters.
    """
    reps = clusters.select(
        F.col(id_col).alias("_cl_doc"), F.col("cluster_id").alias("_cl_rep")
    )
    # no cast on the key: hash_bucket stringifies whatever it gets, and
    # a long cast would silently NULL non-numeric ids (string doc ids)
    # — every such row would fall through to split_assign's otherwise
    # branch and land in the last split (ADVICE r8)
    out = (
        df.join(reps, df[id_col] == F.col("_cl_doc"), "left")
        .withColumn("split_key", F.coalesce("_cl_rep", F.col(id_col)))
        .drop("_cl_doc", "_cl_rep")
    )
    return split_assign(
        out, fractions, id_col="split_key", salt=salt, buckets=buckets
    )


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """EXACT per-stratum sampling: ceil(fraction * |stratum|) rows from
    every stratum, chosen by md5 order (deterministic, engine-portable
    — unlike ``sampleBy``, which is Bernoulli-approximate and draws a
    different sample per run). One hash shuffle on the stratum key;
    both window functions reuse the same partitioning (single
    Exchange). The md5 rank is uniform, so the sample is unbiased
    within each stratum."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    w = Window.partitionBy(strata_col)
    rank_key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    wo = w.orderBy(rank_key)
    n_take = F.ceil(
        F.count(F.lit(1)).over(w) * F.lit(fraction)
    ).cast("long")
    return (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_take", n_take)
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )


def weighted_interleave(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic weighted data mixing: order rows so that any
    prefix of the output contains sources in proportion to
    ``weights`` — the standard corpus-mixing step before training.

    Each source's rows get a within-source md5-shuffled rank; the
    output key ``mix_key`` is (rank / weight): a weight-w source
    emits one row every 1/w key units, so proportions hold in every
    prefix (low-discrepancy interleave, not random sampling — no
    source ever starves or floods a window of the stream). Sources
    absent from ``weights`` are dropped.

    Scale shape: ONE exchange for the per-source rank window; the
    consumer orders by (mix_key, source, id) — Spark's range-
    partitioned total sort for a full shard write, or TakeOrdered for
    a prefix. Deliberately NO global row_number here: a global window
    would funnel the corpus through a single partition."""
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    rank_key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    wo = Window.partitionBy(source_col).orderBy(rank_key)
    wmap = F.create_map(
        *[
            x
            for name, wt in weights.items()
            for x in (F.lit(name), F.lit(float(wt)))
        ]
    )
    mix_key = (
        (F.row_number().over(wo).cast("double"))
        / wmap[F.col(source_col)]
    )
    return df.filter(
        F.col(source_col).isin(list(weights))
    ).withColumn("mix_key", mix_key)


def weighted_keep(
    df: DataFrame,
    weight_col: Column | str,
    id_col: str = "doc_id",
    salt: str = "qws-v1",
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Deterministic weight-proportional sampling: keep a row iff its
    hash bucket (uniform in [0, buckets)) falls below
    ``weight * buckets``, so each row survives with probability equal
    to its per-row weight in [0, 1] — e.g. sample documents
    proportionally to a quality score, the standard quality-weighted
    corpus downsampling step. Same md5-bucket machinery as
    ``split_assign``: a narrow shuffle-free projection, stable under
    re-runs and corpus growth (a given id keeps the same fate unless
    its weight changes), and exactly reproducible in ANSI SQL.

    Weights are clamped to [0, 1]; resolution is 1/buckets.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    b = hash_bucket(F.col(id_col), salt, buckets)
    return df.filter(b < F.floor(w * buckets))


def split_word_divergence(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    a: str = "train",
    b: str = "val",
) -> DataFrame:
    """Distribution-drift QA between two splits: Jensen-Shannon
    divergence of their add-one-smoothed word distributions — the
    check that a deterministic split didn't skew content (a healthy
    hash split scores near 0; topic- or time-correlated splits score
    high).

    Determinism across engines: every per-word term is computed from
    integer counts (identical doubles), floored to micro-nat int64
    units, and only THEN summed — an integer sum is partition-order
    independent, where summing raw doubles would not be. Returns one
    row: (n_vocab, js_micro_nats).

    Plan: one word explode → one (word × split) conditional-sum agg →
    per-word term expression → one global int sum. Two exchanges.
    """
    words = df.filter(F.col(split_col).isin(a, b)).select(
        F.col(split_col).alias("_s"),
        F.explode(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("w"),
    ).filter(F.length("w") > 0)
    counts = words.groupBy("w").agg(
        F.sum(F.when(F.col("_s") == a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("_s") == b, 1).otherwise(0)).alias("cb"),
    )
    # totals and vocab are three scalars — bounded driver traffic,
    # the IVF-centroid precedent — so the term expression uses
    # literals and stays a narrow projection
    tot = counts.agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb"), F.count("*").alias("v")
    ).first()
    ta, tb, v = tot["ta"], tot["tb"], tot["v"]
    p = (F.col("ca") + 1) / F.lit(float(ta + v))
    q = (F.col("cb") + 1) / F.lit(float(tb + v))
    m = (p + q) / 2
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    term_u = F.floor(term * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return counts.select(term_u.alias("_t")).agg(
        F.lit(v).alias("n_vocab"),
        F.sum("_t").alias("js_micro_nats"),
    )


def uniform_sample_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "usample-v1",
) -> DataFrame:
    """Exactly-k uniform sample without knowing N: rank rows by the
    md5 of their id and take the k smallest — a deterministic
    reservoir-sample equivalent (every id's rank is fixed, so the
    sample is stable across runs AND monotone under corpus growth:
    adding rows can only displace, never reshuffle, survivors).
    TakeOrdered shape — no global sort, no RNG."""
    rank = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return (
        df.withColumn("_rank", rank)
        .orderBy("_rank")
        .limit(k)
        .drop("_rank")
    )


def sample_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "gsample-v1",
) -> DataFrame:
    """Exactly-k deterministic sample PER GROUP: rank each group's
    rows by the md5 of their id (id tiebreak for the astronomically
    unlikely digest collision) and keep the k smallest — the
    per-stratum reservoir analog of :func:`uniform_sample_k`, with
    the same properties (no RNG, stable across runs, monotone under
    growth) per group. One window pass: a single hash exchange on the
    group key, rank within partitions — the same shape as top-N per
    key, so a skewed group costs its own size, nothing more."""
    from pyspark.sql.window import Window

    rank = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    score_col: str = "score_pm",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "budget-v1",
) -> DataFrame:
    """Greedy token-budget corpus selection: walk documents in
    (score DESC, md5(salt:id), id) order and keep every document
    whose INCLUSIVE running token sum stays <= ``budget_tokens`` —
    the "best docs until the budget is spent" primitive of LLM
    data curation (quality-weighted corpus capping). For budgets in
    REAL model tokens, pass ``tokens_col="n_tokens_exact"`` from
    tokenizer.token_counts_exact (the shipped frozen BPE vocabulary)
    instead of the default whitespace+CJK approximation.

    The logical spec is a single global ordered cumsum — which would
    be a one-partition window at corpus scale. Instead it runs
    bucket-decomposed, exploiting that ``score_col`` is a bounded
    integer grade (permille: <= 1001 distinct values):

    1. per-score token totals — one tiny agg (<= 1001 rows);
    2. exclusive prefix sums over that tiny table (a window over
       <= 1001 rows, bounded regardless of corpus size);
    3. broadcast-join the per-score offset back: scores whose whole
       bucket fits keep ALL rows with no further work;
    4. only the (at most one, when tokens are all positive) boundary
       bucket flows through a within-bucket running-sum window.

    The result is row-for-row identical to the global-cumsum spec
    (global run = bucket offset + within-bucket run; cross-bucket
    ties cannot exist because the bucket IS the score). Worst-case
    skew: every document sharing one score degrades to the naive
    single-partition window — the documented cost of exact greedy
    selection; use a finer score grid if that happens. Tokens must
    be non-negative (asserted nowhere hotter than this docstring:
    negative token counts would break the bucket-pruning bound)."""
    tb = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    tagged = df.select(
        id_col, score_col, tokens_col, tb.alias("_tb")
    )
    buckets = tagged.groupBy(score_col).agg(
        F.sum(tokens_col).alias("_btoks")
    )
    w = Window.orderBy(F.col(score_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # persisted: <= 1001 rows, read by BOTH branches below — without
    # it each branch re-runs the corpus agg that feeds it
    from cybersecurity_miw_spark.cache import tracked_persist

    offsets = tracked_persist(
        buckets.withColumn(
            "_before", F.coalesce(F.sum("_btoks").over(w), F.lit(0))
        )
    )
    # bcast-bound: offsets <= 1001 bucket rows (see bucket decomposition
    #   above)
    joined = tagged.join(F.broadcast(offsets), score_col)

    whole = joined.filter(
        F.col("_before") + F.col("_btoks") <= F.lit(budget_tokens)
    )
    wb = (
        Window.partitionBy(score_col)
        .orderBy(F.col("_tb").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        joined.filter(
            (F.col("_before") + F.col("_btoks") > F.lit(budget_tokens))
            & (F.col("_before") <= F.lit(budget_tokens))
        )
        .withColumn("_run", F.sum(tokens_col).over(wb))
        .filter(F.col("_before") + F.col("_run") <= F.lit(budget_tokens))
        .drop("_run")
    )
    return whole.unionByName(boundary).select(id_col, score_col, tokens_col)


_U52_DEN = float(1 << 52)  # 4503599627370496.0


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: Column | str,
    id_col: str = "doc_id",
    salt: str = "ws-v1",
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, public algorithm): each row draws a
    deterministic uniform u from 52 md5 bits of salt:id and gets key
    ln(u)/w; the k LARGEST keys win — inclusion probability is
    weight-proportional at every step, the exact-k complement of the
    Bernoulli :func:`weighted_keep`.

    Same determinism contract as the rest of this module: no RNG, a
    row's fate depends only on (salt, id, weight), re-runs and
    backfills agree, and the DuckDB oracle recomputes the identical
    key. Keys floor to 1e-12-resolution int64 BEFORE ordering so the
    cross-engine sort compares integers (id tiebreak for the
    vanishing chance of a quantized tie). Non-positive weights are
    dropped (they can never win under A-ES semantics).

    Scale shape: a narrow projection plus ONE TakeOrdered(k) — no
    global sort, no window, no shuffle beyond the top-k reduction."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1, 13,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(_U52_DEN)
    score_u = F.floor(F.log(u) / w * F.lit(1e12)).cast("long")
    return (
        df.filter(w > 0)
        .withColumn("score_u", score_u)
        .orderBy(F.desc("score_u"), F.asc(id_col))
        .limit(k)
    )


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    temperature: float = 2.0,
) -> dict[str, float]:
    """Temperature-scaled multinomial source weights — the standard
    LLM data-recipe mixing rule (sample source i with probability
    ∝ share_i^(1/T), e.g. GPT-3 / PaLM / LLaMA corpus tables): T=1
    reproduces natural proportions, T→∞ approaches uniform, T in
    (1, 5] upweights small high-quality sources without drowning the
    head. One groupBy-count to the driver — bounded by the number of
    DISTINCT SOURCES (a model constant, not corpus-sized). Counts are
    raised to 1/T and normalized in sorted-source order so the
    returned dict is bit-deterministic across runs and engines."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = sorted(
        (r[0], r[1])
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    )
    powed = [(s, float(n) ** (1.0 / temperature)) for s, n in counts]
    tot = 0.0
    for _, p in powed:
        tot += p
    return {s: p / tot for s, p in powed}


def mix_to_budget(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    temperature: float = 2.0,
    max_epochs: int = 4,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    weights: dict[str, float] | None = None,
    metrics: list | None = None,
) -> DataFrame:
    """Repetition-capped temperature mixing to a token budget — the
    missing half of the published LLM data recipe
    (:func:`temperature_weights` reweights but never repeats): fill
    ``budget_tokens`` with sources in temperature-scaled TOKEN
    proportion, UPSAMPLING small hot sources by whole-corpus epochs
    but never past ``max_epochs`` (the Muennighoff et al.
    data-constrained scaling rule: ~4 epochs of repeated data retain
    most of their value, unbounded repetition does not), while large
    sources truncate to their allocation. Emits one row per
    (document, epoch) with ``epoch`` (0-based) and the
    interleave-contract ``mix_key``.

    Allocation is driver-side water-filling over per-source scalars
    (one groupBy agg, bounded by the number of distinct sources):
    each round splits the remaining budget over still-active sources
    by weight ``p_s = tok_s^(1/T)`` (or explicit ``weights``); a
    source whose share reaches its cap ``max_epochs * tok_s`` is
    frozen at the cap and the surplus re-fills the rest (≤ one round
    per source). All float arithmetic is evaluated in sorted-source
    order so the targets are bit-deterministic across runs AND
    engines (the :func:`temperature_weights` discipline — the DuckDB
    oracle unrolls the identical rounds). For budgets in REAL model
    tokens, pass ``tokens_col="n_tokens_exact"`` from
    tokenizer.token_counts_exact (the shipped frozen BPE vocab).

    Within a source the emission order is the md5(salt:id) rank used
    by every mixer here: full epochs repeat the whole source; the
    final partial epoch is the greedy md5-order PREFIX whose
    INCLUSIVE running token sum fits the leftover
    ``rem_s = target_s % tok_s`` (budget_select semantics), so which
    docs repeat an extra time is deterministic. ``mix_key`` scales
    the within-source token position ``epoch*tok_s + running_sum`` by
    ``total_target / target_s``: every prefix of the
    (mix_key, source, id, epoch) order holds sources in final
    token-allocation proportion, and the full output spans
    [0, total_target].

    Scale shape: ONE window exchange on the source key (row rank and
    running sum share the partitioning), a ≤(max_epochs+1)-wide
    epoch explode, and source-bounded map literals — no global
    window, no driver loop over rows. Tokens must be non-negative
    (the bucket-pruning bound, as in ``budget_select``).

    ``metrics``: pass a list to receive one allocation dict per
    emitting source: {source, weight, cap_tokens, target_tokens,
    capped, full_epochs, rem_tokens} — the mixing-recipe report.
    """
    import math

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if weights is not None and any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")

    stats = sorted(
        (r[0], int(r[1]))
        for r in df.groupBy(source_col)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"))
        .collect()
        if r[0] is not None and r[1] is not None and int(r[1]) > 0
        and (weights is None or r[0] in weights)
    )
    toks = dict(stats)
    powed = {
        s: (
            float(weights[s])
            if weights is not None
            else float(t) ** (1.0 / temperature)
        )
        for s, t in stats
    }
    caps = {s: max_epochs * t for s, t in stats}

    target: dict[str, int] = {}
    active = [s for s, _ in stats]
    remaining = int(budget_tokens)
    while active and remaining > 0:
        p_tot = 0.0
        for s in active:  # sorted order: bit-deterministic sum
            p_tot += powed[s]
        alloc = {
            s: math.floor(remaining * (powed[s] / p_tot)) for s in active
        }
        newly_capped = [s for s in active if alloc[s] >= caps[s]]
        if not newly_capped:
            target.update(alloc)
            break
        for s in newly_capped:
            target[s] = caps[s]
            remaining -= caps[s]
        active = [s for s in active if s not in newly_capped]
    for s, _ in stats:
        target.setdefault(s, 0)

    total_target = sum(target.values())
    full = {s: target[s] // toks[s] for s, _ in stats}
    rem = {s: target[s] % toks[s] for s, _ in stats}
    if metrics is not None:
        for s, _ in stats:
            metrics.append({
                "source": s,
                "weight": powed[s],
                "cap_tokens": caps[s],
                "target_tokens": target[s],
                "capped": target[s] == caps[s],
                "full_epochs": full[s],
                "rem_tokens": rem[s],
            })

    emitting = [s for s, _ in stats if target[s] > 0]
    if not emitting or total_target == 0:
        return (
            df.withColumn("epoch", F.lit(0))
            .withColumn("mix_key", F.lit(0.0))
            .limit(0)
        )

    def _imap(d: dict[str, int]) -> Column:
        return F.create_map(
            *[x for s in emitting for x in (F.lit(s), F.lit(int(d[s])))]
        )

    factor = {s: float(total_target) / float(target[s]) for s in emitting}
    src = F.col(source_col)
    wo = Window.partitionBy(source_col).orderBy(
        F.md5(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ).asc(),
        F.col(id_col).asc(),
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = (
        df.filter(src.isin(emitting))
        .withColumn("_cum", cum)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), _imap(full)[src])),
        )
    )
    keep = (F.col("epoch") < _imap(full)[src]) | (
        (_imap(rem)[src] > 0) & (F.col("_cum") <= _imap(rem)[src])
    )
    fmap = F.create_map(
        *[x for s in emitting for x in (F.lit(s), F.lit(factor[s]))]
    )
    mix_key = (
        (F.col("epoch") * _imap(toks)[src] + F.col("_cum"))
        .cast("double")
        * fmap[src]
    )
    return staged.filter(keep).withColumn("mix_key", mix_key).drop("_cum")


def mix_report(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Per-source DATASET CARD of a mixed training set — the
    measured counterpart of the mixing recipe (what
    :func:`mix_to_budget`'s ``metrics`` list PLANS, this reports from
    the data, so it also audits hand-built or historical mixes):

    * ``n_rows`` — emitted (doc, epoch) rows,
    * ``n_docs`` — distinct documents,
    * ``effective_epochs`` — n_rows / n_docs, the actual repetition
      factor (the number a data-constrained-scaling audit checks
      against the max-epochs cap),
    * ``max_epoch`` — highest epoch index (0 when ``epoch_col`` is
      absent, i.e. a repetition-free mix),
    * with ``tokens_col``: ``tokens`` (sum over emitted rows — counts
      repeats, the training-token view) and ``token_share`` — this
      source's fraction of the final mix, the number to compare
      against the recipe's intended weights.

    Scale shape: ONE hash aggregation on the source key over the
    mixed frame (countDistinct adds its standard expand-exchange);
    the share window runs over the aggregated frame, which is
    sources-bounded — never over rows."""
    has_epoch = epoch_col in df.columns
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col(id_col)).alias("n_docs"),
        (
            F.max(F.col(epoch_col).cast("long")) if has_epoch else F.lit(0).cast("long")
        ).alias("max_epoch"),
    ]
    if tokens_col is not None:
        aggs.append(F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
    rep = df.groupBy(source_col).agg(*aggs).withColumn(
        "effective_epochs",
        F.col("n_rows").cast("double") / F.col("n_docs").cast("double"),
    )
    if tokens_col is not None:
        # sources-bounded frame: the global window is over <= a few
        # hundred aggregated rows, never the corpus
        rep = rep.withColumn(
            "token_share",
            F.col("tokens").cast("double")
            / F.sum("tokens").over(Window.partitionBy()).cast("double"),
        )
    return rep


def temperature_interleave(
    df: DataFrame,
    source_col: str = "source",
    temperature: float = 2.0,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """:func:`weighted_interleave` with :func:`temperature_weights`
    applied automatically — the turnkey temperature-mixing step:
    order the corpus so every output prefix holds sources in
    temperature-scaled proportion. Same low-discrepancy interleave
    (one per-source rank window, no global row_number) and the same
    ``mix_key`` contract as the explicit-weights form."""
    return weighted_interleave(
        df,
        source_col,
        temperature_weights(df, source_col, temperature),
        id_col,
        salt,
    )
