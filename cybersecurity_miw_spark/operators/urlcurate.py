"""URL/domain-level corpus curation — the stage published web-corpus
recipes run BEFORE any text-level filtering (C4 strips pages by URL
blocklist, Raffel et al. 2020 §2.2; RefinedWeb's first pipeline stage
is "URL filtering" with a blocklist + URL scoring, Penedo et al. 2023
§3.1; Dolma's web pipeline likewise opens with URL dedup and domain
blocklists). The engine had every dedup shape and the URL *parsing*
primitives (functions/url.py — reference miw/log_format.cc:473-500)
but no URL-keyed curation operators; this module closes that gap
(VERDICT r15 missing #1).

Four operators, all JVM-side string/array expressions (no UDF) so a
DuckDB twin exists for each:

* :func:`canonical_url` — Column→Column canonicalization: lowercase
  scheme/host, strip fragment + tracking params + default ports,
  normalize the empty path. Documented, engine-portable rules.
* :func:`registrable_domain` — Public-Suffix-List "eTLD+1"
  extraction as a bounded candidate-suffix explode + broadcast rule
  join (rules table ≤ the PSL's ~10k rows — broadcast-sized by
  construction at any corpus scale).
* :func:`domain_filter` — blocklist/allowlist by domain-suffix
  match, the C4/RefinedWeb gate, same explode+broadcast-join shape.
* :func:`url_exact_dedup` — one survivor (min id) per canonical
  URL, the md5-fingerprint groupBy shape of
  :func:`~cybersecurity_miw_spark.operators.dedup.exact_dedup` —
  no join-back, scales like every fingerprint dedup here.

100 TB plan shape: canonicalization is pure whole-stage-codegen row
expressions; the domain operators explode ≤ max-rule-labels
candidates per row (a constant ≤ 5 with the shipped list) and join
them against a broadcast rules/entries table, then semi/anti-join
back on the row id — no shuffle wider than the id key, nothing
pairwise, nothing driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking/click-id query parameters stripped by canonical_url, plus
# every name starting with "utm_" (the Google Analytics family). The
# defaults are names that UNAMBIGUOUSLY identify a CLICK, never a
# resource, across the published uBlock/Brave/ClearURLs lists — so
# two visits to the same page differ only by them. Ambiguous names
# the published lists strip only on specific domains ('ref' selects a
# branch on code forges, 'ref_src' is Twitter-only) are deliberately
# NOT defaulted (ADVICE r16: stripping a content-bearing 'ref' merges
# genuinely distinct pages and url_exact_dedup then DROPS real
# documents); recipes that curate consumer-web crawls can opt in:
#
#     canonical_url(col, tracking_params=TRACKING_PARAMS
#                   + ("ref", "ref_src"))
TRACKING_PARAMS = (
    "gclid",
    "dclid",
    "gbraid",
    "wbraid",
    "fbclid",
    "msclkid",
    "yclid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "mkt_tok",
    "spm",
    "s_kwcid",
    "_ga",
    "_gl",
    "_hsenc",
    "_hsmi",
    "vero_id",
    "oly_anon_id",
    "oly_enc_id",
)

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# query = everything between the FIRST '?' (before any '#') and '#'
_QUERY = r"^[^#?]*\?([^#]*)"

DEFAULT_SUFFIX_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


def canonical_url(
    url: Column, tracking_params: tuple = TRACKING_PARAMS
) -> Column:
    """Canonical form of a URL column, as a pure expression:

    1. scheme and host lowercased; trailing dots stripped from the
       host; userinfo (if any) preserved verbatim;
    2. fragment dropped;
    3. default ports dropped (``:80`` for http, ``:443`` for https);
       other ports kept;
    4. empty path normalized to ``/``;
    5. query parameters whose (lowercased) name is in
       ``tracking_params`` or starts with ``utm_`` are removed;
       remaining parameters keep their original order; empty
       ``&&`` tokens are dropped; a query left empty loses its
       ``?``.

    Rows with no ``scheme://`` prefix, IPv6-literal authorities
    (``://[``), and authorities whose post-host remainder is neither
    empty nor ``:<digits>`` (a malformed port like ``:8a0`` — ADVICE
    r16: silently deleting it merged the URL with its port-less twin)
    pass through trimmed-but-unchanged — the same pass-through
    contract as
    :func:`~cybersecurity_miw_spark.functions.url.url_template`
    (reference miw/log_format.cc:481-484). C4/RefinedWeb cite URL
    normalization before URL dedup; these rules are the portable
    core every recipe agrees on (case, fragment, tracking params).

    RFC 3986 §6.2.2 percent-encoding normalization (``%7e``→``~``,
    ``%3a``→``%3A``) is a SEPARATE composable step —
    :func:`pct_normalize_url` — not folded in here, so the
    canonical form of stored URL fingerprints is stable for callers
    who opted out; recipes chain
    ``canonical_url(pct_normalize_url(col))``.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    auth = F.regexp_extract(u, _AUTH, 1)
    path = F.regexp_extract(u, _PATH, 1)
    query = F.regexp_extract(u, _QUERY, 1)

    userinfo = F.regexp_extract(auth, r"^(.*@)", 1)
    hostport = F.regexp_replace(auth, r"^.*@", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"\.+$", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    path_part = F.when(path == "", F.lit("/")).otherwise(path)

    tracked = [t.lower() for t in tracking_params]

    def _keep(p: Column) -> Column:
        name = F.lower(F.regexp_extract(p, r"^([^=]*)", 1))
        drop = name.startswith("utm_")
        if tracked:
            drop = drop | name.isin(*tracked)
        return (p != "") & ~drop

    q2 = F.array_join(F.filter(F.split(query, "&"), _keep), "&")
    q_part = F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2))

    composed = F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path_part, q_part
    )
    # post-host remainder of the authority: '' or ':<digits>' is a
    # well-formed (possibly absent) port; anything else is a malformed
    # authority we must not silently "repair" by dropping it
    hp_rest = F.regexp_replace(hostport, r"^[^:]*", "")
    bad_port = (hp_rest != "") & (
        F.regexp_extract(hp_rest, r"^(:[0-9]+)$", 1) == ""
    )
    skip = (
        (F.regexp_extract(u, _SCHEME, 1) == "")
        | u.contains("://[")
        | bad_port
    )
    return F.when(skip, u).otherwise(composed)


def pct_normalize_url(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization as a pure
    expression (no UDF): decode triplets that encode UNRESERVED
    characters (``%41``→``A``, ``%7E``→``~`` — ALPHA / DIGIT /
    ``-._~``, §2.3) and uppercase the hex digits of every other
    triplet (``%2f``→``%2F``); reserved octets stay ENCODED, so
    ``%2F`` never becomes a path ``/`` and genuinely distinct paths
    never merge (the trap a blanket url-decode walks into). A ``%``
    not followed by two hex digits is not a triplet and passes
    through verbatim, the lenient what-browsers-do reading.

    Shape: one ``split('%')`` → per-piece branch inside ``transform``
    (strpos-arithmetic hex decode, no lookup table) → ``array_join``.
    Piece count = occurrences of ``%`` per URL, so the cost is
    proportional to the encodings actually present — the ~260-pass
    replace chain the r16 docstring rejected is avoided. Both
    normalizations are safe ANYWHERE in a URL (unreserved characters
    never act as delimiters), so one whole-string pass needs no
    component parse. Single-pass, like a browser: a literal ``%``
    followed by text that only becomes a triplet after decoding
    (``%%34%31`` → ``%41``) is NOT re-decoded — the same contract as
    the ``re.sub`` reference model in the property suite, and
    idempotent on any URL whose every ``%`` starts a well-formed
    triplet. Compose with :func:`canonical_url`:
    ``canonical_url(pct_normalize_url(col))`` merges the
    ``/%7Euser``-vs-``/~user`` duplicates href-extracted corpora
    carry (RFC 3986 §6.2.2.2; cc_net/RefinedWeb normalize before
    URL dedup).
    """
    pieces = F.split(url, "%", -1)

    def _norm(p: Column) -> Column:
        hx = F.upper(F.substring(p, 1, 2))
        rest = F.substring(p, 3, _MAX_LEN)
        code = (
            F.instr(F.lit("0123456789ABCDEF"), F.substring(hx, 1, 1)) - 1
        ) * 16 + (
            F.instr(F.lit("0123456789ABCDEF"), F.substring(hx, 2, 1)) - 1
        )
        unreserved = (
            ((code >= 65) & (code <= 90))        # A-Z
            | ((code >= 97) & (code <= 122))     # a-z
            | ((code >= 48) & (code <= 57))      # 0-9
            | code.isin(45, 46, 95, 126)         # - . _ ~
        )
        dec = F.when(unreserved, F.char(code)).otherwise(
            F.concat(F.lit("%"), hx)
        )
        return F.when(
            p.rlike("^[0-9A-Fa-f]{2}"), F.concat(dec, rest)
        ).otherwise(F.concat(F.lit("%"), p))

    normed = F.concat(
        F.element_at(pieces, 1),
        F.array_join(
            F.transform(F.slice(pieces, 2, _PIECE_CAP), _norm), ""
        ),
    )
    # a URL with no '%' must round-trip byte-identically without
    # paying the transform at all — the overwhelmingly common row
    return F.when(url.contains("%"), normed).otherwise(url)


# substring() needs an explicit length; URLs are bounded far below
# this. _PIECE_CAP bounds slice() the same way (slice length must be
# positive) — 2^20 '%'s in one URL is beyond any real input.
_MAX_LEN = 1 << 30
_PIECE_CAP = 1 << 20


def url_host(url: Column) -> Column:
    """Lowercased host of a URL column ('' when the URL has no
    ``scheme://`` authority) — the key every domain operator here
    derives when given URLs instead of hosts."""
    auth = F.regexp_extract(F.trim(url), _AUTH, 1)
    hostport = F.regexp_replace(auth, r"^.*@", "")
    return F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"\.+$", ""
    )


def load_public_suffix_rules(path: str | None = None) -> list[dict]:
    """Parse a Public-Suffix-List-format file (publicsuffix.org: one
    rule per line, ``//`` comments, ``*.`` wildcards, ``!``
    exceptions) into rule dicts ``{rule, n_labels, exc}``. The
    shipped ``data/public_suffix_list.dat`` is a compact documented
    subset; the full Mozilla list is a drop-in replacement."""
    rules = []
    with open(path or DEFAULT_SUFFIX_FILE, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            exc = line.startswith("!")
            rule = line[1:] if exc else line
            rules.append(
                {
                    "rule": rule.lower(),
                    "n_labels": rule.count(".") + 1,
                    "exc": exc,
                }
            )
    if not rules:
        raise ValueError(f"no rules in public suffix file {path}")
    return rules


def _candidate_suffixes(max_k: int) -> Column:
    """All label-suffix candidates of ``_labels`` up to ``max_k``
    labels, as (key, k) structs: for each k the exact suffix (last k
    labels) and, for k ≥ 2, the wildcard form ``*.<last k-1 labels>``
    — the two shapes a PSL rule can take. Bounded: ≤ 2·max_k structs
    per row, max_k a small constant of the rule file. Empty label
    arrays (no host) must short-circuit: sequence(1, 0) DESCENDS, the
    same trap the gopher gram explode documents."""
    return F.expr(
        f"""
        IF(size(_labels) < 1, array(),
        filter(
          flatten(transform(sequence(1, least(size(_labels), {max_k})),
            k -> array(
              named_struct(
                'key',
                array_join(slice(_labels, size(_labels) - k + 1, k), '.'),
                'k', k),
              named_struct(
                'key',
                IF(k >= 2,
                   concat('*.', array_join(
                     slice(_labels, size(_labels) - k + 2, k - 1), '.')),
                   CAST(NULL AS STRING)),
                'k', k)))),
          c -> c.key IS NOT NULL))
        """
    )


def registrable_domain(
    df: DataFrame,
    host_col: str | None = None,
    url_col: str | None = None,
    out_col: str = "registrable_domain",
    id_col: str = "doc_id",
    rules: list[dict] | None = None,
) -> DataFrame:
    """Attach the registrable domain ("eTLD+1") of each row's host
    under ``out_col`` — the key RefinedWeb/Dolma-style recipes
    aggregate, filter, and dedup on. Implements the PSL algorithm:
    the prevailing rule is any matching EXCEPTION rule, else the
    matching rule with the most labels, else the default rule ``*``
    (every unknown TLD is a public suffix); the registrable domain is
    the public suffix plus one label, NULL when the host IS a public
    suffix (or is empty).

    Plan: split the host into labels, emit the ≤ 2·max_k bounded
    candidate set, broadcast-join it to the rule table, take the
    per-row prevailing rule with one max-of-struct agg on the row id,
    and left-join the winner back — candidate volume is rows ×
    small-constant, the rules side is always broadcast."""
    if (host_col is None) == (url_col is None):
        raise ValueError("pass exactly one of host_col / url_col")
    rules = rules if rules is not None else load_public_suffix_rules()
    max_k = max(r["n_labels"] for r in rules)
    spark = df.sparkSession
    rules_df = spark.createDataFrame(
        [(r["rule"], r["n_labels"], r["exc"]) for r in rules],
        "rule string, rule_labels int, exc boolean",
    )

    host = (
        F.lower(F.col(host_col))
        if host_col is not None
        else url_host(F.col(url_col))
    )
    with_labels = df.withColumn("_host", host).withColumn(
        "_labels",
        F.filter(F.split(F.col("_host"), r"\."), lambda x: F.length(x) > 0),
    )
    cands = with_labels.select(
        F.col(id_col), F.explode(_candidate_suffixes(max_k)).alias("_c")
    ).select(
        id_col, F.col("_c.key").alias("_key"), F.col("_c.k").alias("_k")
    )
    # prevailing rule: exceptions beat everything (PSL §Algorithm),
    # then most labels; an exception's public suffix is the rule
    # minus its leftmost label (k-1), a normal match's is k
    matched = (
        # bcast-bound: rules_df = the PSL rule file (~10k rows max for
        # the full Mozilla list; ~100 for the shipped subset) — a
        # data-file constant, never sf-scaled
        cands.join(F.broadcast(rules_df), cands["_key"] == rules_df["rule"])
        .select(
            id_col,
            F.col("exc").cast("int").alias("_e"),
            F.col("_k"),
            F.when(F.col("exc"), F.col("_k") - 1)
            .otherwise(F.col("_k"))
            .alias("_ps"),
        )
        .groupBy(id_col)
        .agg(F.max(F.struct("_e", "_k", "_ps")).alias("_win"))
        .select(id_col, F.col("_win._ps").alias("_ps"))
    )
    out = (
        with_labels.join(matched, id_col, "left")
        .withColumn("_ps", F.coalesce("_ps", F.lit(1)))
        .withColumn(
            out_col,
            F.when(
                F.size("_labels") > F.col("_ps"),
                F.array_join(
                    F.slice(
                        F.col("_labels"),
                        F.size("_labels") - F.col("_ps"),
                        F.col("_ps") + 1,
                    ),
                    ".",
                ),
            ),
        )
    )
    return out.drop("_host", "_labels", "_ps")


def domain_filter(
    df: DataFrame,
    host_col: str | None = None,
    url_col: str | None = None,
    blocklist: tuple = (),
    allowlist: tuple = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop rows whose host matches the blocklist, and (when an
    allowlist is given) keep only rows matching it — the C4 "bad
    URL" gate / RefinedWeb blocklist stage. An entry matches a host
    when the host equals it or is a subdomain of it
    (``host == e or host.endswith('.' + e)``), case-insensitive.

    Plan: explode each host's label suffixes up to the longest
    entry's label count (bounded constant), broadcast-join against
    the entry table once, then one anti-join (blocklist) and/or
    semi-join (allowlist) back on the row id — entry lists of any
    published size (C4's blocklist is ~400k entries) stay the
    broadcast side."""
    if (host_col is None) == (url_col is None):
        raise ValueError("pass exactly one of host_col / url_col")
    if not blocklist and not allowlist:
        return df
    host = (
        F.lower(F.col(host_col))
        if host_col is not None
        else url_host(F.col(url_col))
    )
    spark = df.sparkSession
    out = df
    with_labels = df.withColumn("_host", host).withColumn(
        "_labels",
        F.filter(F.split(F.col("_host"), r"\."), lambda x: F.length(x) > 0),
    )

    def _matches(entries: tuple) -> DataFrame:
        ents = sorted({e.lower().strip(".") for e in entries if e.strip(".")})
        if not ents:
            raise ValueError(
                "domain list contains no usable entries (all empty "
                "after trimming dots)"
            )
        max_k = max(e.count(".") + 1 for e in ents)
        ent_df = spark.createDataFrame([(e,) for e in ents], "entry string")
        cands = with_labels.select(
            F.col(id_col),
            F.explode(
                # empty label arrays short-circuit: sequence(1, 0)
                # descends (see _candidate_suffixes)
                F.expr(
                    f"IF(size(_labels) < 1, array(), "
                    f"transform(sequence(1, least(size(_labels), {max_k})), "
                    "k -> array_join("
                    "slice(_labels, size(_labels) - k + 1, k), '.')))"
                )
            ).alias("_key"),
        )
        return cands.join(
            # bcast-bound: ent_df = the caller's block/allow list (the
            # published lists are ~400k entries max) — config-sized,
            # never sf-scaled
            F.broadcast(ent_df), cands["_key"] == ent_df["entry"]
        ).select(id_col).distinct()

    if allowlist:
        out = out.join(_matches(allowlist), id_col, "left_semi")
    if blocklist:
        out = out.join(_matches(blocklist), id_col, "left_anti")
    return out


def url_exact_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    canonicalize: bool = True,
) -> DataFrame:
    """Keep one representative (min id) per canonical URL — "one
    document per page", the URL-level dedup C4/RefinedWeb run before
    any text-level dedup. Same shape as
    :func:`~cybersecurity_miw_spark.operators.dedup.exact_dedup`:
    md5 the canonical URL (128-bit, collision-safe at any corpus
    size, and a fixed-width shuffle key instead of an unbounded
    string), min-id per fingerprint, one semi-join back."""
    cu = canonical_url(F.col(url_col)) if canonicalize else F.col(url_col)
    keep = (
        df.select(F.md5(cu).alias("_ufp"), F.col(id_col))
        .groupBy("_ufp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="left_semi")


def url_fingerprint_store(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    canonicalize: bool = True,
) -> DataFrame:
    """The compact URL-dedup ingest index a crawl pipeline PERSISTS
    (the :func:`~cybersecurity_miw_spark.operators.dedup.
    fingerprint_store` shape, URL-keyed): one (url_fingerprint,
    representative) row per distinct canonical URL processed so far.
    At re-crawl scale you never re-dedup history against itself —
    append each accepted batch's new fingerprints and anti-join
    incoming batches (:func:`url_dedup_against_store`)."""
    cu = canonical_url(F.col(url_col)) if canonicalize else F.col(url_col)
    return (
        df.select(F.md5(cu).alias("url_fingerprint"), F.col(id_col))
        .groupBy("url_fingerprint")
        .agg(F.min(id_col).alias("representative"))
    )


def url_dedup_against_store(
    new_docs: DataFrame,
    store: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    canonicalize: bool = True,
) -> DataFrame:
    """Incremental URL-exact dedup: the subset of ``new_docs`` whose
    canonical URL is unseen in the ``store``
    (:func:`url_fingerprint_store` schema) AND first (min-id) within
    its own batch — "only fetch pages we have not already kept", the
    re-crawl gate. One anti-join + one min-agg on the uniform
    fingerprint key; history rows are never rescanned."""
    cu = canonical_url(F.col(url_col)) if canonicalize else F.col(url_col)
    tagged = new_docs.select(F.col(id_col), F.md5(cu).alias("_ufp"))
    fresh = tagged.join(
        store.select(F.col("url_fingerprint").alias("_ufp")),
        "_ufp",
        "left_anti",
    )
    keep = fresh.groupBy("_ufp").agg(F.min(id_col).alias(id_col))
    return new_docs.join(keep.select(id_col), id_col, "left_semi")


def url_quality_flags(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_url_len: int = 2048,
    max_path_depth: int = 12,
    max_host_digit_frac: float = 0.4,
    max_subdomain_labels: int = 6,
    badwords: tuple = (),
) -> DataFrame:
    """URL scoring heuristics — the RefinedWeb §3.1 "URL filtering"
    half that is not a blocklist: structural signals that a URL is
    machine-generated, spammy, or adult, computed as pure row
    expressions. One row per input with the signal columns and
    ``keep`` under the documented thresholds:

    * ``url_len`` — full trimmed length (crawler-trap URLs run long);
    * ``path_depth`` — count of ``/``-separated non-empty path
      segments (deep auto-generated hierarchies);
    * ``host_digit_frac`` — digit fraction of the host's characters
      (rounded micro-exact; throwaway/CDN hosts are digit-heavy);
    * ``n_host_labels`` — dot-separated host labels (subdomain
      farms);
    * ``has_badword`` — case-insensitive substring match of any
      ``badwords`` term against the WHOLE url (the published adult/
      fraud word lists match url substrings, not just the host).

    ``keep`` = under every threshold and badword-free. URLs without
    a scheme get host-derived signals from an empty host (0 labels,
    digit frac 0) — only the length/badword rules can reject them."""
    u = F.trim(F.col(url_col))
    host = url_host(F.col(url_col))
    path = F.regexp_extract(u, _PATH, 1)
    url_len = F.length(u)
    path_depth = F.size(
        F.filter(F.split(path, "/"), lambda x: F.length(x) > 0)
    )
    n_digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    host_len = F.length(host)
    digit_frac = F.when(host_len > 0, n_digits / host_len).otherwise(
        F.lit(0.0)
    )
    digit_frac = (
        F.floor(digit_frac * F.lit(1_000_000.0) + F.lit(0.5))
        / F.lit(1_000_000.0)
    )
    n_labels = F.size(
        F.filter(F.split(host, r"\."), lambda x: F.length(x) > 0)
    )
    low = F.lower(u)
    has_bad = F.lit(False)
    for b in badwords:
        has_bad = has_bad | low.contains(b.lower())
    keep = (
        (url_len <= F.lit(int(max_url_len)))
        & (path_depth <= F.lit(int(max_path_depth)))
        & (digit_frac <= F.lit(float(max_host_digit_frac)))
        & (n_labels <= F.lit(int(max_subdomain_labels)))
        & ~has_bad
    )
    return df.select(
        F.col(id_col),
        url_len.cast("long").alias("url_len"),
        path_depth.cast("long").alias("path_depth"),
        digit_frac.alias("host_digit_frac"),
        n_labels.cast("long").alias("n_host_labels"),
        has_bad.alias("has_badword"),
        keep.alias("keep"),
    )


def compact_url_fingerprint_store(
    spark, store_dir: str, target_files: int = 1
) -> dict:
    """Compact a persisted :func:`url_fingerprint_store` directory:
    collapse duplicate URL fingerprints (min representative wins —
    the same tie-break ingest uses; duplicates accumulate from
    checkpoint replays and the streaming loop's per-trigger appends)
    and rewrite into ``target_files`` files — the same atomic
    rewrite_table lifecycle every other store family here has."""
    from pyspark.sql import DataFrame

    from cybersecurity_miw_spark.sources.maintain import rewrite_table

    def collapse(df: DataFrame) -> DataFrame:
        return df.groupBy("url_fingerprint").agg(
            F.min("representative").alias("representative")
        )

    return rewrite_table(spark, store_dir, collapse, target_files)
