"""Common Crawl index (CDX) source — targeted acquisition WITHOUT
scanning the crawl. A published crawl ships three artifacts: the WARC
files (~100 TB), a compressed CDXJ index of every capture (~300
shards, cdx-00000.gz …), and ``cluster.idx`` — a tiny secondary
index of the first SURT key in each compressed block of each shard.
Real consumers (pywb, cdx-toolkit, the cc-pyspark examples) never
scan WARCs to find a domain subset; they binary-search cluster.idx,
fetch only the intersecting index blocks, parse the CDXJ lines, and
then byte-range-fetch exactly the selected WARC records. This module
is that chain as DataFrame ops:

``read_cluster_idx`` → :func:`select_index_shards` (which index
blocks intersect my SURT prefixes) → ``read_cdx`` /
:func:`cdx_records` (parse CDXJ lines) → :func:`cdx_select_records`
(status/mime/domain/latest-capture policy) → a ``(url, filename,
offset, length)`` FETCH LIST.

Byte-range fetch contract (the cc-index convention): for each
selection row, issue a ranged read of ``filename`` for bytes
``[offset, offset + length)``; the result is ONE complete gzip
member containing ONE WARC record, directly consumable by
``sources/warc.py``'s incremental parser (reference: the WARC
source's per-record-member layout note). The fetch itself is an
environment-bound I/O step (HTTP Range / object-store ranged GET);
everything up to the list is pure Spark.

Formats (public, stable since 2015):

* CDXJ line: ``<SURT key> <ts14> <JSON>`` — e.g.
  ``com,example)/path 20240125123456 {"url": "https://example.com/
  path", "mime": "text/html", "status": "200", "digest": "…",
  "length": "1234", "offset": "5678", "filename":
  "crawl-data/…/file.warc.gz"}``
* cluster.idx line (tab-separated):
  ``<SURT key> <ts14>\t<cdx shard>\t<offset>\t<length>\t<seq>`` —
  the first key of each compressed block, the shard file holding it,
  and the block's byte range inside that shard.

Everything here is expression-only (regexp + from_json + window) —
no Python in the data path; index tables are crawl-index-bounded
(billions of CDXJ rows at full scale, but that is still ~1/1000 of
the WARC bytes, and the cluster.idx pre-filter cuts it to the
blocks that can match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# capture fields the cc-index JSON carries; all parsed as strings
# then typed individually (status/offset/length are numeric strings)
CDX_JSON_SCHEMA = "map<string,string>"

_CDXJ_RE = r"^(\S+) (\d{14}) (\{.*\})\s*$"


def cdx_records(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse CDXJ lines into typed capture rows: ``(surt_key, ts,
    url, mime, status, digest, offset, length, filename,
    is_valid)``. A line that does not match the ``<key> <ts14>
    <json>`` frame, or whose JSON lacks a ``url``/``filename``/
    ``offset``/``length``, keeps its raw shape with ``is_valid =
    false`` — the WARC source's damage-row convention: at crawl
    scale some index lines are always garbled, and a countable
    marker beats a silent drop. Pure row expressions (one regexp
    frame + one from_json)."""
    line = F.coalesce(F.col(line_col), F.lit(""))
    key = F.regexp_extract(line, _CDXJ_RE, 1)
    ts = F.regexp_extract(line, _CDXJ_RE, 2)
    js = F.regexp_extract(line, _CDXJ_RE, 3)
    m = F.from_json(js, CDX_JSON_SCHEMA)
    offset = F.element_at(m, "offset").try_cast("long")
    length = F.element_at(m, "length").try_cast("long")
    url = F.element_at(m, "url")
    filename = F.element_at(m, "filename")
    valid = (
        (key != "")
        & (ts != "")
        & m.isNotNull()
        & url.isNotNull()
        & filename.isNotNull()
        & offset.isNotNull()
        & length.isNotNull()
    )
    return lines.select(
        F.when(key != "", key).alias("surt_key"),
        F.when(ts != "", ts).alias("ts"),
        url.alias("url"),
        F.element_at(m, "mime").alias("mime"),
        F.element_at(m, "status").try_cast("int").alias("status"),
        F.element_at(m, "digest").alias("digest"),
        offset.alias("offset"),
        length.alias("length"),
        filename.alias("filename"),
        F.coalesce(valid, F.lit(False)).alias("is_valid"),
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ shard file(s) → capture rows. The text source splits
    plain files by line and reads ``.gz`` shards whole per file —
    exactly the cc-index layout's parallelism (hundreds of shards ≫
    executor count). Globs work (``…/indexes/cdx-*.gz``)."""
    return cdx_records(spark.read.text(path))


def surt_key(url: Column) -> Column:
    """The SURT form of a URL — the cc-index sort key — as a row
    expression, for joining OUR url tables against the index:
    lowercased host with a leading ``www.`` stripped, labels
    reversed and comma-joined, then ``)/`` and the lowercased
    path+query ('' path → '/'). Documented subset of the full surt
    library canonicalization (no percent-decoding, no session-param
    stripping — the same out-of-scope note as urlcurate's
    canonical_url; keys built here match keys built here, and match
    the real index for the common URL shapes)."""
    from cybersecurity_miw_spark.operators import urlcurate

    host = F.regexp_replace(urlcurate.url_host(url), r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pq = F.lower(
        F.regexp_extract(
            F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
        )
    )
    pq = F.when(pq == "", F.lit("/")).otherwise(pq)
    return F.when(host != "", F.concat(rev, F.lit(")"), pq))


def read_cluster_idx(spark: SparkSession, path: str) -> DataFrame:
    """``cluster.idx`` → one row per compressed index block:
    ``(key_surt, key_ts, cdx_file, offset, length, seq)``. The file
    is tiny (one line per ~3000 captures), sorted by key — the
    binary-search front of the whole acquisition chain."""
    return cluster_idx_records(spark.read.text(path))


def cluster_idx_records(
    lines: DataFrame, line_col: str = "value"
) -> DataFrame:
    """Parse cluster.idx lines (see module docstring for the
    format). Malformed lines surface as ``is_valid = false`` marker
    rows, the damage convention."""
    line = F.coalesce(F.col(line_col), F.lit(""))
    parts = F.split(line, r"\t")
    keypart = F.element_at(parts, 1)
    surt = F.regexp_extract(keypart, r"^(\S+) ", 1)
    kts = F.regexp_extract(keypart, r" (\d{14})$", 1)
    cdx_file = F.element_at(parts, 2)
    offset = F.element_at(parts, 3).try_cast("long")
    length = F.element_at(parts, 4).try_cast("long")
    seq = F.element_at(parts, 5).try_cast("long")
    valid = (
        (surt != "")
        & (kts != "")
        & cdx_file.isNotNull()
        & offset.isNotNull()
        & length.isNotNull()
    )
    return lines.select(
        F.when(surt != "", surt).alias("key_surt"),
        F.when(kts != "", kts).alias("key_ts"),
        cdx_file.alias("cdx_file"),
        offset.alias("offset"),
        length.alias("length"),
        seq.alias("seq"),
        F.coalesce(valid, F.lit(False)).alias("is_valid"),
    )


def select_index_shards(
    cluster: DataFrame,
    prefixes: DataFrame,
    prefix_col: str = "surt_prefix",
) -> DataFrame:
    """Which index blocks can contain captures for the given SURT
    prefixes: the cluster.idx pre-filter that turns "read 300
    compressed shards" into "ranged-read the handful of blocks whose
    key range intersects mine". A block with first key ``k`` and
    successor first key ``k'`` (lexicographic order within its
    shard… cluster.idx is GLOBALLY sorted, so the successor line's
    key bounds the block) intersects prefix ``p`` iff ``k' > p``
    (or it is the last block) and ``k ≤ p + '\\uffff'`` — i.e. the
    block's [k, k') range meets [p, p·high).

    Output: one row per (prefix, block) — ``(surt_prefix, cdx_file,
    offset, length, key_surt, key_ts)``. Plan: one global window for
    the successor key (cluster.idx is tiny — thousands of rows), one
    broadcast non-equi join against the prefix roster."""
    from pyspark.sql import Window

    next_key = F.lead(F.concat("key_surt", F.lit(" "), "key_ts")).over(
        Window.orderBy("key_surt", "key_ts", "cdx_file", "offset")
    )
    blocks = (
        cluster.filter(F.col("is_valid"))
        .withColumn("_next", next_key)
    )
    p = F.col(prefix_col)
    # bcast-bound: prefixes = the caller's SURT roster (domains or
    # hosts under acquisition — operator-bounded, never crawl-scaled)
    return (
        blocks.join(
            F.broadcast(prefixes.select(p.alias("surt_prefix"))),
            (
                F.col("_next").isNull()
                | (F.col("_next") > F.col("surt_prefix"))
            )
            & (
                F.col("key_surt")
                <= F.concat(F.col("surt_prefix"), F.lit("\uffff"))
            ),
        )
        .select(
            "surt_prefix",
            "cdx_file",
            "offset",
            "length",
            "key_surt",
            "key_ts",
        )
    )


def cdx_select_records(
    records: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_prefixes: tuple[str, ...] = ("text/html",),
    surt_prefixes: DataFrame | None = None,
    prefix_col: str = "surt_prefix",
    latest_only: bool = True,
) -> DataFrame:
    """The selection policy over parsed captures → the fetch list
    ``(url, surt_key, ts, filename, offset, length, digest)``:
    successful statuses only, mime prefix gate (captures store
    ``text/html; charset=…`` shapes), optional SURT-prefix roster
    (the domain subset — broadcast), and ``latest_only`` keeping one
    capture per ``surt_key``: the max ``(ts, filename, offset)``
    struct — the standard latest-capture policy, deterministic under
    ties. One max-of-struct aggregation on the uniform surt key;
    everything else is row filters."""
    r = records.filter(F.col("is_valid")).filter(
        F.col("status").isin(*[int(s) for s in statuses])
    )
    if mime_prefixes:
        gate = F.lit(False)
        for mp in mime_prefixes:
            gate = gate | F.coalesce(F.col("mime"), F.lit("")).startswith(
                mp
            )
        r = r.filter(gate)
    if surt_prefixes is not None:
        # bcast-bound: surt_prefixes = the acquisition roster
        # (operator-chosen domains, never crawl-scaled)
        pr = F.broadcast(
            surt_prefixes.select(
                F.col(prefix_col).alias("_pfx")
            ).distinct()
        )
        r = r.join(
            pr, F.col("surt_key").startswith(F.col("_pfx"))
        ).drop("_pfx")
    if latest_only:
        r = (
            r.groupBy("surt_key")
            .agg(
                F.max(
                    F.struct(
                        "ts", "filename", "offset", "length", "url",
                        "digest",
                    )
                ).alias("_w")
            )
            .select(
                F.col("_w.url").alias("url"),
                "surt_key",
                F.col("_w.ts").alias("ts"),
                F.col("_w.filename").alias("filename"),
                F.col("_w.offset").alias("offset"),
                F.col("_w.length").alias("length"),
                F.col("_w.digest").alias("digest"),
            )
        )
    else:
        r = r.select(
            "url", "surt_key", "ts", "filename", "offset", "length",
            "digest",
        )
    return r
