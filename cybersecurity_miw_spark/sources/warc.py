"""WARC / WET source — the container format web corpora actually
arrive in (ISO 28500; Common Crawl publishes crawls as gzipped WARC
with one gzip member per record, plus WET text-conversion twins).
This closes the front of the crawl→dataset chain: ``read_warc`` →
``warc_to_pages`` → ``curate_documents(html_col=...)`` (or
``read_wet`` straight into the text stages).

Execution model: WARC is a sequential binary record format with
byte-length-delimited payloads — a Spark line reader cannot split
it, so the unit of parallelism is the FILE (the published
Spark-over-CommonCrawl pattern, e.g. the cc-pyspark/cc_net designs:
a crawl is tens of thousands of ~1 GB files, which saturates any
executor count long before per-file splitting matters). Each file is
read whole via the ``binaryFile`` source and parsed inside ONE
Arrow-batched ``mapInPandas`` pass — Python is unavoidable here
(byte-level record framing), so it runs once per file, streams
records out in bounded batches, and everything downstream is
ordinary JVM-side DataFrame work.

Robustness contract: gzip members are handled transparently
(Python's gzip reads concatenated members — the per-record-member
CommonCrawl layout included); a truncated or garbled TAIL yields the
records parsed so far plus a ``_parse_error`` marker record (type
'error') rather than failing the file — at 100 TB some files are
always damaged, and silently dropping them is worse than surfacing
a countable marker row.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "file string, record_no long, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "content_length long, http_status int, http_content_type string, "
    "http_location string, body binary, body_text string"
)

_CHARSET_RE = None  # compiled lazily inside the executor


def _decode_body(body: bytes, content_type: str | None) -> str:
    """Charset-sniffed text decode with REPLACEMENT on damage — done
    here in the Python framing pass (where the bytes already are)
    because Spark's ``decode`` expression THROWS on malformed input
    under ANSI semantics: one mojibake page must not fail a
    100k-file crawl job. Charset comes from the Content-Type
    ``charset=`` parameter; unknown/missing charsets fall back to
    UTF-8 (the web default)."""
    import codecs
    import re

    global _CHARSET_RE
    if _CHARSET_RE is None:
        _CHARSET_RE = re.compile(r"charset=[\"']?([\w.-]+)", re.I)
    enc = "utf-8"
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            try:
                codecs.lookup(m.group(1))
                enc = m.group(1)
            except LookupError:
                pass
    return body.decode(enc, errors="replace")

_MAX_HEADER_BYTES = 64 * 1024  # RFC-ish sanity bound for a header block


def _parse_warc_stream(name: str, raw: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record in ``raw``, decompressing gzip
    INCREMENTALLY: records are parsed off the decompression stream
    one at a time, so peak memory is the compressed file (which the
    binaryFile source already materialized) plus ONE record — never
    the whole decompressed file (a ~1 GB CommonCrawl member set
    expands ~4-5×; holding both would dominate executor memory at
    exactly the file sizes this source exists for). On framing
    damage, emit a final ``error`` record and stop — never raise for
    data problems."""
    if raw[:2] == b"\x1f\x8b":
        stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    no = 0
    try:
        while True:
            # skip inter-record blank lines
            line = stream.readline()
            while line in (b"\r\n", b"\n"):
                line = stream.readline()
            if not line:
                return
            if not line.startswith(b"WARC/"):
                yield {"_err": f"bad magic in record {no}", "_no": no}
                return
            headers: dict[str, str] = {}
            hbytes = 0
            while True:
                hl = stream.readline()
                hbytes += len(hl)
                if hl in (b"\r\n", b"\n", b""):
                    break
                if hbytes > _MAX_HEADER_BYTES:
                    yield {
                        "_err": f"unterminated header in record {no}",
                        "_no": no,
                    }
                    return
                k, sep, v = hl.partition(b":")
                if sep:
                    headers[k.strip().lower().decode("latin-1")] = (
                        v.strip().decode("latin-1")
                    )
            if hl == b"":  # EOF inside the header block
                yield {"_err": f"unterminated header in record {no}",
                       "_no": no}
                return
            try:
                clen = int(headers.get("content-length", ""))
            except ValueError:
                yield {"_err": f"missing content-length in record {no}",
                       "_no": no}
                return
            payload = stream.read(clen)
            if payload is None or len(payload) < clen:
                yield {"_err": f"truncated payload in record {no}",
                       "_no": no}
                return
            yield {"_no": no, "headers": headers, "payload": payload}
            no += 1
    except (OSError, EOFError) as exc:
        # gzip damage anywhere in the stream (BadGzipFile ⊂ OSError)
        yield {"_err": f"gzip: {exc}", "_no": no}


def _split_http(
    payload: bytes,
) -> tuple[int | None, str | None, str | None, bytes]:
    """(status, content-type, location, body) of an HTTP response
    payload; a payload that does not start with an HTTP status line
    passes through whole (status None). Location rides along for the
    3xx redirect-edge extraction (warc_redirect_edges)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None, payload
    end = payload.find(b"\r\n\r\n")
    if end < 0:
        return None, None, None, payload
    head = payload[:end].split(b"\r\n")
    try:
        status = int(head[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, None, payload
    ctype = location = None
    for line in head[1:]:
        k, _, v = line.partition(b":")
        kl = k.strip().lower()
        if kl == b"content-type" and ctype is None:
            ctype = v.strip().decode("latin-1")
        elif kl == b"location" and location is None:
            location = v.strip().decode("latin-1")
    return status, ctype, location, payload[end + 4 :]


def read_warc(
    spark: SparkSession,
    path: str,
    kinds: tuple[str, ...] | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Read WARC file(s) (glob/dir/file; ``.warc`` or ``.warc.gz``)
    into one row per record: the WARC envelope fields, and for
    ``response`` records the parsed HTTP status/content-type with the
    HTTP body split out of the payload. ``kinds`` filters record
    types early (e.g. ``("response",)`` — the usual crawl read;
    ``None`` keeps everything, including any ``error`` marker rows).

    Plan: ``binaryFile`` scan (one task per file — the format's
    parallelism unit) → one mapInPandas parse emitting bounded
    batches → ordinary DataFrame ops. Nothing besides the framing
    pass runs in Python."""
    import pandas as pd

    want = tuple(k.lower() for k in kinds) if kinds is not None else None

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        buf: list[dict] = []

        def flush():
            nonlocal buf
            out = pd.DataFrame(buf)
            buf = []
            return out

        for pdf in batches:
            for fname, raw in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc_stream(str(fname), bytes(raw)):
                    if "_err" in rec:
                        row = {
                            "file": str(fname),
                            "record_no": rec["_no"],
                            "warc_type": "error",
                            "target_uri": None,
                            "warc_date": None,
                            "record_id": rec["_err"],
                            "content_type": None,
                            "content_length": 0,
                            "http_status": None,
                            "http_content_type": None,
                            "body": b"",
                            "body_text": None,
                            "http_location": None,
                        }
                        if want is None or "error" in want:
                            buf.append(row)
                        continue
                    h = rec["headers"]
                    wtype = h.get("warc-type", "").lower()
                    if want is not None and wtype not in want:
                        continue
                    status, http_ct, location, body = (
                        _split_http(rec["payload"])
                        if wtype == "response"
                        else (None, None, None, rec["payload"])
                    )
                    # text kinds get the charset-sniffed replacement
                    # decode here (see _decode_body); binary kinds
                    # carry body_text NULL
                    body_text = (
                        _decode_body(
                            body, http_ct or h.get("content-type")
                        )
                        if wtype in ("response", "conversion")
                        else None
                    )
                    buf.append({
                        "file": str(fname),
                        "record_no": rec["_no"],
                        "warc_type": wtype,
                        "target_uri": h.get("warc-target-uri"),
                        "warc_date": h.get("warc-date"),
                        "record_id": h.get("warc-record-id"),
                        "content_type": h.get("content-type"),
                        "content_length": len(rec["payload"]),
                        "http_status": status,
                        "http_content_type": http_ct,
                        "http_location": location,
                        "body": body,
                        "body_text": body_text,
                    })
                    if len(buf) >= batch_rows:
                        yield flush()
        if buf:
            yield flush()

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET (WARC text-conversion) files into the documents
    shape: ``(url, warc_date, text)`` — one row per ``conversion``
    record, the body decoded as UTF-8 (replacement on damage). Feeds
    the text stages directly (the C4 starting point)."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path, kinds=("conversion",))
    return recs.select(
        F.col("target_uri").alias("url"),
        "warc_date",
        F.col("body_text").alias("text"),
    )


def warc_to_pages(
    recs: DataFrame,
    min_status: int = 200,
    max_status: int = 299,
    html_only: bool = True,
) -> DataFrame:
    """``response`` records → the fetched-pages shape the curation
    chain starts from: ``(url, html)`` for successful (2xx) HTML
    responses — ``curate_documents(html_col="html", url_col="url")``
    and ``linkgraph.outlink_edges`` consume it directly."""
    from pyspark.sql import functions as F

    out = recs.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(min_status, max_status)
        & F.col("target_uri").isNotNull()
    )
    if html_only:
        out = out.filter(
            F.lower(F.coalesce("http_content_type", F.lit(""))).contains(
                "html"
            )
        )
    return out.select(
        F.col("target_uri").alias("url"),
        # the parser's charset-sniffed replacement decode — Spark's
        # own decode expression throws on mojibake under ANSI
        F.col("body_text").alias("html"),
    )


# ---------------------------------------------------------------------------
# test/fixture writer — driver-side, also the documented way to make
# small WARC samples for local runs
# ---------------------------------------------------------------------------


def build_warc_bytes(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize record dicts (``warc_type``, ``target_uri``,
    ``payload`` bytes, optional ``warc_date``) into valid WARC bytes
    — plain, or one gzip member per record (the CommonCrawl layout)
    when ``per_record_gzip``."""
    out = []
    for i, r in enumerate(records):
        payload = r["payload"]
        hdrs = [
            b"WARC/1.0",
            f"WARC-Type: {r['warc_type']}".encode(),
            f"WARC-Record-ID: <urn:uuid:rec-{i}>".encode(),
            f"WARC-Date: {r.get('warc_date', '2026-01-01T00:00:00Z')}".encode(),
            f"Content-Length: {len(payload)}".encode(),
        ]
        if r.get("target_uri"):
            hdrs.insert(2, f"WARC-Target-URI: {r['target_uri']}".encode())
        if r.get("content_type"):
            hdrs.append(f"Content-Type: {r['content_type']}".encode())
        rec = b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        out.append(gzip.compress(rec) if per_record_gzip else rec)
    return b"".join(out)


def http_response_payload(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """An HTTP response payload for a ``response`` record."""
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def warc_redirect_edges(recs: DataFrame) -> DataFrame:
    """Redirect edges from 3xx ``response`` records: one
    ``(src_url, dst_url, http_status)`` row per redirect, the
    Location resolved against the source URL (relative Locations are
    legal and common — RFC 7231 §7.1.2) through the same RFC 3986
    resolver the outlink extractor uses. Feeds URL canonicalization
    (a redirect is the server saying "these two URLs are one page")
    and the crawl frontier (the target may be unseen). Pure row
    expressions over the record frame."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.operators import linkgraph

    r = recs.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(300, 399)
        & F.col("http_location").isNotNull()
        & F.col("target_uri").isNotNull()
    )
    return r.select(
        F.col("target_uri").alias("src_url"),
        linkgraph.resolve_href(
            F.col("target_uri"), F.col("http_location")
        ).alias("dst_url"),
        "http_status",
    ).filter(F.col("dst_url").isNotNull())
