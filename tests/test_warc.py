"""Goldens for the WARC/WET source (sources/warc.py): round-trip
through the fixture writer in plain and per-record-gzip layouts,
HTTP payload splitting, record-kind filtering, damage markers on
truncated/garbled files, WET text decoding, the pages projection,
and the capstone WARC → curate_documents(html_col=...) chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources import warc as W

HTML = b'<html><body><h1>T</h1><a href="/y">Y link</a><p>hello world</p></body></html>'


def _records():
    return [
        dict(warc_type="warcinfo", payload=b"software: fixture"),
        dict(
            warc_type="response",
            target_uri="http://a.com/x",
            payload=W.http_response_payload(HTML),
        ),
        dict(
            warc_type="response",
            target_uri="http://a.com/nf",
            payload=W.http_response_payload(b"gone", status=404),
        ),
        dict(
            warc_type="response",
            target_uri="http://a.com/img",
            payload=W.http_response_payload(
                b"\x89PNGDATA", content_type="image/png"
            ),
        ),
        dict(
            warc_type="request",
            target_uri="http://a.com/x",
            payload=b"GET /x HTTP/1.1\r\n\r\n",
        ),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_layouts(spark, tmp_path, gz):
    p = tmp_path / ("f.warc.gz" if gz else "f.warc")
    p.write_bytes(W.build_warc_bytes(_records(), per_record_gzip=gz))
    df = W.read_warc(spark, str(p))
    rows = {r["record_no"]: r for r in df.collect()}
    assert len(rows) == 5
    assert rows[0]["warc_type"] == "warcinfo"
    assert rows[0]["target_uri"] is None
    r = rows[1]
    assert (
        r["warc_type"],
        r["target_uri"],
        r["http_status"],
        r["http_content_type"],
    ) == ("response", "http://a.com/x", 200, "text/html")
    # HTTP headers split OUT of the body
    assert bytes(r["body"]) == HTML
    assert r["content_length"] > len(HTML)
    assert rows[2]["http_status"] == 404
    # request record: payload passes through whole, no HTTP parse
    assert rows[4]["http_status"] is None
    assert bytes(rows[4]["body"]).startswith(b"GET /x")
    # envelope metadata
    assert rows[1]["warc_date"] == "2026-01-01T00:00:00Z"
    assert rows[1]["record_id"] == "<urn:uuid:rec-1>"


def test_kind_filter_and_multifile(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(W.build_warc_bytes(_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        W.build_warc_bytes(_records(), per_record_gzip=True)
    )
    df = W.read_warc(spark, str(tmp_path), kinds=("response",))
    assert df.count() == 6  # 3 responses × 2 files
    assert set(
        r["warc_type"] for r in df.select("warc_type").distinct().collect()
    ) == {"response"}


def test_damage_markers(spark, tmp_path):
    good = W.build_warc_bytes(_records())
    # truncated mid-payload: parsed prefix survives, marker appended
    (tmp_path / "t.warc").write_bytes(good[: len(good) - 40])
    rows = sorted(
        W.read_warc(spark, str(tmp_path / "t.warc")).collect(),
        key=lambda r: r["record_no"],
    )
    assert rows[-1]["warc_type"] == "error"
    assert "truncated" in rows[-1]["record_id"] or "unterminated" in rows[-1]["record_id"]
    assert [r["warc_type"] for r in rows[:-1]].count("response") >= 1
    # garbage file: one marker row, nothing else
    (tmp_path / "g.warc").write_bytes(b"not a warc at all")
    g = W.read_warc(spark, str(tmp_path / "g.warc")).collect()
    assert len(g) == 1 and g[0]["warc_type"] == "error"
    # kinds filter excludes markers unless asked for
    assert (
        W.read_warc(spark, str(tmp_path / "g.warc"), kinds=("response",))
        .count()
        == 0
    )
    # corrupt gzip
    (tmp_path / "c.warc.gz").write_bytes(b"\x1f\x8b" + b"junkjunk")
    c = W.read_warc(spark, str(tmp_path / "c.warc.gz")).collect()
    assert len(c) == 1 and c[0]["warc_type"] == "error"
    assert "gzip" in c[0]["record_id"]


def test_wet_reader(spark, tmp_path):
    recs = [
        dict(
            warc_type="conversion",
            target_uri="http://a.com/x",
            payload="bonjour le monde é中文".encode(),
        ),
        dict(warc_type="warcinfo", payload=b"x"),
    ]
    p = tmp_path / "w.warc.gz"
    p.write_bytes(W.build_warc_bytes(recs, per_record_gzip=True))
    rows = W.read_wet(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "http://a.com/x"
    assert rows[0]["text"] == "bonjour le monde é中文"


def test_warc_to_pages_projection(spark, tmp_path):
    p = tmp_path / "f.warc"
    p.write_bytes(W.build_warc_bytes(_records()))
    pages = W.warc_to_pages(W.read_warc(spark, str(p)))
    rows = pages.collect()
    # 404 and image/png filtered; request/warcinfo not responses
    assert len(rows) == 1
    assert rows[0]["url"] == "http://a.com/x"
    assert rows[0]["html"] == HTML.decode()
    # html_only=False keeps the 2xx image too
    assert (
        W.warc_to_pages(
            W.read_warc(spark, str(p)), html_only=False
        ).count()
        == 2
    )


def test_capstone_warc_to_curated_dataset(spark, tmp_path):
    """The full front of the chain: WARC bytes → pages → HTML
    extraction + URL stage inside curate_documents → curated text."""
    from cybersecurity_miw_spark.pipeline import curate_documents

    body = (
        b"<html><body><nav><a href='/a'>Home</a><a href='/b'>About</a>"
        b"<a href='/c'>More</a></nav>"
        b"<p>The quick brown fox jumps over the lazy dog and keeps "
        b"going with plenty of ordinary prose to satisfy the gates "
        b"because short pages are dropped by quality rules.</p>"
        b"</body></html>"
    )
    recs = [
        dict(
            warc_type="response",
            target_uri=f"http://site{i}.com/p?utm_source=x",
            payload=W.http_response_payload(
                body.replace(b"fox", b"fox%d" % i)
            ),
        )
        for i in range(3)
    ]
    # a duplicate URL (after canonicalization) that must dedup away
    recs.append(
        dict(
            warc_type="response",
            target_uri="http://site0.com/p?utm_medium=y",
            payload=W.http_response_payload(body),
        )
    )
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(W.build_warc_bytes(recs, per_record_gzip=True))
    pages = W.warc_to_pages(W.read_warc(spark, str(p))).withColumn(
        "doc_id", F.abs(F.hash("url", "html")).cast("long")
    )
    out = curate_documents(
        pages,
        url_col="url",
        html_col="html",
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
    )
    rows = out.select("url", "text").collect()
    urls = {r["url"] for r in rows}
    # tracking params canonicalized, URL-dup collapsed → 3 pages
    assert urls == {
        "http://site0.com/p",
        "http://site1.com/p",
        "http://site2.com/p",
    }
    # nav boilerplate stripped, prose kept
    for r in rows:
        assert "quick brown" in r["text"]
        assert "Home" not in r["text"]

def test_truncated_gzip_member_yields_marker(spark, tmp_path):
    """Damage INSIDE a gzip member (not just plain truncation)
    surfaces as a marker row via the incremental decompression
    path; prior records still parse."""
    good = W.build_warc_bytes(_records(), per_record_gzip=True)
    # cut inside the LAST member's compressed bytes
    (tmp_path / "t.warc.gz").write_bytes(good[:-20])
    rows = sorted(
        W.read_warc(spark, str(tmp_path / "t.warc.gz")).collect(),
        key=lambda r: r["record_no"],
    )
    assert rows[-1]["warc_type"] == "error"
    assert len(rows) >= 2  # earlier members parsed fine


def test_charset_sniffed_replacement_decode(spark, tmp_path):
    """Latin-1 pages decode via the Content-Type charset parameter;
    malformed UTF-8 yields replacement chars instead of failing the
    job (Spark's decode expression would THROW under ANSI)."""
    latin = "café résumé".encode("iso-8859-1")
    bad_utf8 = b"ok \xe9 broken"
    recs = [
        dict(
            warc_type="response",
            target_uri="http://a.com/latin",
            payload=(
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                b"charset=ISO-8859-1\r\n\r\n" + latin
            ),
        ),
        dict(
            warc_type="response",
            target_uri="http://a.com/bad",
            payload=W.http_response_payload(bad_utf8),
        ),
        dict(
            warc_type="response",
            target_uri="http://a.com/unknowncs",
            payload=(
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                b"charset=not-a-charset\r\n\r\nplain"
            ),
        ),
    ]
    p = tmp_path / "cs.warc"
    p.write_bytes(W.build_warc_bytes(recs))
    rows = {
        r["target_uri"]: r["body_text"]
        for r in W.read_warc(spark, str(p)).collect()
    }
    assert rows["http://a.com/latin"] == "café résumé"
    assert "�" in rows["http://a.com/bad"]
    assert rows["http://a.com/bad"].startswith("ok ")
    assert rows["http://a.com/unknowncs"] == "plain"
    # pages projection reads the replacement-decoded text
    pages = W.warc_to_pages(W.read_warc(spark, str(p)))
    assert {r["url"] for r in pages.collect()} == {
        "http://a.com/latin", "http://a.com/bad",
        "http://a.com/unknowncs",
    }


def test_redirect_edges(spark, tmp_path):
    """3xx Location headers become resolved redirect edges; relative
    Locations resolve against the source URL; non-3xx and
    Location-less records are ignored."""
    recs = [
        dict(
            warc_type="response",
            target_uri="http://a.com/old",
            payload=(
                b"HTTP/1.1 301 Moved\r\n"
                b"Location: http://b.com/new\r\n\r\n"
            ),
        ),
        dict(
            warc_type="response",
            target_uri="http://a.com/x/rel",
            payload=(
                b"HTTP/1.1 302 Found\r\nLocation: /root\r\n\r\n"
            ),
        ),
        dict(
            warc_type="response",
            target_uri="http://a.com/ok",
            payload=W.http_response_payload(b"fine"),
        ),
    ]
    p = tmp_path / "r.warc"
    p.write_bytes(W.build_warc_bytes(recs))
    edges = {
        (r["src_url"], r["dst_url"], r["http_status"])
        for r in W.warc_redirect_edges(
            W.read_warc(spark, str(p))
        ).collect()
    }
    assert edges == {
        ("http://a.com/old", "http://b.com/new", 301),
        ("http://a.com/x/rel", "http://a.com/root", 302),
    }
