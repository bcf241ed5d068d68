"""Goldens for the CDX index source (sources/cdx.py — the cc-index
targeted-acquisition chain): CDXJ line parsing with damage rows,
file/gz reading, the SURT key expression, cluster.idx parsing, the
block-range prefix lookup, and the selection policy (status/mime
gates, SURT-prefix roster, latest-capture max-struct)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources import cdx

GOOD = (
    'com,example)/path 20240125123456 {"url": "https://example.com/'
    'path", "mime": "text/html", "status": "200", "digest": "sha1:X",'
    ' "length": "1234", "offset": "5678", "filename": '
    '"crawl-data/seg/f.warc.gz"}'
)


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_cdx_records_parse_and_damage_rows(spark):
    rows = [
        GOOD,
        # 13-digit timestamp: frame mismatch
        'com,example)/a 2024012512345 {"url": "u", "filename": "f", '
        '"offset": "1", "length": "2"}',
        # unparseable JSON
        "com,example)/b 20240125123456 {not json}",
        # JSON missing offset
        'com,example)/c 20240125123456 {"url": "u", '
        '"filename": "f", "length": "2"}',
        # non-numeric offset
        'com,example)/d 20240125123456 {"url": "u", '
        '"filename": "f", "offset": "x", "length": "2"}',
        "",
    ]
    out = cdx.cdx_records(_lines(spark, rows)).collect()
    good = [r for r in out if r["is_valid"]]
    assert len(good) == 1 and len(out) == 6
    g = good[0]
    assert g["surt_key"] == "com,example)/path"
    assert g["ts"] == "20240125123456"
    assert g["url"] == "https://example.com/path"
    assert g["mime"] == "text/html"
    assert g["status"] == 200
    assert (g["offset"], g["length"]) == (5678, 1234)
    assert g["filename"] == "crawl-data/seg/f.warc.gz"
    # damage rows are countable, not dropped
    assert sum(1 for r in out if not r["is_valid"]) == 5


def test_read_cdx_plain_and_gz(spark, tmp_path):
    plain = tmp_path / "cdx-00000"
    plain.write_text(GOOD + "\n" + "garbled\n")
    gz = tmp_path / "cdx-00001.gz"
    with gzip.open(gz, "wt") as f:
        f.write(GOOD.replace(")/path", ")/gzpath") + "\n")
    out = cdx.read_cdx(spark, str(tmp_path / "cdx-*")).collect()
    keys = {r["surt_key"] for r in out if r["is_valid"]}
    assert keys == {"com,example)/path", "com,example)/gzpath"}
    assert sum(1 for r in out if not r["is_valid"]) == 1


def test_surt_key_expression(spark):
    df = spark.createDataFrame(
        [
            ("https://www.Example.COM/Path?Q=1#frag",),
            ("http://sub.site.co.uk/",),
            ("http://host.org",),
            ("not-a-url",),
        ],
        "url string",
    )
    got = [
        r["k"]
        for r in df.select(cdx.surt_key(F.col("url")).alias("k")).collect()
    ]
    # www stripped, host reversed, path+query lowercased; fragment
    # is not part of the key subject
    assert got[0] == "com,example)/path?q=1"
    assert got[1] == "uk,co,site,sub)/"
    assert got[2] == "org,host)/"
    assert got[3] is None


def test_cluster_idx_and_shard_lookup(spark):
    lines = [
        "com,alpha)/ 20240101000000\tcdx-00000.gz\t0\t1000\t0",
        "com,beta)/x 20240101000000\tcdx-00000.gz\t1000\t1000\t1",
        "com,delta)/ 20240101000000\tcdx-00001.gz\t0\t1000\t2",
        "org,zeta)/ 20240101000000\tcdx-00001.gz\t1000\t1000\t3",
        "malformed line",
    ]
    cluster = cdx.cluster_idx_records(_lines(spark, lines))
    assert cluster.filter(~F.col("is_valid")).count() == 1
    prefixes = spark.createDataFrame(
        [("com,beta",), ("com,gamma",), ("zz,nothing",)],
        "surt_prefix string",
    )
    got = {
        (r["surt_prefix"], r["key_surt"])
        for r in cdx.select_index_shards(cluster, prefixes).collect()
    }
    assert got == {
        # com,beta keys can live in block 1 (first key == prefix
        # range start boundary) or block 0 (covers up to block 1's
        # first key exclusive)
        ("com,beta", "com,alpha)/"),
        ("com,beta", "com,beta)/x"),
        # com,gamma sorts AFTER com,delta ('d' < 'g') -> the delta
        # block covers [com,delta)/, org,zeta)/)
        ("com,gamma", "com,delta)/"),
        # zz,* sorts after every key -> the LAST block only
        ("zz,nothing", "org,zeta)/"),
    }


def test_cdx_select_records_policy(spark):
    def line(surt, ts, status, mime, off, fn="f.warc.gz", url=None):
        u = url or ("http://" + surt.split(")")[0].split(",")[-1])
        return (
            f'{surt} {ts} {{"url": "{u}", "mime": "{mime}", '
            f'"status": "{status}", "digest": "sha1:{off}", '
            f'"length": "10", "offset": "{off}", "filename": "{fn}"}}'
        )

    rows = [
        line("com,a)/p", "20240101000000", 200, "text/html", 1),
        line("com,a)/p", "20240201000000", 200,
             "text/html; charset=utf-8", 2),  # later capture wins
        line("com,a)/q", "20240101000000", 404, "text/html", 3),
        line("com,a)/r", "20240101000000", 200, "image/jpeg", 4),
        line("net,b)/s", "20240101000000", 200, "text/html", 5),
        "garbled",
    ]
    recs = cdx.cdx_records(_lines(spark, rows))
    sel = {
        r["surt_key"]: r
        for r in cdx.cdx_select_records(recs).collect()
    }
    # 404 and image captures gated; latest capture of com,a)/p kept
    assert set(sel) == {"com,a)/p", "net,b)/s"}
    assert sel["com,a)/p"]["offset"] == 2
    assert sel["com,a)/p"]["ts"] == "20240201000000"
    # SURT-prefix roster narrows to the com,a domain
    pfx = spark.createDataFrame([("com,a",)], "surt_prefix string")
    only_a = {
        r["surt_key"]
        for r in cdx.cdx_select_records(recs, surt_prefixes=pfx).collect()
    }
    assert only_a == {"com,a)/p"}
    # latest_only=False keeps both captures of /p
    all_rows = cdx.cdx_select_records(recs, latest_only=False).collect()
    assert sum(1 for r in all_rows if r["surt_key"] == "com,a)/p") == 2
    # column contract: the byte-range fetch list shape
    assert cdx.cdx_select_records(recs).columns == [
        "url", "surt_key", "ts", "filename", "offset", "length",
        "digest",
    ]


def test_cdx_join_with_url_curation(spark):
    """The acquisition story end-to-end at unit scale: OUR url table
    → surt_key → prefix roster → index selection joins back to the
    curation family (registrable-domain gate shape)."""
    recs = cdx.cdx_records(
        _lines(
            spark,
            [
                'com,keep)/x 20240101000000 {"url": "http://keep.com/x",'
                ' "mime": "text/html", "status": "200", "digest": "d",'
                ' "length": "10", "offset": "1", "filename": "f.gz"}',
                'com,drop)/y 20240101000000 {"url": "http://drop.com/y",'
                ' "mime": "text/html", "status": "200", "digest": "d",'
                ' "length": "10", "offset": "2", "filename": "f.gz"}',
            ],
        )
    )
    wanted = spark.createDataFrame(
        [("http://keep.com/anything",)], "url string"
    )
    pfx = wanted.select(
        F.regexp_extract(
            cdx.surt_key(F.col("url")), r"^([^)]+)", 1
        ).alias("surt_prefix")
    ).distinct()
    got = [
        r["url"]
        for r in cdx.cdx_select_records(recs, surt_prefixes=pfx).collect()
    ]
    assert got == ["http://keep.com/x"]
