"""HTML → text extraction (operators/htmlextract.py): extraction
goldens over planted pathologies (nested script, malformed tags,
entities, double-escaped entities), jusText-lite line classification,
and the main-text re-join contract."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cybersecurity_miw_spark.operators import htmlextract  # noqa: E402


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        htmlextract.extract_text(F.col("html")).alias("t")
    ).head()["t"]


def test_basic_page(spark):
    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Heading</h1><p>First paragraph.</p>"
        "<p>Second <b>bold</b> paragraph.</p></body></html>"
    )
    assert _extract(spark, html) == (
        "T\nHeading\nFirst paragraph.\nSecond bold paragraph."
    )


def test_comments_cdata_doctype_dropped(spark):
    html = (
        "<!DOCTYPE html><!-- top\nmultiline comment -->"
        "<p>kept<!-- inline --> text</p><![CDATA[raw <junk>]]>"
    )
    assert _extract(spark, html) == "kept text"


def test_script_containing_block_tags(spark):
    # the classic trap: tags inside a script body must not survive as
    # text or produce line breaks
    html = "<p>a</p><script type='x'>if (1<2) { d.write('<p>X</p>') }</script><p>b</p>"
    assert _extract(spark, html) == "a\nb"


def test_entities_bounded_set_and_order(spark):
    html = "<p>a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; &nbsp;nb &copy; &hellip;</p>"
    assert _extract(spark, html) == "a <tag> & \"q\" 's' nb © …"
    # &amp; decoded LAST: double-escaped entities single-decode
    assert _extract(spark, "<p>&amp;lt;</p>") == "&lt;"
    # entities outside the bounded set pass through verbatim
    assert _extract(spark, "<p>&euro;100</p>") == "&euro;100"


def test_malformed_lone_angle_survives(spark):
    assert _extract(spark, "<p>3 < 5 is true</p>") == "3 < 5 is true"


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], "html string")
    rows = df.select(
        htmlextract.extract_text(F.col("html")).alias("t")
    ).collect()
    assert [r["t"] for r in rows] == ["", ""]


def test_whitespace_normalization(spark):
    # newline RUNS collapse to one line break (block boundary), the
    # documented contract — <br> runs do not manufacture empty lines
    html = "<div>a   b</div>\n\n\n<div>c</div><br><br><br><div>d</div>"
    assert _extract(spark, html) == "a b\nc\nd"


_PAGE = (
    "<html><body>"
    '<div><a href="/">Home</a> <a href="/x">About</a> <a href="/y">Contact</a></div>'
    "<p>This is the actual article body with enough words to pass.</p>"
    "<p>Short.</p>"
    "<div>© 2024 Example Corp — <a href='/terms'>Terms of service</a></div>"
    "</body></html>"
)


def test_line_stats_justext_lite(spark):
    df = spark.createDataFrame([(7, _PAGE)], "doc_id long, html string")
    rows = {
        r["line_no"]: r
        for r in htmlextract.html_line_stats(df).collect()
    }
    assert len(rows) == 4
    nav, body, short, footer = (rows[i] for i in range(4))
    # nav: all chars inside anchors → link_frac ≈ 1 (spaces between
    # anchors are the only non-link chars)
    assert nav["link_frac"] > 0.85 and not nav["keep"]
    assert body["link_frac"] == 0.0 and body["keep"]
    assert short["n_words"] == 1 and not short["keep"]
    # footer: link_frac moderate but words below nothing — dropped by
    # link share? words=7 ≥ 3, link chars 'Terms of service' = 16 of
    # the line → frac < 0.5 → footer actually KEPT by the lite rules
    # (a documented lite-ness: page-level C4 rules catch © lines)
    assert footer["keep"] == (footer["link_frac"] <= 0.5)
    # sentinels never leak into line_text
    assert all(
        htmlextract.LINK_OPEN not in r["line_text"]
        and htmlextract.LINK_CLOSE not in r["line_text"]
        for r in rows.values()
    )


def test_sentinel_poisoning_is_defused(spark):
    # input that already contains the private-use sentinels cannot
    # fake link density — they are stripped before anchors are marked
    poisoned = (
        f"<p>{htmlextract.LINK_OPEN}aaaa bbbb cccc dddd"
        f"{htmlextract.LINK_CLOSE} eeee</p>"
    )
    df = spark.createDataFrame([(1, poisoned)], "doc_id long, html string")
    row = htmlextract.html_line_stats(df).collect()[0]
    assert row["link_frac"] == 0.0 and row["keep"]


def test_extract_main_text_rejoin(spark):
    df = spark.createDataFrame([(7, _PAGE)], "doc_id long, html string")
    out = htmlextract.extract_main_text(df).collect()[0]
    assert out["text"].startswith(
        "This is the actual article body"
    )
    assert out["n_lines_kept"] + out["n_lines_dropped"] == 4
    # kept lines re-join in reading order
    lines = out["text"].split("\n")
    assert lines == sorted(
        lines, key=lambda x: _PAGE.index(x.split()[0])
    ) or len(lines) <= 2


def test_main_text_all_boilerplate_page(spark):
    df = spark.createDataFrame(
        [(1, '<div><a href="/">x</a></div>'), (2, None)],
        "doc_id long, html string",
    )
    rows = {
        r["doc_id"]: r
        for r in htmlextract.extract_main_text(df).collect()
    }
    assert rows[1]["text"] == "" and rows[1]["n_lines_dropped"] == 1
    assert rows[2]["text"] == "" and rows[2]["n_lines_kept"] == 0


def test_row_count_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"),
            F.col("text"),
            F.lit('</p><div><a href="/">nav nav nav</a></div></body></html>'),
        ).alias("html"),
    )
    out = htmlextract.extract_main_text(pages)
    assert out.count() == docs.count()
    a = sorted(out.collect())
    b = sorted(
        htmlextract.extract_main_text(pages.repartition(5)).collect()
    )
    assert a == b


def test_html_outlinks(spark):
    """Outlink extraction: quoted/unquoted hrefs, nested markup in
    anchor text, entity decode in both, href-less anchors skipped,
    document order preserved."""
    html = (
        '<html><body>'
        '<a href="/a?x=1&amp;y=2">First <b>bold</b> link</a>'
        "<a class='c' href='/b'>Second&nbsp;link</a>"
        "<a href=/bare>Bare href</a>"
        '<a name="target">not a link</a>'
        '<p><a href="https://e.com/z">Last</a></p>'
        "</body></html>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = htmlextract.html_outlinks(df).orderBy("link_no").collect()
    assert [(r["link_no"], r["href"], r["anchor_text"]) for r in rows] == [
        (0, "/a?x=1&y=2", "First bold link"),
        (1, "/b", "Second link"),
        (2, "/bare", "Bare href"),
        (3, "https://e.com/z", "Last"),
    ]
    # null/linkless docs produce no rows
    empty = spark.createDataFrame(
        [(1, None), (2, "<p>no links</p>")], "doc_id long, html string"
    )
    assert htmlextract.html_outlinks(empty).count() == 0
