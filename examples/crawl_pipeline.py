"""The full crawl loop, front to back — what a CommonCrawl-style
acquisition iteration looks like on this engine:

    WARC bytes (sources/warc.py — the container crawls arrive in)
      → fetched pages (2xx HTML responses, HTTP headers split off)
      → curation chain (pipeline.curate_documents):
          canonical URL + URL dedup → HTML→text extraction with
          jusText-lite boilerplate removal → language gate →
          CCNet perplexity gate (ngramlm — trained here on the
          corpus's own fluent exemplar) → exact dedup
      → ACCEPTED documents (the training-corpus increment)
    and, from the same fetched pages:
      → outlink edges (linkgraph.outlink_edges — href resolution +
        canonicalization)
      → integer fixed-point PageRank + in-degree/anchor index
      → frontier expansion (unseen URLs, breadth-weighted)
      → robots.txt gate (robots.crawl_allowed_urls, RFC 9309)
      → the NEXT FETCH LIST, priority-ordered

Everything except the WARC framing pass (one Arrow mapInPandas per
file) is a JVM DataFrame plan. The demo synthesizes a three-site
mini-web into real WARC bytes first, so it runs self-contained:

    python examples/crawl_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


PROSE = (
    "the quick brown fox jumps over the lazy dog while the careful "
    "reader follows the long and ordinary prose of page {n} which "
    "keeps enough words to clear the quality gates"
)
NAV = (
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="//siteb.example.com/partner?utm_source=x">Partner</a></nav>'
)


def synth_warc(tmp: str) -> str:
    """Three sites × a few pages, cross-linked, one page duplicated
    under a tracking-param URL variant, one robots.txt per site."""
    from cybersecurity_miw_spark.sources import warc as W

    recs = []
    for site in ("sitea", "siteb", "sitec"):
        for n in range(4):
            body = (
                f"<html><body>{NAV}<h1>{site} page {n}</h1>"
                f"<p>{PROSE.format(n=n)} on {site}</p>"
                f'<p><a href="/p{(n + 1) % 4}">next</a> '
                f'<a href="http://{"siteb" if site != "siteb" else "sitea"}'
                f'.example.com/p{n}">friend</a></p>'
                "</body></html>"
            ).encode()
            recs.append(dict(
                warc_type="response",
                target_uri=f"http://{site}.example.com/p{n}",
                payload=W.http_response_payload(body),
            ))
    # a tracking-param duplicate of an existing page
    recs.append(dict(
        warc_type="response",
        target_uri="http://sitea.example.com/p0?utm_campaign=promo",
        payload=W.http_response_payload(
            f"<html><body>{NAV}<h1>sitea page 0</h1>"
            f"<p>{PROSE.format(n=0)} on sitea</p></body></html>".encode()
        ),
    ))
    path = os.path.join(tmp, "crawl-00000.warc.gz")
    with open(path, "wb") as fh:
        fh.write(W.build_warc_bytes(recs, per_record_gzip=True))
    return path


def main() -> None:
    from cybersecurity_miw_spark.operators import linkgraph, ngramlm, robots
    from cybersecurity_miw_spark.pipeline import curate_documents
    from cybersecurity_miw_spark.sources import warc as W

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("crawl-pipeline-demo")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="crawl_demo_")
    warc_path = synth_warc(tmp)

    # 1. WARC → fetched pages
    recs = W.read_warc(spark, warc_path)
    pages = W.warc_to_pages(recs).withColumn(
        "doc_id", F.abs(F.hash("url")).cast("long")
    )
    print(f"fetched pages: {pages.count()}")

    # 2. a tiny perplexity model trained on the corpus's own fluent
    #    exemplar (production: a curated reference corpus)
    exemplar = pages.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("html", "<[^>]*>", " "), r"\s+", " "
        ).alias("text"),
    )
    lm_model, lm_params = ngramlm.train_ngram_lm(exemplar)

    # 3. the curation chain: URL stage → HTML extraction → language
    #    gate → LM gate → exact dedup
    metrics: list = []
    curated = curate_documents(
        pages.withColumn("text", F.lit("")),
        url_col="url",
        html_col="html",
        lang_allow=("en",),
        lm_model=lm_model,
        lm_params=lm_params,
        lm_max_nlp_micro=-lm_params["lp_oov_micro"],  # keep all but OOV-walls
        apply_gopher=False,
        redact_pii=False,
        quality_floor=None,
        near_dup_threshold=None,
        metrics=metrics,
    )
    accepted = curated.select("url", "lang_guess", "nlp_micro_tok", "text")
    print("curation funnel:")
    for m in metrics:
        print(f"  {m['stage']}: {m['n_in']} -> {m['n_out']}")
    accepted.show(truncate=48)

    # 4. the frontier side: outlinks → pagerank → unseen targets
    edges = linkgraph.outlink_edges(pages)
    pr = linkgraph.pagerank(edges, iters=3)
    seen = pages.select(
        F.col("url")
    ).distinct()
    from cybersecurity_miw_spark.operators import urlcurate

    seen = seen.select(urlcurate.canonical_url(F.col("url")).alias("url"))
    frontier = linkgraph.crawl_frontier(edges, seen)

    # 5. robots politeness gate over the frontier
    robots_docs = spark.createDataFrame(
        [
            (f"{s}.example.com",
             "User-agent: *\nDisallow: /private/\nAllow: /")
            for s in ("sitea", "siteb", "sitec")
        ],
        "host string, robots_txt string",
    )
    allowed = robots.crawl_allowed_urls(
        frontier, robots_docs, agent="miwbot", url_col="dst_url"
    )
    # politeness-aware ordering: every host's best URL first
    fetch_list = linkgraph.fetch_schedule(allowed, per_host_k=3).orderBy(
        "host_rank", F.desc("frontier_score"), "dst_url"
    )
    print("next fetch list (robots-allowed, breadth-polite order):")
    fetch_list.show(truncate=60)

    print("top pages by PageRank:")
    pr.orderBy(F.desc("pr_micro"), "url").show(5, truncate=60)


if __name__ == "__main__":
    main()
