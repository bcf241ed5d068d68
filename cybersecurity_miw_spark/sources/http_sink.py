"""S15: Solr-style HTTP JSON sink.

The reference's companion app reads result JSON lines and POSTs them
in batches as a JSON array to a Solr update endpoint
(``http://host:8984/solr/update/json?commit=true`` —
app/solr_commit.cc:66,112-119).

Spark-first shape: render the reference-shape JSON lines, then
``foreachPartition`` POSTs one batch per ``batch_size`` records from
each executor — parallel, no driver collect. The transport is
injectable (a ``(url, payload_bytes) -> None`` callable) so tests run
against a stub and air-gapped clusters can plug their client;
the default uses urllib from the standard library.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame

from cybersecurity_miw_spark.plans.logdef import LogDef

DEFAULT_URL = "http://localhost:8984/solr/update/json?commit=true"

Transport = Callable[[str, bytes], None]


def urllib_transport(url: str, payload: bytes) -> None:
    """Default transport: stdlib HTTP POST, application/json."""
    from urllib.request import Request, urlopen

    req = Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    with urlopen(req) as resp:  # noqa: S310 — user-supplied endpoint
        resp.read()


def post_batches(
    rows: Iterator[Any],
    url: str,
    batch_size: int,
    transport: Transport,
) -> None:
    """POST ``[doc,doc,...]`` JSON-array batches (app/solr_commit.cc:
    112-119 builds exactly this payload from result lines)."""
    batch: list[str] = []
    for row in rows:
        batch.append(row[0])
        if len(batch) >= batch_size:
            transport(url, ("[" + ",".join(batch) + "]").encode())
            batch = []
    if batch:
        transport(url, ("[" + ",".join(batch) + "]").encode())


def write_http_json(
    df: DataFrame,
    ldef: LogDef,
    url: str = DEFAULT_URL,
    batch_size: int = 500,
    transport: Transport | None = None,
) -> None:
    """POST the aggregated result to a Solr-style JSON update endpoint.
    Executor-parallel: each partition batches and POSTs independently.
    """
    from cybersecurity_miw_spark.sources.parity import json_lines

    tr = transport or urllib_transport
    lines = json_lines(df, ldef)
    lines.foreachPartition(
        lambda rows: post_batches(rows, url, batch_size, tr)
    )
