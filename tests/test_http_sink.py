"""S15 Solr-style HTTP sink: batching, payload shape, endpoint —
against a file-backed stub transport (executors can't mutate driver
state, so the stub appends to a shared spool directory).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from cybersecurity_miw_spark.job import MiwJob
from cybersecurity_miw_spark.sources import http_sink

FMT = {
    "format_name": "hs",
    "delims": ",",
    "fields": [
        {"name": "etype", "pos": 0, "type": "string", "key": True},
        {"name": "val", "pos": 1, "type": "int",
         "aggregated": True, "aggregation": "sum"},
    ],
}


def _spool_transport(spool_dir: str):
    def transport(url: str, payload: bytes) -> None:
        name = os.path.join(spool_dir, f"{uuid.uuid4().hex}.json")
        with open(name, "wb") as f:
            f.write(url.encode() + b"\n" + payload)

    return transport


def test_http_sink_posts_json_array_batches(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    lines = [f"t{i % 3},{i}" for i in range(30)]
    job = MiwJob(format=FMT, lines=lines)
    df = job.result(spark)

    http_sink.write_http_json(
        df,
        job.result_ldef,
        url="http://example.invalid/solr/update/json?commit=true",
        batch_size=2,
        transport=_spool_transport(spool),
    )

    posts = sorted(glob.glob(spool + "/*.json"))
    assert posts  # at least one batch went out
    docs = []
    for p in posts:
        raw = open(p, "rb").read().split(b"\n", 1)
        assert raw[0] == b"http://example.invalid/solr/update/json?commit=true"
        batch = json.loads(raw[1])  # payload is a JSON array of docs
        assert isinstance(batch, list)
        assert 1 <= len(batch) <= 2  # batch_size respected
        docs.extend(batch)

    by_id = {d["id"]: d for d in docs}
    assert set(by_id) == {"t0", "t1", "t2"}
    assert by_id["t0"]["logs"] == 10
    assert by_id["t0"]["val"] == sum(i for i in range(30) if i % 3 == 0)
    assert by_id["t0"]["format_name"] == "hs"
