"""Every format JSON shipped with the reference must load and compile
to a valid aggregation plan — the 'a user of the reference switches
repos and runs their formats' bar. (anon_bluecoat carries a trailing
comma: exercises the lenient jsoncpp-style parse.)
"""

from __future__ import annotations

import glob

import pytest

from cybersecurity_miw_spark.plans.compiler import compile_pipeline
from cybersecurity_miw_spark.plans.logdef import LogDef
from cybersecurity_miw_spark.sources.text import from_lines

FORMAT_GLOB = "/root/reference/miw/formats/*.json"
SKIP = {"test_json2pb.py"}


def format_paths() -> list[str]:
    return sorted(glob.glob(FORMAT_GLOB))


@pytest.mark.parametrize("path", format_paths(), ids=lambda p: p.rsplit("/", 1)[-1])
def test_format_loads_and_compiles(spark, path):
    ldef = LogDef.load(path)
    assert ldef.fields
    # a line with enough tokens that projection keeps the row; values
    # are nonsense — the point is the plan resolves and executes
    n = ldef.max_pos + 1
    line = ldef.delims[0].join(f"v{i}" for i in range(n))
    df = from_lines(spark, [line, line], ldef)
    out = compile_pipeline(df, ldef)
    rows = out.collect()
    assert len(rows) >= 0  # plan executed
    assert "id" in out.columns and "logs" in out.columns


def test_dotted_key_field_with_store_content(spark):
    """Dotted/spaced key names (firewall_checkpoint's 'H.323 message'
    style) must survive the store_content group/join path too."""
    from cybersecurity_miw_spark.job import MiwJob

    fmt = {
        "format_name": "dot",
        "delims": ",",
        "fields": [
            {"name": "H.323 msg", "pos": 0, "type": "string", "key": True},
            {"name": "v", "pos": 1, "type": "int",
             "aggregated": True, "aggregation": "sum"},
        ],
    }
    job = MiwJob(format=fmt, lines=["a,1", "a,2", "b,5"], store_content=True)
    rows = sorted(
        (r["H.323 msg"], r["v"], sorted(r["content"]))
        for r in job.result(spark).collect()
    )
    assert rows == [("a", 3, ["a,1", "a,2"]), ("b", 5, ["b,5"])]


def test_gzip_log_ingestion(spark, tmp_path):
    """Compressed logs read transparently (spark.text handles .gz) —
    the reference requires uncompressed input; at scale logs arrive
    gzipped."""
    import gzip

    from cybersecurity_miw_spark.job import MiwJob

    p = tmp_path / "logs.gz"
    with gzip.open(p, "wt") as f:
        f.write("a,1\na,2\nb,5\n")
    fmt = {
        "format_name": "gz",
        "delims": ",",
        "fields": [
            {"name": "k", "pos": 0, "type": "string", "key": True},
            {"name": "v", "pos": 1, "type": "int",
             "aggregated": True, "aggregation": "sum"},
        ],
    }
    job = MiwJob(format=fmt, files=str(p))
    rows = {r["k"]: r["v"] for r in job.result(spark).collect()}
    assert rows == {"a": 3, "b": 5}
