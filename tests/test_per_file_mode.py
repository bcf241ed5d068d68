"""U2 per-file independent results: the reference's default emits one
result set per input file (miw/job.cc:134-173); here the file name is
an extra group key so one Spark job produces all files' results.
"""

from __future__ import annotations

from cybersecurity_miw_spark.job import MiwJob

FMT = {
    "format_name": "pf",
    "delims": ",",
    "fields": [
        {"name": "etype", "pos": 1, "type": "string", "key": True},
        {"name": "val", "pos": 2, "type": "int",
         "aggregated": True, "aggregation": "sum"},
    ],
}


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_per_file_groups(spark, tmp_path):
    f1 = _write(tmp_path, "a.log", ["1,x,10", "2,x,5", "3,y,1"])
    f2 = _write(tmp_path, "b.log", ["4,x,7"])

    job = MiwJob(format=FMT, files=[f1, f2], merge_results=False)
    df = job.result(spark)
    assert "_file" in df.columns

    rows = {
        (r["_file"].rsplit("/", 1)[-1], r["etype"]): (r["logs"], r["val"])
        for r in df.collect()
    }
    assert rows == {
        ("a.log", "x"): (2, 15),
        ("a.log", "y"): (1, 1),
        ("b.log", "x"): (1, 7),
    }
    # id carries only the format keys, not the file
    ids = {r["id"] for r in df.collect()}
    assert ids == {"x", "y"}


def test_merged_default(spark, tmp_path):
    f1 = _write(tmp_path, "a.log", ["1,x,10"])
    f2 = _write(tmp_path, "b.log", ["2,x,7"])
    job = MiwJob(format=FMT, files=[f1, f2])
    rows = {r["etype"]: (r["logs"], r["val"]) for r in job.result(spark).collect()}
    assert rows == {"x": (2, 17)}


def test_per_file_parity_output_hides_file_col(spark, tmp_path):
    import json

    from cybersecurity_miw_spark.sources import parity

    f1 = _write(tmp_path, "a.log", ["1,x,10"])
    job = MiwJob(format=FMT, files=[f1], merge_results=False)
    df = job.result(spark)
    rec = json.loads(parity.json_lines(df, job.result_ldef).collect()[0][0])
    assert "_file" not in rec
    assert rec["val"] == 10
