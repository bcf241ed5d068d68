"""Regression goldens for the bugs found by round-1 verification:
ANSI cast crash on dirty numerics, skip_header over-dropping, keyless
union_count, ratio-over-count aliasing, AND-logic multi-value matches,
textual hour bucketing, std_date_dt assembly, and lenient format JSON.
"""

from __future__ import annotations

import json

import pytest

from cybersecurity_miw_spark.job import MiwJob
from cybersecurity_miw_spark.plans.logdef import LogDef, lenient_json_loads
from cybersecurity_miw_spark.sources import sinks


def _fmt(name, fields, **kw):
    return {"format_name": name, "delims": kw.pop("delims", ","), "fields": fields, **kw}


def test_atoi_atof_garbage_does_not_crash(spark):
    """miw/log_format.cc:503-538: atoi('12abc')=12, atoi('abc')=0,
    atof('3.5x')=3.5 — and the job survives dirty tokens under ANSI."""
    fmt = _fmt(
        "dirty",
        [
            {"name": "k", "pos": 0, "type": "string", "key": True},
            {"name": "i", "pos": 1, "type": "int", "aggregated": True, "aggregation": "sum"},
            {"name": "f", "pos": 2, "type": "float", "aggregated": True, "aggregation": "sum"},
            {"name": "b", "pos": 3, "type": "bool"},
        ],
    )
    rows = MiwJob(fmt, lines=["a,12abc,3.5x,1", "a,abc,junk,0", "a, -4,-.5e1,7"]).run(spark).collect()
    r = rows[0]
    assert r["i"] == 12 + 0 - 4
    assert r["f"] == pytest.approx(3.5 + 0.0 - 5.0)


def test_skip_header_per_file(spark, tmp_path):
    """miw/log_format.cc:194-198: line 0 of EACH file is dropped; a
    data line that merely equals the header text survives."""
    f1 = tmp_path / "a.log"
    f1.write_text("id,v\n1,10\nid,v\n2,20\n")  # row 3 equals the header
    f2 = tmp_path / "b.log"
    f2.write_text("id,v\n3,30\n")
    fmt = _fmt(
        "sh",
        [
            {"name": "id", "pos": 0, "type": "string", "key": True},
            {"name": "v", "pos": 1, "type": "string"},
        ],
    )
    rows = MiwJob(fmt, files=[str(f1), str(f2)], skip_header=True).run(spark).collect()
    got = {(r["id"], r["v"]) for r in rows}
    assert got == {("1", "10"), ("id", "v"), ("2", "20"), ("3", "30")}


def test_keyless_union_count(spark):
    """Formats with no key fields are legal: one global histogram row."""
    fmt = _fmt(
        "nokey",
        [
            {"name": "w", "pos": 0, "type": "string", "aggregated": True,
             "aggregation": "union_count"},
        ],
    )
    rows = MiwJob(fmt, lines=["x", "y", "x", "x"]).run(spark).collect()
    assert len(rows) == 1
    assert rows[0]["w_counts"] == {"x": 3, "y": 1}
    assert rows[0]["logs"] == 4


def test_ratio_over_count_aggregated_field(spark):
    """ratio referencing a count-aggregated operand resolves its
    <name>_count output alias (log_record.cc:747-823)."""
    fmt = _fmt(
        "rc",
        [
            {"name": "k", "pos": 0, "type": "string", "key": True},
            {"name": "c", "pos": 1, "type": "int", "aggregated": True, "aggregation": "count"},
            {"name": "r", "type": "float", "aggregated": True, "aggregation": "ratio",
             "numerator": "c", "denominator": "logs"},
        ],
    )
    rows = MiwJob(fmt, lines=["a,1", "a,2", "b,5"]).run(spark).collect()
    by_k = {r["k"]: r for r in rows}
    assert by_k["a"]["r"] == pytest.approx(1.0)  # c_count=2 / logs=2


def test_positive_and_match_requires_all_values(spark, tmp_path):
    """log_format.cc:341-353: positive substring AND-logic over a
    multi-value set keeps the row only when the token contains ALL
    values."""
    mf = tmp_path / "values.txt"
    mf.write_text("foo\nbar\n")
    fmt = _fmt(
        "andmatch",
        [
            {"name": "t", "pos": 0, "type": "string", "key": True,
             "match": {"match_file": str(mf), "logic": "and"}},
        ],
    )
    rows = MiwJob(fmt, lines=["foobar", "foo only", "bar only", "xbarfoox"]).run(spark).collect()
    got = {r["t"] for r in rows}
    assert got == {"foobar", "xbarfoox"}


def test_hour_bucket_pads_and_floors(spark):
    """log_format.cc:448-453: textual hour bucket is floored to the
    processing offset and zero-padded ('9:05:02' with offset 2 → '08')."""
    fmt = _fmt(
        "hb",
        [
            {"name": "h", "pos": 0, "type": "time", "key": True,
             "processing": "hour", "processing_offset": 2},
        ],
    )
    rows = MiwJob(fmt, lines=["9:05:02", "14:39:02"]).run(spark).collect()
    assert {r["h"] for r in rows} == {"08", "14"}


def test_std_date_dt_shapes(spark):
    """log_record.cc:556-561,673: hour-processed time expands to
    HH:00:00; a date already carrying 'T' is emitted alone."""
    fmt_ht = LogDef.from_json(_fmt(
        "ht",
        [
            {"name": "d", "pos": 0, "type": "date", "key": True,
             "processing": "day", "date_format": "%Y-%m-%d"},
            {"name": "t", "pos": 1, "type": "time", "key": True, "processing": "hour"},
        ],
    ))
    df = MiwJob(fmt_ht, lines=["2012-11-30,23:05:10"]).run(spark)
    out = sinks.finalize(df, fmt_ht).collect()[0]
    assert out["std_date_dt"] == "2012-11-30T23:00:00Z"

    fmt_dh = LogDef.from_json(_fmt(
        "dh",
        [
            {"name": "d", "pos": 0, "type": "date", "key": True,
             "processing": "hour", "date_format": "%Y-%m-%d %H:%M:%S"},
        ],
    ))
    df2 = MiwJob(fmt_dh, lines=["2012-11-30 23:05:10"]).run(spark)
    out2 = sinks.finalize(df2, fmt_dh).collect()[0]
    assert out2["std_date_dt"] == "2012-11-30T23:00:00Z"


def test_lenient_json_trailing_comma_and_comments():
    text = """
    {
      // a comment like jsoncpp tolerates
      "format_name": "x",
      "fields": [
        {"name": "a", "pos": 0,},
      ],
    }
    """
    obj = lenient_json_loads(text)
    assert obj["format_name"] == "x"
    assert obj["fields"][0]["name"] == "a"
    # strict JSON still round-trips unchanged
    assert lenient_json_loads(json.dumps(obj)) == obj


def test_short_lines_with_match_do_not_crash(spark):
    """A match predicate probing a position beyond a short line's token
    count must drop the row, not abort (ANSI INVALID_ARRAY_INDEX)."""
    fmt = _fmt(
        "short",
        [
            {"name": "a", "pos": 0, "type": "string", "key": True},
            {"name": "m", "pos": 5, "type": "string",
             "match": {"match_str": "keep", "logic": "and"}},
        ],
    )
    rows = MiwJob(fmt, lines=["x", "a,b,c,d,e,keep", "a,b,c,d,e,drop"]).run(spark).collect()
    assert len(rows) == 1


def test_strptime_z_offset_colon_and_plain(spark):
    """glibc strptime %z accepts both +0530 and +05:30; the Java-side
    optional-section pattern must parse both to the same instant
    (round-2 advice: the colon form previously yielded NULL)."""
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.functions.datetime import parse_date

    df = spark.createDataFrame(
        [("2012-11-30 23:05:12 +05:30",), ("2012-11-30 23:05:12 +0530",)],
        "raw string",
    )
    ts = [
        r[0]
        for r in df.select(
            parse_date(F.col("raw"), "%Y-%m-%d %H:%M:%S %z")
        ).collect()
    ]
    assert ts[0] is not None
    assert ts[0] == ts[1]


def test_union_limit_caps_hot_group(spark):
    """A8 union cap (SURVEY §7.4 risk 5): one hot group with a
    high-cardinality union field must complete with O(limit) per-group
    aggregation state and yield exactly the sorted prefix of the
    uncapped union. Numeric unions (append, no dedup) cap the same
    way."""
    fmt = _fmt(
        "hot",
        [
            {"name": "k", "pos": 0, "type": "string", "key": True},
            {"name": "u", "pos": 1, "type": "string",
             "aggregated": True, "aggregation": "union"},
            {"name": "n", "pos": 2, "type": "int",
             "aggregated": True, "aggregation": "union"},
        ],
    )
    # 5000 distinct values in ONE group (zero-padded so lexicographic
    # order == numeric order), plus a small second group
    lines = [f"hot,v{i:05d},{i % 7}" for i in range(5000)]
    lines += ["cold,x,1", "cold,x,2"]
    from cybersecurity_miw_spark.job import MiwJob as _J

    df = _J(fmt, lines=lines, union_limit=10).result(spark)
    rows = {r["k"]: r for r in df.collect()}
    assert rows["hot"]["logs"] == 5000
    assert rows["hot"]["u"] == [f"v{i:05d}" for i in range(10)]
    # numeric append keeps duplicates: 5000 rows of i%7 → the 10
    # smallest are ~715 zeros truncated at 10
    assert rows["hot"]["n"] == [0] * 10
    assert rows["cold"]["u"] == ["x"]
    assert rows["cold"]["n"] == [1, 2]

    # uncapped stays reference-parity
    un = _J(fmt, lines=["a,q,3", "a,p,3", "a,q,4"]).result(spark).collect()[0]
    assert un["u"] == ["p", "q"]
    assert un["n"] == [3, 3, 4]
