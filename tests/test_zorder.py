"""Z-order layout writer (sources/zorder.py): Morton key vs a python
model, write roundtrip, and the property the layout exists for —
parquet file-level min/max stats prune on BOTH clustered dimensions,
where a single-column sort prunes on one."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cybersecurity_miw_spark.sources.zorder import (
    write_zordered,
    zorder_key,
)


def _morton(xs: list[int], bits: int) -> int:
    z = 0
    d = len(xs)
    for j in range(bits):
        for i in range(d):
            z |= ((xs[i] >> j) & 1) << (j * d + i)
    return z


def test_zvalue_matches_python_model(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    # identity quantization: stats (0, 15) at 4 bits maps k -> k
    out = zorder_key(
        df, ("x", "y"), bits=4, stats={"x": (0, 15), "y": (0, 15)}
    )
    got = {(r["x"], r["y"]): r["_z"] for r in out.collect()}
    for (x, y), z in got.items():
        assert z == _morton([x, y], 4), (x, y)


def test_zorder_key_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 2)], "x INT, y INT")
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key(df, ("x",))
    with pytest.raises(ValueError, match="signed long"):
        zorder_key(df, ("x", "y"), bits=40)


def test_write_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "z")
    write_zordered(ev, out, ("user_id", "value"), num_files=4)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )


def _files_admitting(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(admitting, total) parquet files whose [min,max] for col
    intersects [lo, hi] — what a stats-based reader would scan."""
    import glob

    admit = total = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                cc = rg.column(c)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is None or not (hi < fmin or lo > fmax):
            admit += 1
    return admit, total


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zdir = str(tmp_path / "zord")
    sdir = str(tmp_path / "usersorted")
    write_zordered(ev, zdir, ("user_id", "value"), num_files=8)
    # baseline: classic single-column sort layout
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    stats = ev.agg(
        F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")
    ).collect()[0]
    vlo, vhi = stats[0], stats[1]
    ulo, uhi = stats[2], stats[3]

    # narrow band on the SECOND dimension (value): the user-sorted
    # layout stores every value range in every file — no pruning; the
    # z-layout splits the value space across files
    band = (vlo + 0.45 * (vhi - vlo), vlo + 0.55 * (vhi - vlo))
    z_admit, z_total = _files_admitting(zdir, "value", *band)
    s_admit, s_total = _files_admitting(sdir, "value", *band)
    assert s_admit == s_total, "single-sort layout can't prune on value"
    assert z_admit < z_total, "z-layout must prune some files on value"
    assert z_admit <= 0.75 * z_total

    # and the FIRST dimension still prunes too
    uband = (ulo, ulo + 0.1 * (uhi - ulo))
    zu_admit, zu_total = _files_admitting(zdir, "user_id", *uband)
    assert zu_admit < zu_total, "z-layout must also prune on user_id"
