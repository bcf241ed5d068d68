"""Driver-style oracle parity: run every catalog query through Spark
AND its oracle SQL through DuckDB on the same parquet tables, then
compare row count, column set, and cell values — the same contract the
round driver enforces at sf0.01 (CORRECTNESS_r{N}.json).

Float cells are compared exactly after both engines' own rounding:
the catalog rounds on both sides, so a mismatch here is a real
semantics divergence, not noise.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from cybersecurity_miw_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Rows → sorted list of tuples in sorted-column order with floats
    canonicalized, mirroring an order-insensitive value hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # collapse -0.0/0.0 and format deterministically
            return repr(v + 0.0)
        if v is None:
            return "<null>"
        return repr(v)

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# Coarse dtype classes: the driver's value hash goes through pandas, so
# an int64-vs-float64 drift (DuckDB HUGEINT, nullable-int promotion)
# changes the hashed repr even when Python-level values are identical.
# repr()-based normalize() above is blind to that — this map is not.
_DTYPE_CLASS = {
    "i": "int", "u": "int",
    "f": "float",
    "b": "bool",
    "M": "ts", "m": "td",
    "O": "obj", "S": "obj", "U": "obj",
}


def dtype_classes(pdf):
    return {c: _DTYPE_CLASS.get(pdf[c].dtype.kind, pdf[c].dtype.kind)
            for c in pdf.columns}


@pytest.fixture(autouse=True)
def _release_tracked_caches(spark):
    """Unpersist operator-internal intermediates after every query —
    exactly what bench.py does between queries. Without it a query's
    tracked persist (e.g. the MinHash banded projection) outlives its
    test, and a LATER test building the same logical plan gets an
    InMemoryRelation grafted into its plan — which broke
    test_plan_shapes' exchange counting when assemble_manifest (r15)
    started caching the identical banded plan the minhash ceiling
    test inspects."""
    yield
    from cybersecurity_miw_spark.cache import release_intermediates

    release_intermediates()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    qdf = QUERIES[name](spark, SF_DIR)
    scols = qdf.columns
    srows = [tuple(r) for r in qdf.collect()]

    con = duck_connection(SF_DIR)
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    s_norm = normalize(srows, scols)
    o_norm = normalize(orows, ocols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, o_norm) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"

    # Driver-faithful dtype check: both engines' pandas materialization
    # must land in the same coarse dtype class per column, else the
    # driver's pandas-hash goes red even with identical values (the
    # HUGEINT class that cost rows in r3 and r5).
    s_pdf = qdf.toPandas()
    o_pdf = con.execute(ORACLES[name]).df()

    # Driver-faithful canonicalization check, window queries only: the
    # driver canonicalizes via pandas sort/factorize, which raises
    # "unhashable type" on list/dict cells (the r17 link_anchor_index
    # red row — exact vs DuckDB here, red in CORRECTNESS_r17). The
    # repr-based normalize() above tolerates lists; this does not.
    # In-window queries must expose scalar columns only — serialize
    # arrays with array_join (the app_word_reverse_index precedent).
    from cybersecurity_miw_spark.catalog import _DRIVER_WINDOW

    if name in _DRIVER_WINDOW:
        from pyspark.sql.types import ArrayType, MapType, StructType

        bad = [
            f.name for f in qdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad, (
            f"{name}: in-window query exposes non-scalar columns {bad} "
            "— the driver's pandas canonicalizer cannot hash them; "
            "serialize with array_join before registering"
        )
        for pdf, side in ((s_pdf, "spark"), (o_pdf, "oracle")):
            try:
                pdf.sort_values(by=sorted(pdf.columns)).apply(
                    lambda s: s.factorize()[0] if s.dtype.kind == "O" else s
                )
            except TypeError as exc:  # pragma: no cover - guard path
                raise AssertionError(
                    f"{name}: driver pandas canonicalization fails on "
                    f"the {side} side: {exc}"
                ) from None

    s_kinds = dtype_classes(s_pdf)
    o_kinds = dtype_classes(o_pdf)
    diffs = {
        c: (s_kinds[c], o_kinds[c])
        for c in s_kinds
        if s_kinds[c] != o_kinds[c]
    }
    assert not diffs, (
        f"{name}: pandas dtype drift (spark, oracle) = {diffs} — "
        "values may match but the driver hash will not; CAST the oracle "
        "(or the Spark side) so both engines agree"
    )


def test_dtype_check_catches_uncast_hugeint():
    """A deliberately uncast DuckDB windowed sum (HUGEINT → pandas
    float64) must land in a different dtype class than a BIGINT cast —
    i.e. the class of drift that cost driver rows in r3/r5 now fails
    locally."""
    con = duckdb.connect()
    hug = con.execute(
        "SELECT sum(i) OVER (ORDER BY i) AS x FROM range(3) t(i)"
    ).df()
    big = con.execute(
        "SELECT CAST(sum(i) OVER (ORDER BY i) AS BIGINT) AS x "
        "FROM range(3) t(i)"
    ).df()
    assert dtype_classes(big)["x"] == "int"
    assert dtype_classes(hug)["x"] != "int", (
        "HUGEINT no longer drifts in pandas — this guard test and the "
        "dtype check may be obsolete"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without an SQL twin must still execute and return a
    stable schema (the driver records a weaker rows-only check)."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_events_table_density_assumption_for_blocked_matmul():
    """app_matrix_mult_blocked emits full product blocks (zeros
    included) while its oracle joins sparse cells; the two agree
    because event_id below 1024 is a CONTIGUOUS prefix (0..N-1) in
    every test sf dir. If the generator ever changes shape, fail here
    with a clear message instead of a mysterious driver hash
    mismatch."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        n, mx, dn = duckdb.sql(
            f"SELECT count(*), max(event_id), count(DISTINCT event_id) "
            f"FROM read_parquet('{path}') WHERE event_id < 1024"
        ).fetchone()
        assert n == dn == mx + 1, (
            f"{sf}: event_id under 1024 is not a contiguous 0..N-1 "
            f"prefix (count={n}, distinct={dn}, max={mx}) — revisit "
            "the app_matrix_mult_blocked oracle density note"
        )
