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
