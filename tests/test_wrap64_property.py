"""Property-test the DuckDB int64-wrap emulation used by the linreg
oracle (catalog._wrap64): reducing a HUGEINT through the modular form
must equal two's-complement wrap-around — the semantics of Spark's
non-ANSI sum(long) — for any value, including far past ±2^63 where a
bare CAST(... AS BIGINT) would raise."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from cybersecurity_miw_spark.catalog import _wrap64


def wrap_py(n: int) -> int:
    """Reference semantics: Java/Spark long overflow."""
    return (n + 2**63) % 2**64 - 2**63


@settings(max_examples=300, deadline=None)
@given(
    n=st.one_of(
        st.integers(-(2**70), 2**70),
        # dense coverage at the int64 boundaries
        st.integers(2**63 - 4, 2**63 + 4),
        st.integers(-(2**63) - 4, -(2**63) + 4),
        st.integers(2**64 - 4, 2**64 + 4),
    )
)
def test_wrap64_matches_twos_complement(n):
    got = duckdb.sql(f"SELECT {_wrap64(f'({n})::HUGEINT')}").fetchone()[0]
    assert got == wrap_py(n)
