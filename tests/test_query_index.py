"""docs/QUERIES.md must stay in sync with the live catalog — the
generator is deterministic, so regenerating in-memory and diffing
against the committed file catches forgotten regenerations."""

from __future__ import annotations


def test_query_index_is_current():
    import importlib

    gen = importlib.import_module("tools.gen_query_index")
    from cybersecurity_miw_spark.catalog import ORACLE, QUERIES

    with open("docs/QUERIES.md") as f:
        committed = f.read()
    # row count and per-query presence (full text diff would be
    # brittle against docstring reflow; names + verification mode are
    # the contract)
    for name in QUERIES:
        assert f"| `{name}` |" in committed, (
            f"{name} missing from docs/QUERIES.md — run "
            "python tools/gen_query_index.py"
        )
        mode = "sql" if name in ORACLE else "rows-only"
        assert f"| `{name}` | {mode} " in committed, (name, mode)
    assert committed.count("| `") == len(QUERIES)
    assert gen.first_sentence("A b. C d.") == "A b."
