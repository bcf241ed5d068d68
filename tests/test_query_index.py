"""docs/QUERIES.md must stay in sync with the live catalog — the
generator is deterministic, so regenerating in-memory and diffing
against the committed file catches forgotten regenerations (including
description-only drift: VERDICT r10 found a stale row the old
names+modes-only check could not see)."""

from __future__ import annotations


def test_query_index_is_current():
    import importlib

    gen = importlib.import_module("tools.gen_query_index")

    with open("docs/QUERIES.md") as f:
        committed = f.read()
    generated = gen.render()
    # exact comparison: the generator is deterministic, so ANY diff —
    # a new query, a reworded docstring, a window change — means
    # someone edited the catalog without regenerating
    assert committed == generated, (
        "docs/QUERIES.md is stale — run python tools/gen_query_index.py"
    )


def test_first_sentence_boundaries():
    fs = __import__(
        "tools.gen_query_index", fromlist=["first_sentence"]
    ).first_sentence
    assert fs("A b. C d.") == "A b."
    # "i.e."/"e.g." followed by lowercase are NOT sentence ends
    assert (
        fs("Emits #users rows, i.e. one per user. Second sentence.")
        == "Emits #users rows, i.e. one per user."
    )
    assert fs("No terminator here") == "No terminator here"
    assert fs(None) == "" and fs("") == ""
    # multiline docstrings collapse to one line first
    assert fs("First\nsentence. Second one.") == "First sentence."
