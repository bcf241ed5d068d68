"""Sidecar I/O (cybersecurity_miw_spark/fsutil.py): store parameter
sidecars must publish atomically — a reader racing an overwrite must
never observe the destination ABSENT (the exists() guard in
load_*_store would silently degrade to legacy-store mode), and
concurrent writers must not share a temp name (ADVICE r10)."""

from __future__ import annotations

import os

import pytest

from cybersecurity_miw_spark import fsutil


def test_round_trip(spark, tmp_path):
    p = str(tmp_path / "store" / "_params.json")
    fsutil.write_text(spark, p, '{"a": 1}')
    assert fsutil.exists(spark, p)
    assert fsutil.read_text(spark, p) == '{"a": 1}'


def test_overwrite_replaces_without_absent_window(spark, tmp_path):
    """The overwrite path must be rename-onto-existing (one namespace
    op), never delete-then-rename: after the write the destination
    holds the new bytes, and at no point did the code path delete the
    destination before the replacement existed (pinned here by the
    absence of any delete(dest) call — the local-FS rename overwrites
    in place)."""
    p = str(tmp_path / "_params.json")
    fsutil.write_text(spark, p, "old-complete")
    fsutil.write_text(spark, p, "new-complete")
    assert fsutil.read_text(spark, p) == "new-complete"


def test_overwrite_false_preserves_existing(spark, tmp_path):
    p = str(tmp_path / "_params.json")
    fsutil.write_text(spark, p, "original")
    with pytest.raises(IOError):
        fsutil.write_text(spark, p, "clobber", overwrite=False)
    assert fsutil.read_text(spark, p) == "original"


def test_no_stranded_temp_files(spark, tmp_path):
    """Temp siblings are uuid-suffixed (concurrent writers cannot
    clobber each other's temp) and are consumed by the publishing
    rename — repeated writes leave exactly the destination (+ local
    .crc bookkeeping), no .tmp strays."""
    d = tmp_path / "store"
    p = str(d / "_params.json")
    for i in range(3):
        fsutil.write_text(spark, p, f"v{i}")
    names = os.listdir(d)
    assert not [n for n in names if n.endswith(".tmp")], names
    assert fsutil.read_text(spark, p) == "v2"
