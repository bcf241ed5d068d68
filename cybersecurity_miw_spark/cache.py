"""Tracked persist for operator-internal intermediates.

Several operators cache a shared intermediate so multiple consumers
read it once (the MinHash band projection, the finest rollup level,
the funnel's filtered event projection). The returned DataFrames stay
lazy, so the operator itself cannot know when the caller is done and
an unpersist inside the operator would race the consumer's action —
but a long-lived session running many catalog queries would otherwise
accumulate cached partitions in executor memory indefinitely (Spark's
CacheManager holds them until explicitly unpersisted; GC of the
Python handle does NOT release them).

So every internal ``persist`` is registered here, and callers that
run many queries per session (the bench harness, a REPL, a query
service) call :func:`release_intermediates` between queries once the
results are materialized. Executor memory used by tracked caches is
then bounded by one query's intermediates, not the session's history.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, storage_level: StorageLevel | None = None
) -> DataFrame:
    """``df.persist(...)``, registered for later bulk release."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(out)
    return out


def release_intermediates() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call at any time — frames already unpersisted
    (or whose session is gone) are skipped silently. Lazy (non-
    blocking) unpersist: blocks are dropped asynchronously."""
    return _release_from(0)


def release_mark() -> int:
    """Snapshot the registry position. Pair with
    :func:`release_since` to release only the intermediates pinned
    AFTER this point — the scope a ``foreachBatch`` trigger needs so
    a per-trigger release cannot unpersist frames pinned by
    concurrent work in the same session (ADVICE r8)."""
    return len(_TRACKED)


def release_since(mark: int) -> int:
    """Unpersist intermediates registered after ``mark`` (a value
    from :func:`release_mark`); earlier pins are untouched."""
    return _release_from(max(mark, 0))


def _release_from(start: int) -> int:
    released = 0
    while len(_TRACKED) > start:
        df = _TRACKED.pop()
        try:
            lvl = df.storageLevel
            if lvl.useMemory or lvl.useDisk:
                df.unpersist(blocking=False)
                released += 1
        except Exception:
            pass  # stopped session / already-released frame
    return released
