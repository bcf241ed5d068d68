"""Tracked persist (cybersecurity_miw_spark/cache.py): operator-
internal caches must be releasable by long-lived sessions — a session
running many catalog queries would otherwise accumulate cached
partitions in executor memory forever (CacheManager holds them until
an explicit unpersist)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_miw_spark.cache import (
    _TRACKED,
    release_intermediates,
    tracked_persist,
)


def test_release_unpersists_tracked_frames(spark):
    release_intermediates()  # clean slate
    df = tracked_persist(spark.range(100).select(F.col("id") * 2))
    df.count()  # materialize the cache
    assert df.storageLevel.useMemory
    n = release_intermediates()
    assert n == 1
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    assert not _TRACKED
    # idempotent: nothing left to release
    assert release_intermediates() == 0


def test_operator_intermediates_are_tracked_and_releasable(spark):
    """funnel_stages / time_rollup / the jaccard confirm persist
    internal frames; after materializing results,
    release_intermediates() must find and drop every one of them.
    (minhash_lsh_candidates no longer pins anything — the r18
    bucket-roster rewrite made its banded projection single-pass, so
    the confirm path's pairs persist is the dedup-family coverage.)"""
    from cybersecurity_miw_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
    )
    from cybersecurity_miw_spark.operators.patterns import funnel_stages
    from cybersecurity_miw_spark.operators.timeseries import time_rollup

    release_intermediates()
    spark.catalog.clearCache()  # isolate from other tests' leftovers
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "signup", 1.0),
            (1, "2024-01-01 10:05:00", "click", 2.0),
            (1, "2024-01-01 10:06:00", "purchase", 3.0),
        ],
        "user_id LONG, ts STRING, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id LONG, text STRING"
    )

    funnel_stages(ev, stages=("signup", "click", "purchase")).collect()
    time_rollup(ev, levels=("minute", "hour")).collect()
    jaccard_pairs(docs, minhash_lsh_candidates(docs)).collect()
    assert release_intermediates() >= 3

    # every tracked cache is actually gone from the session
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty()


def test_release_since_scopes_to_mark(spark):
    """A foreachBatch trigger must be able to release ONLY the
    intermediates it pinned itself — frames pinned by concurrent work
    before the mark stay cached (ADVICE r8)."""
    from cybersecurity_miw_spark.cache import release_mark, release_since

    release_intermediates()  # clean slate
    outer = tracked_persist(spark.range(50).select(F.col("id") + 1))
    outer.count()
    mark = release_mark()
    inner = tracked_persist(spark.range(50).select(F.col("id") * 3))
    inner.count()
    assert release_since(mark) == 1
    assert not (inner.storageLevel.useMemory or inner.storageLevel.useDisk)
    # the pre-mark pin survived the scoped release
    assert outer.storageLevel.useMemory
    assert release_intermediates() == 1


def test_release_since_is_thread_scoped(spark):
    """ADVICE r9: release_since must key on the frames THIS thread's
    scope registered, not registry positions — a concurrent thread's
    pins made after the mark survive this trigger's release, and a
    concurrent release of earlier pins cannot shift the scope."""
    import threading

    from cybersecurity_miw_spark.cache import release_mark, release_since

    release_intermediates()  # clean slate
    early = tracked_persist(spark.range(40).select(F.col("id") + 7))
    early.count()

    mark = release_mark()
    mine = tracked_persist(spark.range(40).select(F.col("id") * 5))
    mine.count()

    other_frames = []

    def other_thread():
        df = tracked_persist(spark.range(40).select(F.col("id") - 2))
        df.count()
        other_frames.append(df)

    t = threading.Thread(target=other_thread)
    t.start()
    t.join()

    # concurrent release below the mark must not shift this scope
    release_intermediates_was = early.storageLevel.useMemory
    assert release_intermediates_was

    assert release_since(mark) == 1  # only THIS thread's post-mark pin
    assert not (mine.storageLevel.useMemory or mine.storageLevel.useDisk)
    other = other_frames[0]
    assert other.storageLevel.useMemory, (
        "another thread's post-mark pin was evicted by this trigger's "
        "scoped release"
    )
    assert release_intermediates() == 2  # early + other remain tracked


def test_double_release_cannot_drain_other_scopes(spark):
    """ADVICE r10: release_since matches scopes by IDENTITY. A released
    token is an empty list and compares == to any other empty open
    scope; an equality check would pop ALL open scopes on a double
    release, silently detaching every future pin from its scope."""
    from cybersecurity_miw_spark.cache import release_mark, release_since

    release_intermediates()  # clean slate
    token_a = release_mark()
    assert release_since(token_a) == 0  # empty scope, normal close

    token_b = release_mark()  # a NEW empty open scope
    # double release of the already-closed token must be a no-op:
    # it must NOT drain token_b (empty == empty, but not identical)
    assert release_since(token_a) == 0

    pinned = tracked_persist(spark.range(30).select(F.col("id") * 9))
    pinned.count()
    # token_b's scope must still be open and own the new pin
    assert release_since(token_b) == 1
    assert not (pinned.storageLevel.useMemory or pinned.storageLevel.useDisk)
    assert release_intermediates() == 0
