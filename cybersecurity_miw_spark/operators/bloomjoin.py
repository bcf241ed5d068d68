"""Bloom-filter join pruning: filter the big (fact) side of a join
with a compact membership sketch of the small (dim) side BEFORE the
shuffle — the runtime-filter technique engines apply when a join's
build side is selective (Spark's own AQE has an internal
`bloom_filter_agg` runtime filter, but it is not exposed in the
public function registry, so this module builds the same structure
from public expressions).

Why it matters at 100 TB: a semi join on a selective dim still
shuffles EVERY fact row to its hash partition before the join drops
it. A bloom filter is a few hundred KB of literal state evaluated
row-by-row inside the scan stage (whole-stage codegen, no Python), so
non-matching rows die before the exchange: shuffle volume scales with
the MATCH rate, not the fact size. No false negatives — the follow-up
exact join (or the caller's own join) removes the false positives, so
end-to-end semantics stay exact while the shuffle shrinks by
~selectivity.

Construction is all JVM-side: k probe positions per key via seeded
xxhash64, build side packs positions into 64-bit words with a bit_or
aggregate (driver collects ≤ m/64 longs — the model, same bounded
driver traffic as the PQ codebooks), probe side tests bits against
ONE constant-folded array<long> literal (the literal-LUT pattern of
similarity.py's ADC scan).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cap the model at 2^22 bits (64k longs, ~512 KB literal): beyond
# this the plan literal gets unwieldy — and a dim too big for a
# sub-MB sketch at a sane fpp is big enough that a plain shuffle
# semi join is the right tool anyway
MAX_BITS = 1 << 22


@dataclass(frozen=True)
class BloomModel:
    words: tuple[int, ...]  # m/64 packed little-endian bit words
    num_bits: int
    k: int  # number of hash probes per key


def _positions(col: Column, num_bits: int, k: int) -> list[Column]:
    """k probe positions: pmod(xxhash64(key, seed), m) — seeded JVM
    hashes, independent enough for bloom guarantees in practice."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits))
        for seed in range(k)
    ]


def build_bloom(
    small: DataFrame,
    key_col: str,
    n_items: int | None = None,
    fpp: float = 0.03,
) -> BloomModel:
    """Build a bloom model of ``small[key_col]`` (nulls excluded —
    SQL equality never matches null, so a semi join drops them too).

    ``n_items`` sizes the filter (standard m = -n·ln(p)/ln²2,
    k = m/n·ln2); when omitted, one count() job on the small side
    determines it — acceptable by definition of "small side", and
    callers with a known cardinality skip it. Raises when the sized
    filter exceeds MAX_BITS: that dim wants a real shuffle semi join,
    not a sketch."""
    keyed = small.select(F.col(key_col).alias("_k")).where(
        F.col("_k").isNotNull()
    )
    if n_items is None:
        n_items = keyed.count()
    n_items = max(n_items, 1)
    num_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = ((num_bits + 63) // 64) * 64
    if num_bits > MAX_BITS:
        raise ValueError(
            f"bloom of {n_items} keys at fpp={fpp} needs {num_bits} bits "
            f"(> {MAX_BITS}); use a plain shuffle semi join for this dim"
        )
    k = max(1, round(num_bits / n_items * math.log(2)))

    pos = F.explode(F.array(*_positions(F.col("_k"), num_bits, k)))
    # the pyspark shiftleft/shiftrightunsigned wrappers require a
    # python-int shift; call_function reaches the SQL functions, which
    # accept any int expression
    packed = (
        keyed.select(pos.alias("_p"))
        .select(
            (F.col("_p") / 64).cast("long").alias("_w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("_p") % 64).cast("int"),
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in packed:
        words[r["_w"]] = r["_bits"]
    return BloomModel(words=tuple(words), num_bits=num_bits, k=k)


def might_contain(model: BloomModel, col: Column) -> Column:
    """Membership test against the literal model — k element_at
    lookups + bit tests on one constant-folded array<long>, evaluated
    inside whole-stage codegen. Null input → false (semi-join
    semantics)."""
    arr = F.lit(list(model.words))
    test = F.lit(True)
    for p in _positions(col, model.num_bits, model.k):
        word = F.element_at(arr, (p / 64).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftrightunsigned", word, (p % 64).cast("int")
        )
        test = test & ((bit.bitwiseAND(F.lit(1))) == 1)
    return col.isNotNull() & test


def bloom_prune(df: DataFrame, model: BloomModel, key_col: str) -> DataFrame:
    """Narrow filter of ``df`` to rows whose key MIGHT be in the
    model (false positives ≤ fpp survive; no false negatives). This
    is the pre-shuffle prune — apply it before a join/shuffle so
    exchange volume tracks the match rate."""
    return df.where(might_contain(model, F.col(key_col)))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_items: int | None = None,
    fpp: float = 0.03,
) -> DataFrame:
    """Exact semi join with bloom pre-pruning: bloom-filter the big
    side (kills ~(1-selectivity)·(1-fpp) of rows before any
    exchange), then a real leftsemi join removes the false positives.
    Result is EXACTLY ``big ⋉ small`` — the sketch only moves work
    out of the shuffle, never changes the answer."""
    model = build_bloom(small, on, n_items=n_items, fpp=fpp)
    pruned = bloom_prune(big, model, on)
    return pruned.join(
        small.select(on).distinct(), on=on, how="leftsemi"
    )
