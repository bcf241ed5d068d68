"""Measured MinHash-LSH banding recall on planted near-duplicate pairs
— the dedup twin of bench_ann_recall.py.

Banding theory says a pair with true shingle-Jaccard J becomes a
candidate with probability 1-(1-J^r)^b (r rows per band, b bands).
The exact-Jaccard confirm stage can only keep what banding surfaces,
so this S-curve IS the dedup pipeline's recall ceiling — and the
pre-round-8 default (16 hashes / 4 bands, r=4) sits at just
1-(1-0.8^4)^4 = 0.88 for J=0.8 pairs. This harness measures the real
curve on planted pairs instead of trusting the formula.

Corpus construction: each planted pair (A, B) is two 52-word
documents sharing a c-word prefix with pair-unique vocabulary
(words are "p{i}w{j}" / "p{i}a{j}" / "p{i}b{j}"), so cross-pair
Jaccard is exactly 0 and the pair's true 3-shingle Jaccard is
(c-2)/(2*(L-2)-(c-2)) — swept over c to span J in [0.45, 0.97].
True J is recomputed independently in Python set arithmetic (same
lowercase/whitespace/k=3 shingling as operators/textstats.shingles).
A background of unrelated docs is added so false-candidate volume at
J~0 is measured, not assumed.

Output: one JSON line with per-J-bin recall for each (num_hashes,
bands) grid point, plus candidate counts and signature wall time.
Recorded in SCALE.md ("LSH banding recall").
"""

from __future__ import annotations

import json
import sys
import time

L = 52  # words per planted doc -> 50 shingles


def planted_rows(n_pairs: int = 400, n_background: int = 2000):
    """Deterministic planted corpus. Returns (rows, true_pairs) where
    rows = [(doc_id, text)] and true_pairs = {(id_a, id_b): true_J}."""
    rows, true_pairs = [], {}

    def shingle_set(words):
        if len(words) < 3:
            return {" ".join(words)}
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    for i in range(n_pairs):
        # sweep shared-prefix length so true J spans ~[0.45, 0.97]
        c = 33 + (i % 19)  # 33..51 shared words (J up to ~0.96)
        shared = [f"p{i}w{j}" for j in range(c)]
        a_words = shared + [f"p{i}a{j}" for j in range(L - c)]
        b_words = shared + [f"p{i}b{j}" for j in range(L - c)]
        sa, sb = shingle_set(a_words), shingle_set(b_words)
        j_true = len(sa & sb) / len(sa | sb)
        id_a, id_b = 2 * i, 2 * i + 1
        rows.append((id_a, " ".join(a_words)))
        rows.append((id_b, " ".join(b_words)))
        true_pairs[(id_a, id_b)] = j_true
    for k in range(n_background):
        words = [f"bg{k}x{j}" for j in range(L)]
        rows.append((10_000_000 + k, " ".join(words)))
    return rows, true_pairs


# finer bins around the J=0.8 production threshold — the coarse
# 0.75-0.85 bin mixes the steep part of the S-curve (recall at
# J=0.75 is ~0.90 for 112/16 but ~0.99 at J=0.82)
BINS = [(0.45, 0.55), (0.55, 0.65), (0.65, 0.75), (0.75, 0.78),
        (0.78, 0.82), (0.82, 0.85), (0.85, 0.95), (0.95, 1.01)]


def main() -> None:
    from pyspark.sql import functions as F

    from cybersecurity_miw_spark.cache import release_intermediates
    from cybersecurity_miw_spark.operators import dedup
    from cybersecurity_miw_spark.session import get_spark

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    spark = get_spark("lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")

    rows, true_pairs = planted_rows(n_pairs=n_pairs)
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    docs = docs.localCheckpoint(eager=True)  # freeze the corpus

    grid = [(16, 4), (64, 8), (128, 16), (112, 16)]
    results = {}
    for num_hashes, bands in grid:
        t0 = time.perf_counter()
        cand = dedup.minhash_lsh_candidates(
            docs, num_hashes=num_hashes, bands=bands, shingle_k=3
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in cand.collect()  # bounded: planted pairs + FPs
        }
        wall = round(time.perf_counter() - t0, 2)
        release_intermediates()

        bins = {}
        for lo, hi in BINS:
            in_bin = [p for p, j in true_pairs.items() if lo <= j < hi]
            hit = sum(1 for p in in_bin if p in got)
            bins[f"{lo:.2f}-{min(hi, 1.0):.2f}"] = {
                "n": len(in_bin),
                "recall": round(hit / len(in_bin), 4) if in_bin else None,
            }
        false_cands = sum(1 for p in got if p not in true_pairs)
        r = num_hashes // bands
        results[f"{num_hashes}/{bands}"] = {
            "rows_per_band": r,
            "theory_recall_at_0.8": round(1 - (1 - 0.8**r) ** bands, 4),
            "bins": bins,
            "n_candidates": len(got),
            "false_candidates": false_cands,
            "wall_s": wall,
        }
        print(f"  {num_hashes}/{bands}: done in {wall}s", file=sys.stderr)

    print(json.dumps({
        "metric": "lsh_banding_recall",
        "n_pairs": len(true_pairs),
        "n_docs": docs.count(),
        "default": f"{dedup.DEFAULT_NUM_HASHES}/{dedup.DEFAULT_BANDS}",
        "grid": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
