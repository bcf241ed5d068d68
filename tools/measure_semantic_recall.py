"""Semantic-dedup blocking recall vs n_planes (r12): the
occupancy-constant schedule raises planes with the corpus — each
extra plane halves bucket occupancy (cost) but multiplies pair
recall by P(same side) = (1 - theta/pi) per plane. This harness
measures the trade on planted pairs so the schedule's recall cost is
a number, not a formula.

Corpus: n base unit vectors (seeded Gaussian, 64-d) + one planted
near-dup per base vector at a controlled angle (cos ~0.95 and ~0.85
populations). Ground truth = exact cosine threshold over the planted
pairs; measured = cosine_near_dup_lsh's pair list at each plane
count. Prints one JSON line per (n_planes, cos-band)."""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

from cybersecurity_miw_spark.operators import similarity  # noqa: E402
from cybersecurity_miw_spark.session import get_spark  # noqa: E402

DIM = 64
N_BASE = 2_000
SEED = 7


def main() -> None:
    spark = get_spark("r12-semantic-recall")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.RandomState(SEED)
    base = rng.randn(N_BASE, DIM)
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    def rotate(v, angle, rng):
        # random orthogonal direction, exact target angle
        d = rng.randn(DIM)
        d -= d.dot(v) * v
        d /= np.linalg.norm(d)
        return math.cos(angle) * v + math.sin(angle) * d

    rows = []
    planted = {}  # (a_id, b_id) -> cos
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        angle = math.acos(0.95) if i % 2 == 0 else math.acos(0.85)
        w = rotate(v, angle, rng)
        rows.append((N_BASE + i, [float(x) for x in w]))
        planted[(i, N_BASE + i)] = round(float(v.dot(w)), 6)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).persist()
    df.count()

    for n_planes, n_bands in (
        (2, 1), (4, 1), (6, 1), (8, 1), (10, 1), (12, 1),
        (6, 2), (6, 4), (8, 4), (10, 4), (12, 4), (12, 6),
    ):
        found = {
            (r["id_a"], r["id_b"])
            for r in similarity.cosine_near_dup_lsh(
                df, threshold=0.8, dim=DIM,
                n_planes=n_planes, n_bands=n_bands,
            ).collect()
        }
        for lo, hi, tag in ((0.94, 1.01, "cos~0.95"), (0.84, 0.90, "cos~0.85")):
            want = {
                p for p, c in planted.items() if lo <= c < hi
            }
            got = want & found
            print(json.dumps({
                "n_planes": n_planes, "n_bands": n_bands, "band": tag,
                "planted": len(want), "recalled": len(got),
                "recall": round(len(got) / max(len(want), 1), 3),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
