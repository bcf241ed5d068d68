"""semantic_dedup_cells blocking recall (r14, VERDICT r12 #3 / r13
#5): k-means-cells blocking assigns ONE cell per vector, so a planted
near-dup pair is found iff both members land in the same cell —
boundary pairs (members straddling a cell face) are the miss channel,
the cells-path analog of the hyperplane family's (1 - theta/pi)^p
decay. This harness measures that loss on the same planted-pair
design as tools/measure_semantic_recall.py (2k base unit vectors +
one planted near-dup each at cos ~0.95 / ~0.85), across cell counts
and with multi-assign (each vector in its n_assign nearest cells —
the IVF n_probes idea on the index side). Prints one JSON line per
(n_cells, n_assign, cos-band)."""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from cybersecurity_miw_spark.operators import similarity  # noqa: E402
from cybersecurity_miw_spark.session import get_spark  # noqa: E402

DIM = 64
N_BASE = 2_000
SEED = 7


def main() -> None:
    spark = get_spark("r14-cells-recall")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.RandomState(SEED)
    base = rng.randn(N_BASE, DIM)
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    def rotate(v, angle, rng):
        d = rng.randn(DIM)
        d -= d.dot(v) * v
        d /= np.linalg.norm(d)
        return math.cos(angle) * v + math.sin(angle) * d

    rows = []
    planted = {}
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

    for n_cells in (16, 64, 128, 256):
        cents = similarity.train_centroids(df, n_cells, DIM, iters=3)
        for n_assign in (1, 2, 3):
            pairs = similarity.cells_near_dup_pairs(
                df, cents, threshold=0.8, n_assign=n_assign
            )
            found = {
                (r["id_a"], r["id_b"]) for r in pairs.collect()
            }
            for lo, hi, tag in (
                (0.94, 1.01, "cos~0.95"), (0.84, 0.90, "cos~0.85")
            ):
                want = {p for p, c in planted.items() if lo <= c < hi}
                got = want & found
                print(json.dumps({
                    "n_cells": n_cells, "n_assign": n_assign,
                    "band": tag, "planted": len(want),
                    "recalled": len(got),
                    "recall": round(len(got) / max(len(want), 1), 3),
                }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
