"""PPJoin suffix-filter decision measurement (VERDICT r9 #6 / r10 #5).

PPJoin's optional suffix filter (a per-candidate partial merge of the
two suffixes bounding the overlap tighter than the positional bound)
pays a per-candidate probe cost to prune candidates BEFORE the exact
verify. It is worth implementing only if the candidate set the
positional filter leaves behind is still ≫ the true pair set — the
verify stage's cost is candidate-bounded either way.

Measures, at base (sf0.1 documents) and the 10× rotated corpus
(bench_scale data, disjoint shingles across copies — the real 10×
workload): candidate count after prefix + size-ratio + positional
filters (the REAL ppjoin_candidates stage), true pairs, and the
candidates-per-true-pair ratio. Decision rule: ratio ≤ ~3 → the
verify stage does near-minimal work and a suffix filter cannot
meaningfully reduce end-to-end cost (record + close); ratio ≫ that →
implement the suffix filter.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cybersecurity_miw_spark.operators import setsim  # noqa: E402
from cybersecurity_miw_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".tmp/scale/sf1.0"),
)
THRESHOLD = 0.5


def main() -> None:
    spark = get_spark("ppjoin-filter-measure")
    spark.sparkContext.setLogLevel("ERROR")
    for tag, sf_dir in [("base", BASE), ("10x", SCALED)]:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        t0 = time.perf_counter()
        cands = setsim.ppjoin_candidates(docs, threshold=THRESHOLD).count()
        cand_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pairs = setsim.ppjoin_pairs(docs, threshold=THRESHOLD).count()
        full_s = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "corpus": tag, "docs": n_docs,
            "candidates_after_positional": cands,
            "true_pairs": pairs,
            "cand_per_true_pair": round(cands / max(pairs, 1), 2),
            "candidates_stage_s": cand_s,
            "full_join_s": full_s,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
