"""Prefix-store staleness measurement (VERDICT r9 #7 / r10 #5).

The incremental exact set-similarity store freezes a token-frequency
order at store-creation time; later batches are prefix-indexed under
that FROZEN order. Correctness never degrades (the prefix lemma holds
for any shared total order — golden:
tests/test_setsim.py::test_drifted_batch_still_exact_under_frozen_order),
but candidate VOLUME does when the live distribution drifts: tokens
unseen (or rare) at freeze time sort first (_df = 0), land in every
prefix, and — once they become COMMON — produce wide equi-join
buckets a fresh order would have pushed out of the prefixes entirely.

This harness plants exactly that failure mode and measures it:

* history = sf0.1 documents (even doc_id half), freq frozen on it;
* batches 1..N = slices of the odd half, each doc suffixed with the
  SAME "drift sentence" of tokens unseen at freeze time — the shared
  vocabulary is the point: after batch 1 appends to the store those
  tokens are live-common but frozen-rare (_df = 0 → they fill every
  later batch doc's prefix AND sit in the store's accumulated prefix
  rows), so every new doc equi-joins every prior drifted doc through
  the drift-token buckets — the staleness signature. A fresh order
  ranks them as common, pushes them out of the prefixes entirely,
  and the explosion disappears. (A first, wrong, version of this
  harness gave each batch a DISTINCT drift vocabulary: then the
  store never accumulates the stale tokens, batch prefixes are
  filled with store-missing tokens, and frozen order measures
  BETTER than fresh — ratio 0.69-0.79, preserved in git history —
  which is itself informative: staleness only bites when drifted
  tokens recur across batches.);
* per batch: candidates under the frozen store vs candidates under a
  fresh-order rebuild (token_freq_table over history-so-far + batch,
  store re-derived), true pairs for reference.

Output: one JSON line per batch + a summary. Remediation when the
ratio trips a threshold: rebuild the store offline under a fresh
order (sources.maintain.rewrite_table swap), exactly the ANN
quantizer-staleness contract (append_to_ivf_index docstring).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from cybersecurity_miw_spark.operators import setsim  # noqa: E402
from cybersecurity_miw_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 0.5
N_BATCHES = 4


def main() -> None:
    spark = get_spark("prefix-staleness")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    hist = docs.where(F.col("doc_id") % 2 == 0).persist()
    hist.count()

    freq_frozen = setsim.token_freq_table(hist).persist()
    freq_frozen.count()
    store_frozen = setsim.prefix_store(
        hist, freq_frozen, threshold=THRESHOLD
    ).persist()
    store_frozen.count()

    seen = hist
    results = []
    drift = " ".join(f"driftword{j}" for j in range(10))
    for i in range(1, N_BATCHES + 1):
        batch = (
            docs.where(
                (F.col("doc_id") % 2 == 1)
                & (F.col("doc_id") % (2 * N_BATCHES) == 2 * i - 1)
            )
            .withColumn("text", F.concat_ws(" ", F.col("text"), F.lit(drift)))
            .persist()
        )
        n_batch = batch.count()

        cand_frozen = setsim.incremental_ppjoin_candidates(
            batch, store_frozen, freq_frozen, threshold=THRESHOLD
        ).count()
        true_pairs = setsim.incremental_ppjoin_pairs(
            batch, seen, store_frozen, freq_frozen, threshold=THRESHOLD
        ).count()

        # fresh-order comparator: rebuild order AND store over
        # history-so-far + batch (what an offline rewrite would do)
        freq_fresh = setsim.token_freq_table(
            seen.unionByName(batch)
        ).persist()
        freq_fresh.count()
        store_fresh = setsim.prefix_store(
            seen, freq_fresh, threshold=THRESHOLD
        )
        cand_fresh = setsim.incremental_ppjoin_candidates(
            batch, store_fresh, freq_fresh, threshold=THRESHOLD
        ).count()
        freq_fresh.unpersist()

        row = {
            "batch": i,
            "batch_docs": n_batch,
            "history_docs": seen.count(),
            "cand_frozen_order": cand_frozen,
            "cand_fresh_order": cand_fresh,
            "staleness_ratio": round(cand_frozen / max(cand_fresh, 1), 2),
            "true_pairs": true_pairs,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

        # ingest: batch joins history under the frozen order
        store_frozen = store_frozen.unionByName(
            setsim.prefix_store(batch, freq_frozen, threshold=THRESHOLD)
        ).persist()
        store_frozen.count()
        seen = seen.unionByName(batch)

    worst = max(r["staleness_ratio"] for r in results)
    print(json.dumps({"summary": "prefix_staleness", "sf_dir": SF_DIR,
                      "threshold": THRESHOLD, "worst_ratio": worst}))
    spark.stop()


if __name__ == "__main__":
    main()
