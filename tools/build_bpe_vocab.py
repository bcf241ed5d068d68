"""Rebuild the shipped frozen BPE vocabulary
(``data/bpe_merges.tsv`` + ``data/bpe_vocab.tsv``) — the
tools/build_lang_profiles.py precedent: the shipped file is CONTRACT
DATA, regenerated offline by this script, never at query time.

Training corpus: the multilingual sample sentences already shipped
for language-ID profiling (``data/lang_samples.tsv`` — public
composed text across 29 languages) plus the synthetic benchmark
corpus's word list, so the vocabulary covers both real subword
structure ("th", "er", "tion", …) and every word the test tables
contain. Trained with operators/bpe.py's train_bpe (Sennrich et al.
2016) — the same learner the engine exposes — so the frozen merge
list is by construction creation-ordered, which is what makes
rank-greedy application equivalent to sequential passes.

Vocab ids: 0 = <unk>, then the sorted base characters of the
training words, then each merge's output token in rank order
(first-win on duplicates). Run from the repo root:

    python tools/build_bpe_vocab.py [n_merges]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cybersecurity_miw_spark.operators import bpe, tokenizer  # noqa: E402
from cybersecurity_miw_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    spark = get_spark()
    samples = spark.read.csv(
        os.path.join(
            REPO, "cybersecurity_miw_spark", "data", "lang_samples.tsv"
        ),
        sep="\t",
        schema="lang string, text string",
    ).select("text")
    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("text")
    )
    corpus = samples.unionByName(docs)
    merges = bpe.train_bpe(corpus, n_merges=n_merges, min_pair_count=2)

    # base alphabet: the characters of the training word vocabulary
    chars = sorted(
        {
            c
            for (w,) in bpe.word_vocab(corpus).select("w").collect()
            for c in w
        }
    )
    vocab: dict[str, int] = {tokenizer.UNK_TOKEN: tokenizer.UNK_ID}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    for x, y in merges:
        vocab.setdefault(x + y, len(vocab))

    data_dir = os.path.join(REPO, "cybersecurity_miw_spark", "data")
    mpath = os.path.join(data_dir, "bpe_merges.tsv")
    vpath = os.path.join(data_dir, "bpe_vocab.tsv")
    with open(mpath, "w", encoding="utf-8") as f:
        for i, (x, y) in enumerate(merges):
            f.write(f"{i}\t{x}\t{y}\n")
    with open(vpath, "w", encoding="utf-8") as f:
        for tok, i in sorted(vocab.items(), key=lambda kv: kv[1]):
            f.write(f"{i}\t{tok}\n")
    print(f"wrote {mpath}: {len(merges)} merges")
    print(f"wrote {vpath}: {len(vocab)} tokens")


if __name__ == "__main__":
    main()
