#!/usr/bin/env python3
"""Train the frozen BPE merge table (visigoth_spark/bpe_merges.txt).

Deterministic, offline: word frequencies come from the seeded synthetic
corpus (corpus.py, seed=42, 5k docs) tokenized with the harness analyzer
(lower + split on non-alphanumeric), trained with the classic BPE
algorithm (visigoth_spark/bpe.py). Run once; the output file is committed
so every consumer (Spark plan, DuckDB oracle, tests) shares one table.

Usage: python tools/train_bpe.py [n_merges] [n_docs]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visigoth_spark.bpe import MERGES_FILE, save_merges, train_bpe
from visigoth_spark.corpus import generate_corpus

SPLIT = re.compile(r"[^\W_]+", re.UNICODE)  # letter/number runs


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    corpus = generate_corpus(n_docs)
    freqs: Counter = Counter()
    for text in corpus["text"]:
        freqs.update(SPLIT.findall(text.lower()))
    merges = train_bpe(dict(freqs), n_merges)
    save_merges(merges)
    print(f"{len(merges)} merges from {len(freqs)} distinct words "
          f"({sum(freqs.values())} corpus tokens) -> {MERGES_FILE}")


if __name__ == "__main__":
    main()
