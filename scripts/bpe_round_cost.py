#!/usr/bin/env python3
"""Measure the sequential driver-round cost of BPE training (VERDICT r8 #7).

BPE_ROUNDS=3 in the catalog is a demo depth; real tokenizers run
thousands of merges. In this engine's aggregate-first design each merge
round is inherently SEQUENTIAL (round r's pair counts depend on round
r-1's merge) and runs entirely on the Heaps-law distinct-word table —
the corpus is touched exactly once, up front. The cost model for a real
1k-4k-merge training run is therefore:

    total ≈ corpus_pass + n_rounds × s_per_round(|word table|)

This script measures s_per_round at 1×/10×/100× (Heaps --vocab-growth
fixtures, so the word table grows ∝ sqrt(corpus) like a real corpus) by
differencing two depths: per_round = (t(DEEP) - t(BASE)) / (DEEP - BASE),
which cancels the shared corpus pass and session warmup. Each round
materializes via reliable_checkpoint, so the loop wall-clock is the real
per-round cost (argmax over the pair table + map-side replace +
checkpoint write).

Usage: python scripts/bpe_round_cost.py [--with-100x]
Prints one JSON line per fixture.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE, DEEP = 2, 12

FIXTURES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", os.path.join(ROOT, ".scale10h")),
]
FIXTURE_100X = ("100x", os.path.join(ROOT, ".scale100h"))


def main() -> None:
    from thread_based_map_reduce_spark.operators.text import _bpe_train
    from thread_based_map_reduce_spark.session import get_spark

    fixtures = FIXTURES + (
        [FIXTURE_100X] if "--with-100x" in sys.argv else []
    )
    spark = get_spark()

    for label, sf_dir in fixtures:
        def timed(n_rounds: int) -> tuple[float, int]:
            t0 = time.perf_counter()
            words, _ = _bpe_train(spark, sf_dir, n_rounds=n_rounds)
            n_words = words.count()
            return time.perf_counter() - t0, n_words

        timed(1)  # warm the scan/session for this fixture
        t_base, n_words = timed(BASE)
        t_deep, _ = timed(DEEP)
        per_round = (t_deep - t_base) / (DEEP - BASE)
        print(
            json.dumps(
                {
                    "fixture": label,
                    "word_table_rows": n_words,
                    "t_base_sec": round(t_base, 2),
                    "t_deep_sec": round(t_deep, 2),
                    "rounds": [BASE, DEEP],
                    "sec_per_round": round(per_round, 3),
                    "extrapolated_1k_rounds_sec": round(per_round * 1000, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
