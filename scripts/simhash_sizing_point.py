#!/usr/bin/env python3
"""Measure the SimHash pigeonhole block-sizing rule (the lsh_sizing_point
companion): candidate volume and runtime of dedup_simhash_hamming_pairs
at 1×/10×/100× under the testdata default (4 blocks — one 15-bit block
per table) vs sized_simhash_blocks' Manku multi-table layout (m blocks,
C(m, m-k) tables, (m-k)*(60//m)-bit keys). Completeness is invariant
(pytest-proven equal pair sets); this script measures what the sizing
buys: candidates ~ tables * N²/2^key_bits.

Usage: python scripts/simhash_sizing_point.py [--with-100x]
"""

from __future__ import annotations

import json
import os
import sys
import time
from itertools import combinations

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FIXTURES = [
    ("1x", "/root/testdata/sf0.1", 5_000),
    ("10x", os.path.join(ROOT, ".scale10h"), 50_000),
]
FIXTURE_100X = ("100x", os.path.join(ROOT, ".scale100h"), 500_000)


def main() -> None:
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.operators.dedup import (
        SIMHASH64_BITS,
        SIMHASH64_HAM_K,
        _weighted_simhash,
        simhash_hamming_pairs_impl,
        sized_simhash_blocks,
    )
    from thread_based_map_reduce_spark.session import get_spark

    spark = get_spark("simhash_sizing_point")
    with_100x = "--with-100x" in sys.argv
    fixtures = FIXTURES + ([FIXTURE_100X] if with_100x else [])
    k = SIMHASH64_HAM_K
    for label, sf_dir, n_docs in fixtures:
        configs = [("default", k + 1)]
        sized_m = sized_simhash_blocks(n_docs)
        if sized_m != k + 1:
            configs.append(("sized", sized_m))
        # default at 100x schedules ~N^2/2^15 candidates (the measured
        # 6.1 GB wire point in BASELINE.md) — skip re-timing it there,
        # the sized layout is the point of the 100x row
        if label == "100x":
            configs = [c for c in configs if c[0] == "sized"]
        for sizing, m in configs:
            bits = SIMHASH64_BITS // m
            n_tables = len(list(combinations(range(m), m - k)))
            sims = _weighted_simhash(spark, sf_dir)
            # candidate count via the same bucket math (pre-verify volume)
            mask = (1 << bits) - 1

            def _key(combo):
                key = F.lit(0).cast("bigint")
                for pos, b in enumerate(combo):
                    key = key + (
                        F.shiftright(F.col("simhash"), b * bits)
                        .bitwiseAND(mask)
                        .cast("bigint")
                        * F.lit(1 << (pos * bits))
                    )
                return key

            structs = F.array(
                *[
                    F.struct(F.lit(t).alias("b"), _key(c).alias("v"))
                    for t, c in enumerate(
                        combinations(range(m), m - k)
                    )
                ]
            )
            occ = (
                sims.select(F.explode(structs).alias("blk"))
                .groupBy("blk.b", "blk.v")
                .count()
            )
            n_cand = occ.select(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
            ).first()["c"]
            t0 = time.time()
            n_pairs = simhash_hamming_pairs_impl(
                spark, sf_dir, n_blocks=m
            ).count()
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "fixture": label,
                        "sizing": sizing,
                        "n_docs": n_docs,
                        "n_blocks": m,
                        "n_tables": n_tables,
                        "key_bits": (m - k) * bits,
                        "bucket_candidates": int(n_cand or 0),
                        "verified_pairs": n_pairs,
                        "sec": round(dt, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
