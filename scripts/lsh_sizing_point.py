#!/usr/bin/env python3
"""Measure the LSH bits-per-band sizing rule (VERDICT r7 #1): candidate
fraction and runtime of the embedding-LSH family at 1×/10×/100× under
(a) the testdata default sizing (4 bits × 4 bands — recall-sized for
2,000 near-isotropic vectors) and (b) production sizing,
bits-per-band = max(4, ceil(log2(N / 125))) via
similarity.sized_lsh_params — the rule the operators' docstrings cite.

The claim under test: default sizing has candidate fraction ≈
bands × 2^-bits ≈ 23% of all pairs, so candidates grow ∝ N² and the 10×
point is super-linear (measured 12.9× in r7); sized buckets hold the
fraction ∝ 1/N so candidate VOLUME grows ∝ N and runtime returns to
at-or-below linear.

Usage:
    python scripts/lsh_sizing_point.py            # 1x + 10x (default & sized)
    python scripts/lsh_sizing_point.py --with-100x  # adds the 100x sized point
    (default sizing at 100x is deliberately not run: ~23% of 2e10 pairs
    would schedule ~10^4× the 1× candidate volume — the exact behavior
    the sizing rule exists to prevent.)

Prints one JSON line per (fixture, sizing) with N, n_planes, candidate
pairs, candidate fraction, and wall-clock for the candidate count, the
verified-pairs count (cosine ε=0.3, the DBSCAN neighbor graph), and the
full dbscan_lsh_clusters_impl assignment.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FIXTURES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", os.path.join(ROOT, ".scale10h")),
]
FIXTURE_100X = ("100x", os.path.join(ROOT, ".scale100h"))

DBSCAN_EPS = 0.3


def main() -> None:
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.operators.similarity import (
        N_LSH_BANDS,
        N_PLANES,
        dbscan_lsh_clusters_impl,
        embedding_lsh_candidates,
        embedding_lsh_pairs,
        sized_lsh_params,
    )
    from thread_based_map_reduce_spark.session import get_spark
    from thread_based_map_reduce_spark.sources.registry import load_table

    with_100x = "--with-100x" in sys.argv
    fixtures = FIXTURES + ([FIXTURE_100X] if with_100x else [])
    spark = get_spark()

    for label, sf_dir in fixtures:
        n_vecs = load_table(spark, sf_dir, "embeddings").count()
        all_pairs = n_vecs * (n_vecs - 1) // 2
        sizings = [("default", N_PLANES, N_LSH_BANDS)]
        sized_planes, sized_bands = sized_lsh_params(n_vecs)
        if (sized_planes, sized_bands) != (N_PLANES, N_LSH_BANDS):
            sizings.append(("sized", sized_planes, sized_bands))
        if label == "100x":
            sizings = [s for s in sizings if s[0] == "sized"]
        for sizing, n_planes, n_bands in sizings:
            kw = {} if sizing == "default" else {"n_planes": n_planes, "n_bands": n_bands}
            t0 = time.perf_counter()
            n_cand = embedding_lsh_candidates(spark, sf_dir, **kw).count()
            t_cand = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_verified = embedding_lsh_pairs(spark, sf_dir, DBSCAN_EPS, **kw).count()
            t_pairs = time.perf_counter() - t0
            t0 = time.perf_counter()
            df = dbscan_lsh_clusters_impl(spark, sf_dir, **kw)
            h = F.xxhash64(*df.columns)
            agg = df.agg(F.count(F.lit(1)).alias("n"), F.count(h).alias("h")).collect()[0]
            t_dbscan = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "fixture": label,
                        "sizing": sizing,
                        "n_vecs": n_vecs,
                        "n_planes": n_planes,
                        "bits_per_band": n_planes // n_bands,
                        "n_bands": n_bands,
                        "candidates": n_cand,
                        "cand_fraction": round(n_cand / all_pairs, 6),
                        "verified_pairs_eps03": n_verified,
                        "dbscan_rows": agg["n"],
                        "sec_candidates": round(t_cand, 2),
                        "sec_verified_pairs": round(t_pairs, 2),
                        "sec_dbscan": round(t_dbscan, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
