#!/usr/bin/env python3
"""ANN recall/latency at scale (VERDICT r7 #3): for each fixture, measure
per-method top-3 recall against exact brute-force ground truth AND the
method's wall-clock — the (recall, latency) pair a 100 TB deployment
tunes buckets / probes / shortlists by. Methods:

- bruteforce        — exact cosine scan (ground truth; its latency is the
                      cost ANN must beat)
- lsh_bucketed      — sign-LSH at the catalog default sizing (4 bits × 4)
- lsh_multiprobe    — + hamming-1 probes
- lsh_sized         — sign-LSH at sized_lsh_params(N) bits-per-band (the
                      production sizing lsh_sizing_point.py measures the
                      runtime collapse of; this script prices its recall)
- lsh_sized_probe   — sized + hamming-1 multi-probe (recall recovery at
                      sized bucket occupancy)
- ivf_nprobe1 / 2   — IVF with 1 or 2 probed cells
- pq_adc_rerank     — PQ compressed scan + exact rerank of a 10-shortlist

Usage: python scripts/ann_recall_point.py [--with-100x]
Prints one JSON line per (fixture, method).
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


def main() -> None:
    from pyspark.sql import Window as W, functions as F

    from thread_based_map_reduce_spark.functions.vectors import cosine_similarity
    from thread_based_map_reduce_spark.operators.similarity import (
        N_QUERIES,
        _lsh_topk,
        q_ann_bruteforce_topk,
        q_ivf_search,
        q_ivf_search_nprobe2,
        q_pq_adc_rerank_topk,
        sized_lsh_params,
    )
    from thread_based_map_reduce_spark.session import get_spark
    from thread_based_map_reduce_spark.sources.registry import load_table

    with_100x = "--with-100x" in sys.argv
    fixtures = FIXTURES + ([FIXTURE_100X] if with_100x else [])
    spark = get_spark()

    for label, sf_dir in fixtures:
        emb = load_table(spark, sf_dir, "embeddings")
        n_vecs = emb.count()
        sized_planes, sized_bands = sized_lsh_params(n_vecs)

        # exact ground truth (top-3 per query), collected once per fixture
        t0 = time.perf_counter()
        bf_rows = (
            q_ann_bruteforce_topk(spark, sf_dir)
            .where(F.col("rnk") <= 3)
            .select("qid", "vec_id")
            .collect()
        )
        t_bf = time.perf_counter() - t0
        truth = {(r["qid"], r["vec_id"]) for r in bf_rows}
        denom = N_QUERIES * 3

        def run(name, fn):
            t0 = time.perf_counter()
            rows = fn().select("qid", "vec_id").collect()
            sec = time.perf_counter() - t0
            hits = sum((r["qid"], r["vec_id"]) in truth for r in rows)
            print(
                json.dumps(
                    {
                        "fixture": label,
                        "n_vecs": n_vecs,
                        "method": name,
                        "recall_at_3": round(hits / denom, 4),
                        "hits": hits,
                        "sec": round(sec, 2),
                    }
                ),
                flush=True,
            )

        print(
            json.dumps(
                {"fixture": label, "n_vecs": n_vecs, "method": "bruteforce",
                 "recall_at_3": 1.0, "hits": denom, "sec": round(t_bf, 2)}
            ),
            flush=True,
        )
        run("lsh_bucketed", lambda: _lsh_topk(spark, sf_dir, multiprobe=False))
        run("lsh_multiprobe", lambda: _lsh_topk(spark, sf_dir, multiprobe=True))
        if (sized_planes, sized_bands) != (16, 4):
            run(
                f"lsh_sized_{sized_planes // sized_bands}bit",
                lambda: _lsh_topk(
                    spark, sf_dir, multiprobe=False,
                    n_planes=sized_planes, n_bands=sized_bands,
                ),
            )
            run(
                f"lsh_sized_{sized_planes // sized_bands}bit_probe",
                lambda: _lsh_topk(
                    spark, sf_dir, multiprobe=True,
                    n_planes=sized_planes, n_bands=sized_bands,
                ),
            )
        run("ivf_nprobe1", lambda: q_ivf_search(spark, sf_dir))
        run("ivf_nprobe2", lambda: q_ivf_search_nprobe2(spark, sf_dir))
        run("pq_adc_rerank", lambda: q_pq_adc_rerank_topk(spark, sf_dir))


if __name__ == "__main__":
    main()
