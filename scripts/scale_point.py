#!/usr/bin/env python3
"""Run the dedup/curation headline queries against the 10× fixture and
print per-query wall-clock alongside the same queries at sf0.1 — the
UPWARD scaling row for BASELINE.md (VERDICT r4 next-round #6).

Usage:
    python scripts/gen_scale_fixture.py          # once
    python scripts/scale_point.py                # prints the ratio table
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_blocked",
    "dedup_prefix_filter_pairs",
    "dup_span_fraction",
    "decontam_eval_overlap",
    "semantic_dedup_stats",
]


def time_query(fn, spark, sf_dir: str, reps: int = 3) -> tuple[float, int]:
    # Time with the NOOP SINK (optimization guide §1.4): it eagerly
    # computes every column of every row and discards the result. The
    # previous form — count(xxhash64(*cols)) — turned out to measure
    # NOTHING for map-only queries on Spark 4.1: xxhash64 is
    # non-nullable, so Catalyst folds count(h) to a row count and prunes
    # the scan to ReadSchema struct<> (verified r12: the probe plan reads
    # zero columns; a 500k-doc map-only query "measured" 0.86 s while its
    # noop materialization ran 600+ s). Shuffle/aggregate-bearing queries
    # still executed their exchanges, which is why the old numbers looked
    # plausible for the join families. Row count comes from ONE extra
    # count() AFTER the timed reps (cheap, pruned — that is fine for a
    # row count).
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    rows = fn(spark, sf_dir).count()
    return best, rows


def main() -> None:
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all
    from thread_based_map_reduce_spark.session import get_spark

    _load_all()
    spark = get_spark()
    # SCALE_FIXTURE_DIR picks the upward fixture (.scale10 constant-vocab,
    # .scale10h Heaps-vocab, .scale100h for the 100x point, ...);
    # SCALE_BASE_DIR overrides the 1x side.
    scale_dir = os.environ.get(
        "SCALE_FIXTURE_DIR", os.path.join(ROOT, ".scale10")
    )
    if not os.path.isabs(scale_dir):
        scale_dir = os.path.join(ROOT, scale_dir)
    base_dir = os.environ.get("SCALE_BASE_DIR", "/root/testdata/sf0.1")
    out = {}
    # any query names on argv override the default dedup/curation set
    # (the 10x fixture only carries documents + embeddings, so only
    # queries reading those two tables are timeable here)
    for name in (sys.argv[1:] or QUERIES):
        fn = CATALOG[name].fn
        t_base, r_base = time_query(fn, spark, base_dir)
        t_scale, r_scale = time_query(fn, spark, scale_dir)
        out[name] = {
            "sf0.1_sec": round(t_base, 3),
            "x10_sec": round(t_scale, 3),
            "ratio": round(t_scale / t_base, 2),
            "sf0.1_rows": r_base,
            "x10_rows": r_scale,
        }
        print(name, json.dumps(out[name]))
    print(json.dumps({"scale_point": out}))


if __name__ == "__main__":
    main()
