#!/usr/bin/env python3
"""Three-point (1×/10×/100×) scaling curve for the 100 TB champion
operators (VERDICT r5 next-round #6).

The 1× point is the driver's sf0.1 documents/embeddings (5,000 docs —
which is also the Heaps-vocab anchor: vocab(5000) = 31); the 10×/100×
points are the seed-deterministic Heaps-law fixtures:

    python scripts/gen_scale_fixture.py 50000  --vocab-growth
    python scripts/gen_scale_fixture.py 500000 --vocab-growth --out .scale100h
    python scripts/scale_curve.py [query ...]

Default queries are the two operators the 100 TB story leans on hardest:
`dedup_minhash_lsh_pairs` (text near-dup at scale) and `ann_lsh_bucketed`
(similarity search at scale). Timing forces full evaluation (see
scale_point.time_query) — column pruning cannot skip output expressions.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from scale_point import time_query  # noqa: E402  (same forced-eval timer)

POINTS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", os.path.join(ROOT, ".scale10h")),
    ("100x", os.path.join(ROOT, ".scale100h")),
]
CHAMPIONS = ["dedup_minhash_lsh_pairs", "ann_lsh_bucketed"]


def main() -> None:
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all
    from thread_based_map_reduce_spark.session import get_spark

    _load_all()
    spark = get_spark()
    out = {}
    for name in (sys.argv[1:] or CHAMPIONS):
        fn = CATALOG[name].fn
        curve = {}
        prev_t = None
        for label, d in POINTS:
            t, rows = time_query(fn, spark, d)
            curve[label] = {"sec": round(t, 3), "rows": rows}
            if prev_t is not None:
                curve[label]["step_ratio"] = round(t / prev_t, 2)
            prev_t = t
        out[name] = curve
        print(name, json.dumps(curve))
    print(json.dumps({"scale_curve": out}))


if __name__ == "__main__":
    main()
