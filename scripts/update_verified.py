#!/usr/bin/env python3
"""Regenerate plans/catalog.py's DRIVER_VERIFIED constant.

Run manually once per round, after a new CORRECTNESS_r*.json lands:

    python scripts/update_verified.py

Prints the new frozenset body (names with a hash-green row, or a declared
rows-only row whose weaker check ran) for pasting into catalog.py. Kept as
a developer tool rather than runtime behavior on purpose: catalog order
must be a pure function of committed source, never of result files present
in a particular checkout (ADVICE r2).
"""

from __future__ import annotations

import glob
import json
import os
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verified_names() -> set[str]:
    green: set[str] = set()
    rows_only: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                green.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                rows_only.add(name)
    # A rows-only row only counts while the query still HAS no oracle: a
    # query that later gains one (ivf_kmeans_assignments in r4,
    # approx_aggregates in r5) must re-enter the window to earn a real
    # hash-green row instead of staying parked on the weak check.
    import sys

    sys.path.insert(0, ROOT)
    from thread_based_map_reduce_spark.plans import catalog as _catalog

    _catalog._load_all()
    for name in rows_only - green:
        q = _catalog.CATALOG.get(name)
        if q is not None and q.oracle is None:
            green.add(name)
    return green


if __name__ == "__main__":
    names = sorted(verified_names())
    body = ", ".join(f'"{n}"' for n in names)
    print(f"# {len(names)} driver-verified names")
    print("DRIVER_VERIFIED: frozenset[str] = frozenset({")
    print(textwrap.fill(body, width=76, initial_indent="    ", subsequent_indent="    "))
    print("})")
