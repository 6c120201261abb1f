"""Self-check harness: mirrors the driver's oracle comparison.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries  # noqa: E402
from thread_based_map_reduce_spark.plans.oracle_check import (  # noqa: E402
    compare_query,
    duck_connection,
)
from thread_based_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("selfcheck")
    con = duck_connection(sf_dir)

    failures = []
    for name, fn in queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, con, name, fn, CATALOG[name].oracle, sf_dir)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if not res.ok:
            failures.append(name)
            print(f"FAIL  {name:28s} {'; '.join(res.problems)}")
        elif not res.oracle_checked:
            print(f"ok?   {name:28s} rows={res.rows} (rows-only: no oracle) [{dt:.1f}s]")
        else:
            print(f"PASS  {name:28s} rows={res.rows} [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
