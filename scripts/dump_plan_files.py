"""Dump .explain("formatted") output per query to plans/<round>/<name>_<tag>.txt.

The optimization-round evidence artifact (judge checks plan claims against
these files): one file per (query, before|after) pair, AQE-finalized by
materializing the query with the noop sink first.

Usage: python scripts/dump_plan_files.py <round> <tag> <query> [query ...]
       python scripts/dump_plan_files.py r12 before gopher_repetition_rules
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thread_based_map_reduce_spark.plans.catalog import queries
from thread_based_map_reduce_spark.session import get_spark


def main() -> int:
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan-files")
    allq = queries()
    for name in names:
        df = allq[name](spark, sf_dir)
        # Execute the Dataset's OWN QueryExecution so its AQE plan finalizes
        # (a noop write is a separate QueryExecution and leaves df.explain
        # showing isFinalPlan=false). Catalog results are small at sf0.01.
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — {tag} ({sf_dir}, AQE final plan)\n\n"
                + buf.getvalue().strip()
                + "\n"
            )
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
