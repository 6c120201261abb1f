"""Self-check harness: mirrors the driver's oracle comparison.

Runs every catalog query on Spark and its DuckDB oracle on the same
parquet, then compares row count, column names/dtypes, and an
order-insensitive value hash (rows sorted after stringifying every cell
canonically). Any scheme the driver uses will agree if values are
bit-identical, which is what this enforces.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries, oracle_sql  # noqa: E402
from thread_based_map_reduce_spark.session import get_spark  # noqa: E402
from thread_based_map_reduce_spark.sources.registry import TABLE_NAMES  # noqa: E402


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(canon_cell(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x00")
    return h.hexdigest(), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name:28s} rows={len(spdf)} (rows-only: no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
        if len(spdf) != len(opdf):
            problems.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        if not problems:
            sh, srows = frame_fingerprint(spdf)
            oh, orows = frame_fingerprint(opdf)
            if sh != oh:
                diff_s = [r for r in srows if r not in set(orows)][:3]
                diff_o = [r for r in orows if r not in set(srows)][:3]
                problems.append(f"value hash; spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name:28s} {'; '.join(problems)}")
        else:
            # dtype note (informational): drivers may compare arrow schemas
            sd = {c: str(spdf[c].dtype) for c in spdf.columns}
            od = {c: str(opdf[c].dtype) for c in opdf.columns}
            dtw = {c: (sd[c], od[c]) for c in sd if sd[c] != od[c]}
            note = f" dtypes!={dtw}" if dtw else ""
            print(f"PASS  {name:28s} rows={len(spdf)} [{time.time()-t0:.1f}s]{note}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
