"""Oracle comparison core: run a catalog query on Spark and its DuckDB
oracle on the same parquet, compare row count + column names + an
order-insensitive canonical value hash. Used by scripts/selfcheck.py (dev
loop) and tests/test_catalog_oracle.py (CI gate) — mirrors the driver's
CORRECTNESS check. Bit-identical values make any reasonable driver-side
hashing scheme agree."""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from ..sources.registry import TABLE_NAMES


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


def frame_rows(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    return sorted(
        "|".join(canon_cell(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    )


def frame_hash(rows: list[str]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x00")
    return h.hexdigest()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows: int = 0
    problems: list[str] = field(default_factory=list)
    oracle_checked: bool = True


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    oracle: str | None,
    sf_dir: str,
) -> CompareResult:
    spdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        return CompareResult(name, ok=len(spdf) >= 0, rows=len(spdf), oracle_checked=False)
    opdf = con.execute(oracle).df()
    problems: list[str] = []
    if sorted(spdf.columns) != sorted(opdf.columns):
        problems.append(f"columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
    elif len(spdf) != len(opdf):
        problems.append(f"rowcount {len(spdf)} vs {len(opdf)}")
    else:
        srows, orows = frame_rows(spdf), frame_rows(opdf)
        if frame_hash(srows) != frame_hash(orows):
            oset = set(orows)
            sset = set(srows)
            problems.append(
                "value hash; spark-only="
                + repr([r for r in srows if r not in oset][:3])
                + " oracle-only="
                + repr([r for r in orows if r not in sset][:3])
            )
    return CompareResult(name, ok=not problems, rows=len(spdf), problems=problems)
