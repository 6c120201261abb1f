"""Cross-engine parity of the PPJoin prefix index (ADVICE r4 medium).

The round-4 oracle computed the prefix length with DuckDB float division
plus a half-to-even CAST, yielding a prefix one element SHORTER than
Spark's truncating cast for every set size n ≡ 2 (mod 4) — a divergence
the pair-level hash gate only catches when a qualifying pair's sole
shared prefix element sits exactly on the boundary position. These tests
pin the fix at the two levels where it can regress:

1. the prefix-length FORMULA, for every n in 1..200, across DuckDB
   integer division, Spark's cast, and Python floor — and a proof that
   the old float formula really does diverge on the n ≡ 2 (mod 4) class;
2. the full prefix ROW SET (doc_id, n, h) on real test data, Spark's
   `_ppjoin_prefix_index` vs the oracle's `pref` CTE, with an assertion
   that the data actually exercises the regression class.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.dedup import (
    _PPJ_ENC,
    _HASHED_SQL,
    _SHINGLES_SQL,
    _ppjoin_prefix_index,
)
from thread_based_map_reduce_spark.plans.oracle_check import duck_connection


def test_prefix_length_formula_three_ways(spark):
    ns = list(range(1, 201))
    py = {n: n - (n + 1) // 2 + 1 for n in ns}

    con = duckdb.connect()
    duck = dict(
        con.execute(
            "SELECT n, n - (n + 1) // 2 + 1 FROM unnest(range(1, 201)) t(n)"
        ).fetchall()
    )

    sdf = spark.range(1, 201).select(
        F.col("id").alias("n"),
        (F.col("id") - ((F.col("id") + 1) / 2).cast("bigint") + 1).alias("plen"),
    )
    got_spark = {r.n: r.plen for r in sdf.collect()}

    for n in ns:
        assert py[n] == duck[n] == got_spark[n] == n // 2 + 1, n


def test_old_float_formula_diverges_on_mod4_class():
    # documents WHY the integer rewrite was needed: DuckDB `/` + CAST
    # rounds half-to-even, shortening the prefix for every n ≡ 2 (mod 4)
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT n,
               n - CAST((n + 1) / 2 AS BIGINT) + 1 AS old_plen,
               n - (n + 1) // 2 + 1 AS new_plen
        FROM unnest(range(1, 201)) t(n)
        """
    ).fetchall()
    for n, old_plen, new_plen in rows:
        assert new_plen == n // 2 + 1
        if n % 4 == 2:
            assert old_plen == new_plen - 1, n  # the bug class
        else:
            assert old_plen == new_plen, n


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_prefix_rowset_parity(spark, sf_dir, duck):
    _, pref = _ppjoin_prefix_index(spark, sf_dir)
    got_spark = {
        (r.doc_id, r.n, r.h) for r in pref.select("doc_id", "n", "h").collect()
    }

    got_duck = set(
        duck.execute(
            f"""
            WITH {_SHINGLES_SQL.strip()},
            {_HASHED_SQL.strip()},
            dsh AS (SELECT DISTINCT doc_id, h FROM hashed),
            sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
            dfreq AS (SELECT h, count(*) AS df FROM dsh GROUP BY 1),
            ordered AS (
                SELECT d.doc_id, s.n,
                       list_sort(list(f.df * {_PPJ_ENC} + d.h)) AS arr
                FROM dsh d
                JOIN dfreq f ON f.h = d.h
                JOIN sizes s ON s.doc_id = d.doc_id
                GROUP BY 1, 2
            ),
            pref AS (
                SELECT doc_id, n,
                       unnest(arr[1:CAST(n - (n + 1) // 2 + 1
                                         AS BIGINT)]) % {_PPJ_ENC} AS h
                FROM ordered
            )
            SELECT CAST(doc_id AS BIGINT), CAST(n AS BIGINT),
                   CAST(h AS BIGINT)
            FROM pref
            """
        ).fetchall()
    )

    # the fixture must actually exercise the n ≡ 2 (mod 4) regression
    # class, or this parity check proves nothing about the bug
    assert any(n % 4 == 2 for _, n, _ in got_spark), (
        "test data has no doc with n ≡ 2 (mod 4) shingles — "
        "prefix-length regression class not exercised"
    )
    assert got_spark == got_duck
