"""Ad-hoc SQL surface: arbitrary ANSI SQL over the registered views must
agree with DuckDB on the same statements (statements chosen to be valid
and deterministic in both dialects)."""

from __future__ import annotations

import pytest

from thread_based_map_reduce_spark.plans.oracle_check import (
    duck_connection,
    frame_hash,
    frame_rows,
)
from thread_based_map_reduce_spark.plans.sqlapi import run_sql

STATEMENTS = [
    # multi-join + agg + having
    """
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING count(*) > 3
    """,
    # correlated scalar subquery
    """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.9 FROM orders)
    """,
    # window + qualify-less top-1 per group via subquery
    """
    SELECT l_returnflag, CAST(max(l_orderkey) AS BIGINT) AS max_key,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
]


@pytest.mark.parametrize("i", range(len(STATEMENTS)))
def test_adhoc_sql_matches_duckdb(spark, sf_dir, i):
    sql = STATEMENTS[i]
    spdf = run_sql(spark, sf_dir, sql).toPandas()
    con = duck_connection(sf_dir)
    opdf = con.execute(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert frame_hash(frame_rows(spdf)) == frame_hash(frame_rows(opdf))
