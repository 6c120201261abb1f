"""The correctness gate as a pytest: every oracle-backed catalog query must
hash-match DuckDB at sf0.001 (the driver runs the same comparison at
sf0.01). One test per query so failures localize."""

from __future__ import annotations

import pytest

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries
from thread_based_map_reduce_spark.plans.oracle_check import compare_query, duck_connection

_QUERIES = queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    res = compare_query(spark, duck, name, _QUERIES[name], CATALOG[name].oracle, sf_dir)
    assert res.ok, res.problems
    if not res.oracle_checked:
        assert res.rows >= 0  # rows-only contract


def test_approx_distinct_accuracy(spark, sf_dir):
    # the rows-only HLL sketch query still has a testable contract:
    # approx_count_distinct within 5% of the exact count
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_accuracy(spark, sf_dir):
    # percentile_approx contract: within 2% relative of the exact median
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.median("l_extendedprice").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.02
