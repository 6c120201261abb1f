"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`thread_based_map_reduce_spark.plans.catalog` — the
single registry of named queries (Spark builder + DuckDB oracle per
operator; see SURVEY.md §2). The driver's verify runs ``entry(spark)`` as a
smoke check, runs each ``queries()[name]`` at sf=0.01 and compares it
against the matching ``oracle_sql()[name]`` via DuckDB (row-count + schema
+ order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thread_based_map_reduce_spark.plans import catalog as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's char-frequency sample,
    SampleClient.cpp:34-65, generalized to documents.text) on sf0.001."""
    return _catalog.queries()["charcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    return _catalog.oracle_sql()
