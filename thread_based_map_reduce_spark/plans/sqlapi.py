"""Ad-hoc SQL surface over the testdata tables.

The reference has no SQL layer at all (SURVEY §2: "no SQL, no optimizer");
here arbitrary ANSI SQL is a first-class entry point: register the tables
as temp views once, then ``spark.sql`` anything — Catalyst plans it with
the same pushdown/pruning/broadcast machinery the catalog queries get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import pin_session_defaults
from ..sources.registry import TABLE_NAMES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create (or replace) a temp view per testdata table; returns names."""
    pin_session_defaults(spark)
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLE_NAMES)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """One-shot: register views, run a SQL statement, return the DataFrame."""
    register_tables(spark, sf_dir)
    return spark.sql(sql)
