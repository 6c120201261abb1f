"""Partition pruning on hive-style partitioned writes (SCALE.md §1/§4).

At 100 TB the difference between scanning one partition and scanning the
table is the whole game: static pruning must show up for literal
predicates on the partition column, and dynamic partition pruning (DPP)
must inject the runtime filter when the predicate only arrives via a
join to a filtered dimension.
"""

from __future__ import annotations

import contextlib
import io
import tempfile

import pytest
from pyspark.sql import functions as F

from thread_based_map_reduce_spark.sources.registry import load_table, write_sink


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="tbmr-part-")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_sink(li, base, fmt="parquet", partition_by=["l_returnflag"])
    return base


def _plan(df) -> str:
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_static_partition_pruning(spark, sf_dir, part_dir):
    df = (
        spark.read.parquet(part_dir)
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan
    # attribute ids make the filter print as "(l_returnflag#15 = R)"
    import re

    assert re.search(r"l_returnflag#\d+ = R", plan), "literal partition filter not pushed"
    want = (
        load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").count()
    )
    assert df.count() == want > 0


def test_dynamic_partition_pruning(spark, sf_dir, part_dir):
    fact = spark.read.parquet(part_dir)
    dim = spark.createDataFrame([("R", "returned")], "flag string, label string").where(
        F.col("label") == "returned"
    )
    joined = fact.join(dim, fact["l_returnflag"] == dim["flag"]).select(
        "l_orderkey", "label"
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), "DPP filter not injected into the scan"
    want = (
        load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").count()
    )
    assert joined.count() == want > 0
