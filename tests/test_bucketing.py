"""Bucketed co-located join: the 100 TB fact-fact join path (SCALE.md §2).

Writing both join sides bucketed (and sorted) on the join key lets the
sort-merge join read matching buckets directly — the physical plan has NO
Exchange, which at scale deletes the single most expensive stage of a
fact-fact join.
"""

from __future__ import annotations

import contextlib
import io
import tempfile

import pytest

from thread_based_map_reduce_spark.sources.registry import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="tbmr-bucketed-")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    (
        o.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{base}/orders_b")
        .saveAsTable("tbmr_orders_b")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{base}/lineitem_b")
        .saveAsTable("tbmr_lineitem_b")
    )
    yield "tbmr_orders_b", "tbmr_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS tbmr_orders_b")
    spark.sql("DROP TABLE IF EXISTS tbmr_lineitem_b")


def _executed_plan(df) -> str:
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    # force SMJ so the test asserts the bucketing property, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(lt), spark.table(ot)["o_orderkey"] == spark.table(lt)["l_orderkey"]
        )
        plan = _executed_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffles"

    # and it returns the same rows as the plain parquet join
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    assert joined.count() == want > 0


def test_bucket_pruning_on_key_equality(spark, sf_dir, bucketed_tables):
    # an equality predicate on the bucketing key scans ONE bucket of eight
    # (SelectedBucketsCount) — the bucketing analog of partition pruning.
    # autoBucketedScan disables bucketed reading when no operator needs the
    # distribution (a bare filter), so pin it on for this plan.
    from pyspark.sql import functions as F

    ot, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(ot).where(F.col("o_orderkey") == 42)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "no bucket pruning in scan"
    assert int(m.group(1)) == 1 and int(m.group(2)) == N_BUCKETS
