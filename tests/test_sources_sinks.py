"""Source/sink coverage: format round-trips, partitioned writes with
partition pruning, the in-memory source (the reference's InputVec, R1),
and scan-level pushdown (PushedFilters / pruned ReadSchema)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.sources.registry import (
    from_rows,
    load_table,
    read_source,
    write_sink,
)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_roundtrip_formats(spark, sf_dir):
    src = load_table(spark, sf_dir, "nation")
    want = _sorted_rows(src, src.columns)
    for fmt in ("parquet", "csv", "json", "orc"):
        out = tempfile.mkdtemp(prefix=f"tbmr-sink-{fmt}-")
        write_sink(src, out, fmt=fmt)
        back = read_source(spark, out, fmt=fmt, schema=src.schema)
        assert _sorted_rows(back, src.columns) == want, fmt


def test_partitioned_write_prunes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = tempfile.mkdtemp(prefix="tbmr-part-")
    write_sink(li, out, partition_by=["l_returnflag"])
    back = read_source(spark, out).where(F.col("l_returnflag") == "R")
    plan = back.explain_string if hasattr(back, "explain_string") else None
    formatted = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in formatted and "l_returnflag" in formatted
    want = li.where(F.col("l_returnflag") == "R").count()
    assert back.count() == want > 0


def test_in_memory_source(spark):
    df = from_rows(spark, [(1, "a"), (2, "b")], schema="k long, v string")
    assert _sorted_rows(df, ["k", "v"]) == [(1, "a"), (2, "b")]


def test_scan_pushdown_and_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    formatted = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # predicate reaches the scan; scan reads only the two needed columns
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in formatted
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in formatted


def test_observe_metrics_during_action(spark, sf_dir):
    # df.observe: accumulate metrics inside the action, no second scan
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("lineitem-metrics")
    li = load_table(spark, sf_dir, "lineitem").observe(
        obs, F.count(F.lit(1)).alias("rows"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    n = li.count()
    got = obs.get
    assert got["rows"] == n > 0
    want = load_table(spark, sf_dir, "lineitem").agg(
        F.round(F.sum("l_quantity"), 2)
    ).first()[0]
    assert got["qty"] == want


def test_parquet_schema_evolution_mergeschema(spark, tmp_path_factory):
    """Schema evolution on the parquet source: a later batch adds a column;
    mergeSchema unions the schemas, old rows surface NULL for the new
    column — the append-only ingest pattern a 100 TB landing table needs."""
    import os

    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.sources.registry import read_source, write_sink

    root = str(tmp_path_factory.mktemp("evolve"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    v2 = spark.createDataFrame([(3, "c", 30.0)], "id long, s string, score double")
    write_sink(v1, os.path.join(root, "batch=1"))
    write_sink(v2, os.path.join(root, "batch=2"))

    merged = read_source(spark, root, "parquet", mergeSchema="true", recursiveFileLookup="true")
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[3].score == 30.0
    assert merged.count() == 3
    # and the evolved column is filterable with pushdown intact
    assert merged.where(F.col("score") > 10).count() == 1
