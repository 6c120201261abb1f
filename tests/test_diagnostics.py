"""Invariant tests for the diagnostics family (operators/diagnostics.py),
checked against an independent pure-Python reference (not the DuckDB
oracle, which shares the SQL formulation)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.diagnostics import (
    ROW_OVERHEAD_BYTES,
    TARGET_FILE_BYTES,
    q_compaction_plan_stats,
    q_key_skew_report,
)
from thread_based_map_reduce_spark.sources.registry import load_table


def test_key_skew_report_matches_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cnts = sorted(
        r.c for r in ev.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    )
    n = len(cnts)
    r = q_key_skew_report(spark, sf_dir).collect()[0]
    assert r.n_keys == n
    assert r.total_rows == sum(cnts)
    assert r.max_cnt == cnts[-1]
    # discrete quantile: smallest frequency whose cumulative key count
    # reaches ceil(q * n) — position ceil(q*n) in the sorted list
    assert r.p50_cnt == cnts[math.ceil(0.5 * n) - 1]
    assert r.p99_cnt == cnts[math.ceil(0.99 * n) - 1]
    mean = sum(cnts) / n
    var = sum(c * c for c in cnts) / n - mean * mean
    assert abs(r.cv - math.sqrt(var) / mean) < 1e-6
    assert abs(r.top1_share - cnts[-1] / sum(cnts)) < 1e-6
    assert r.skew_ratio >= 1.0


def test_compaction_plan_accounts_for_every_row(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    rows = q_compaction_plan_stats(spark, sf_dir).collect()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert r.target_files >= 1
        assert r.undersized == (r.est_bytes < TARGET_FILE_BYTES)
        # file count is exactly ceil(bytes / budget)
        assert r.target_files == -(-r.est_bytes // TARGET_FILE_BYTES)
        assert r.est_bytes >= r.n_rows * ROW_OVERHEAD_BYTES
