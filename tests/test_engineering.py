"""Invariant tests for the engineering operators (operators/engineering.py):
contracts the DuckDB hash gate cannot express — one-sided sketch error,
Bloom completeness, incremental-vs-full equivalence recomputed
independently, and assignment exhaustiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.engineering import (
    BLOOM_K,
    BLOOM_M,
    CM_TOPN,
    q_ab_test_zstat,
    q_bloom_filter_join_stats,
    q_countmin_topk_estimate,
    q_mv_incremental_refresh,
)
from thread_based_map_reduce_spark.sources.registry import load_table


def test_countmin_never_undercounts(spark, sf_dir):
    rows = q_countmin_topk_estimate(spark, sf_dir).collect()
    assert len(rows) == CM_TOPN
    for r in rows:
        # CM's defining guarantee: estimates only ever overcount.
        assert r.cm_est >= r.true_n
        assert r.overcount == r.cm_est - r.true_n


def test_bloom_no_false_negatives(spark, sf_dir):
    row = q_bloom_filter_join_stats(spark, sf_dir).first()
    # Bloom filters never reject a true member...
    assert row.n_pass >= row.n_true_members
    assert row.n_false_pos == row.n_pass - row.n_true_members
    # ...and the bit array can't hold more set bits than insertions made.
    assert 0 < row.n_bits_set <= min(BLOOM_M, BLOOM_K * row.n_build_keys)
    if row.fpr_measured is not None:
        assert 0.0 <= row.fpr_measured <= 1.0


def test_mv_refresh_equals_full_recompute(spark, sf_dir):
    # Independent full recompute in Spark (the oracle does it in DuckDB).
    got = {
        r.month: (r.n_orders, r.total_price)
        for r in q_mv_incremental_refresh(spark, sf_dir).collect()
    }
    full = {
        r.month: (r.n, float(round(r.s, 4)))
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("s"),
        )
        .collect()
    }
    assert got == full


def test_ab_assignment_partitions_users(spark, sf_dir):
    row = q_ab_test_zstat(spark, sf_dir).first()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # Hash-parity assignment is exhaustive and disjoint.
    assert row.n_a + row.n_b == n_users
    assert 0 <= row.conv_a <= row.n_a and 0 <= row.conv_b <= row.n_b


def test_cdc_merge_accounting(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.engineering import (
        q_cdc_merge_apply,
    )

    row = q_cdc_merge_apply(spark, sf_dir).first()
    # MERGE bookkeeping must balance exactly.
    assert row.n_final == row.n_base - row.n_deleted + row.n_inserted
    assert row.n_updated + row.n_inserted + row.n_deleted <= row.n_changelog
    assert row.content_checksum is not None and row.content_checksum > 0


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """HLL standard error is 1.04/sqrt(m); assert the estimate lands within
    5 sigma of truth (a deterministic check — the sketch has no RNG), and
    that the integer register sum is consistent with the reported zeros."""
    from thread_based_map_reduce_spark.operators.engineering import (
        HLL_M,
        _HLL_POW2K,
        q_hll_distinct_estimate,
    )

    row = q_hll_distinct_estimate(spark, sf_dir).collect()[0]
    sigma = 1.04 / (HLL_M ** 0.5)
    assert row.m == HLL_M
    assert abs(row.hll_estimate - row.true_distinct) <= 5 * sigma * row.true_distinct
    # every register contributes at least 2^1 (a present bucket has rho>=1
    # => term <= 2^52) and zeros contribute exactly 2^53 each
    assert row.register_sum >= row.n_zero_buckets * _HLL_POW2K
    assert row.register_sum <= HLL_M * _HLL_POW2K


def test_hll_registers_merge_exactly(spark, sf_dir):
    """Mergeability is WHY HLL is the 100 TB distinct-count structure:
    registers built on two disjoint halves of the data, merged with a
    per-bucket max, must equal the registers built over the whole input —
    hence an identical estimate. Exercised here at the DataFrame level."""
    from thread_based_map_reduce_spark.functions.hashing import portable_hash64
    from thread_based_map_reduce_spark.operators.engineering import (
        HLL_M,
        _hll_rho_col,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    h = portable_hash64(F.col("l_orderkey").cast("string"))

    def regs(df):
        return (
            df.select(h.alias("h"))
            .distinct()
            .select(
                (F.col("h") % HLL_M).alias("bucket"),
                _hll_rho_col(F.expr("shiftright(h, 8)")).alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("m_j"))
        )

    whole = {r.bucket: r.m_j for r in regs(li).collect()}
    half_a = regs(li.where(F.col("l_linenumber") % 2 == 0))
    half_b = regs(li.where(F.col("l_linenumber") % 2 != 0))
    merged_df = (
        half_a.unionAll(half_b).groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    )
    merged = {r.bucket: r.m_j for r in merged_df.collect()}
    assert merged == whole
