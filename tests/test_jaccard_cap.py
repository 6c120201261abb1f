"""Hot-block cap for the bounded-quadratic Jaccard fallback.

VERDICT r1 §wrong #3: one hot block (e.g. empty-ish texts sharing a
blocking key) at 100 TB is a straggler doing O(n²) work — blocks over
``max_block`` docs must be dropped WITH a logged count (no silent caps),
and the DuckDB oracle must implement the same rule.
"""

from __future__ import annotations

import logging

import duckdb
import pandas as pd
import pytest

from thread_based_map_reduce_spark.operators.dedup import (
    JACCARD_MAX_BLOCK,
    jaccard_blocked_pairs,
    jaccard_blocked_oracle_sql,
)
from thread_based_map_reduce_spark.plans.oracle_check import frame_hash, frame_rows


def _fixture_pdf() -> pd.DataFrame:
    rows = []
    # normal block: 6 docs, two planted near-dup pairs
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows += [
        (1, "en", base),
        (2, "en", base + " extra"),  # near-dup of 1
        (3, "en", "completely different words about spark shuffles and joins with adaptive query execution enabled here"),
        (4, "en", "completely different words about spark shuffles and joins with adaptive query execution enabled there"),
        (5, "en", "unrelated text mentioning parquet files and columnar layouts"),
        (6, "en", "watermarks bound state for late data in structured streaming"),
    ]
    # planted HOT block: 30 near-identical docs sharing a blocking key —
    # exactly the degenerate case the cap exists for
    for i in range(30):
        rows.append((100 + i, "xx", f"spam spam spam spam spam spam spam {i % 2}"))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_hot_block_dropped_and_logged(spark, caplog):
    pdf = _fixture_pdf()
    docs = spark.createDataFrame(pdf)
    with caplog.at_level(logging.WARNING, "thread_based_map_reduce_spark.operators.dedup"):
        out = jaccard_blocked_pairs(docs, max_block=10).toPandas()
    # the cap is not silent
    assert any("dropping 1 block" in r.message and "'xx'" in r.message for r in caplog.records)
    # no pair from the hot block survives; the normal block is unaffected
    assert not set(out.doc_a) & set(range(100, 130))
    assert not set(out.doc_b) & set(range(100, 130))
    assert {(1, 2), (3, 4)} <= set(zip(out.doc_a, out.doc_b))


def test_cap_rule_matches_oracle(spark):
    pdf = _fixture_pdf()
    docs = spark.createDataFrame(pdf)
    spdf = jaccard_blocked_pairs(docs, max_block=10).toPandas()

    con = duckdb.connect()
    con.register("documents", pdf)
    opdf = con.execute(jaccard_blocked_oracle_sql(max_block=10)).df()

    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    assert frame_hash(frame_rows(spdf)) == frame_hash(frame_rows(opdf))


def test_default_cap_keeps_testdata_blocks(spark, sf_dir):
    """At the shipped default no testdata block is anywhere near the cap —
    the registered query's results are cap-invariant on real data."""
    from thread_based_map_reduce_spark.sources.registry import load_table

    sizes = load_table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    assert max(r["count"] for r in sizes) < JACCARD_MAX_BLOCK


def test_prefix_filter_is_exact_superset_of_lsh(spark, sf_dir):
    """Prefix filtering is complete (no false negatives at the threshold),
    so its pair set must contain every LSH-verified pair, with identical
    jaccard values on the intersection; every reported pair meets the
    threshold exactly (2*inter >= union is the integer-exact gate)."""
    from thread_based_map_reduce_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        q_dedup_prefix_filter_pairs,
        _lsh_verified_pairs,
    )

    ppj = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in q_dedup_prefix_filter_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _lsh_verified_pairs(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(ppj), "prefix filter missed LSH-verified pairs"
    for pair, j in lsh.items():
        assert abs(ppj[pair] - j) < 1e-9
    assert all(j >= JACCARD_THRESHOLD - 1e-9 for j in ppj.values())
