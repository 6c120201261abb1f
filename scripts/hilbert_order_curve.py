"""Hilbert/Z-order pruning-vs-write-cost curve at quantization order 8
vs 4 (VERDICT r10 #5): what a layout decision at 100 TB actually needs —
does the finer curve buy enough file-skipping to pay for its write cost?

Two instruments, each measuring what it is good at:

- PRUNING: deterministic equal-count rank bucketing into N_FILES files
  (the catalog's `_global_rank` machinery, so numbers are directly
  comparable to zorder/hilbert_pruning_stats) -> per-file (xq, yq)
  min/max envelopes -> files hit by a probe rectangle of MATCHED
  selectivity (the middle quarter of each dimension = 1/16 of the
  domain at every order).
- WRITE COST: the real production layout write (repartitionByRange on
  the curve key + sortWithinPartitions + parquet), 3 reps, median —
  range-boundary sampling makes per-run file contents nondeterministic,
  which is fine for timing but why it is NOT used for the pruning
  metric.

Usage: python scripts/hilbert_order_curve.py [sf_dir] (default sf0.1)
Results are recorded in BASELINE.md ("Hilbert order-8 curve", round 11).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.layout import (
    N_FILES,
    _global_rank,
    hilbert_d_col,
)
from thread_based_map_reduce_spark.session import get_spark
from thread_based_map_reduce_spark.sources.registry import load_table

REPS = 3


def interleave_bits(xq, yq, order: int):
    """Morton code at arbitrary order (layout._interleave is pinned to
    the catalog's ZQ_BITS)."""
    z = F.lit(0).cast("bigint")
    for j in range(order):
        z = (
            z.bitwiseOR(F.shiftleft(xq.bitwiseAND(F.lit(1 << j)), j + 1))
            .bitwiseOR(F.shiftleft(yq.bitwiseAND(F.lit(1 << j)), j))
        )
    return z


def quantized(spark, sf_dir: str, order: int):
    cells = 1 << order
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bounds = orders.agg(
        F.min("o_custkey").alias("minc"),
        F.max("o_custkey").alias("maxc"),
        F.min("o_totalprice").alias("minp"),
        F.max("o_totalprice").alias("maxp"),
        F.count("*").alias("n"),
    ).withColumn("_k", F.lit(1))
    j = orders.withColumn("_k", F.lit(1)).join(F.broadcast(bounds), "_k")
    xq = F.least(
        F.lit(cells - 1),
        F.floor(
            (F.col("o_custkey") - F.col("minc"))
            * float(cells)
            / (F.col("maxc") - F.col("minc") + 1)
        ),
    ).cast("bigint")
    yq = F.least(
        F.lit(cells - 1),
        F.coalesce(
            F.floor(
                (F.col("o_totalprice") - F.col("minp"))
                * float(cells)
                / F.nullif(F.col("maxp") - F.col("minp"), F.lit(0.0))
            ),
            F.lit(0).cast("bigint"),
        ),
    ).cast("bigint")
    q = j.select("o_orderkey", "n", xq.alias("xq"), yq.alias("yq"))
    q = q.withColumn("zv", interleave_bits(F.col("xq"), F.col("yq"), order))
    return hilbert_d_col(q, order, "xq", "yq")


def prune_stats(q, key: str, order: int):
    cells = 1 << order
    lo, hi = cells // 4, cells // 2 - 1
    ranked = _global_rank(q, F.col(key), F.col(key))
    files = (
        ranked.select(
            F.floor((F.col("rn") - 1) * float(N_FILES) / F.col("n"))
            .cast("bigint")
            .alias("file_id"),
            "xq",
            "yq",
        )
        .groupBy("file_id")
        .agg(
            F.min("xq").alias("x0"),
            F.max("xq").alias("x1"),
            F.min("yq").alias("y0"),
            F.max("yq").alias("y1"),
        )
    )
    return files.agg(
        F.count("*").alias("nf"),
        F.sum(
            F.when(
                (F.col("x1") >= lo)
                & (F.col("x0") <= hi)
                & (F.col("y1") >= lo)
                & (F.col("y0") <= hi),
                1,
            ).otherwise(0)
        ).alias("hit"),
        F.avg(
            (F.col("x1") - F.col("x0") + 1)
            * (F.col("y1") - F.col("y0") + 1)
            / float(cells * cells)
        ).alias("cover"),
    ).collect()[0], (lo, hi)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hilbert-order-curve")
    scratch = tempfile.mkdtemp(prefix="hilbert_curve_")
    print(f"sf_dir={sf_dir} files={N_FILES} write_reps={REPS}")
    print("order layout  write_sec(med) n_files files_hit probe "
          "avg_cell_cover")
    try:
        # untimed warmup: the first parquet write pays codegen/committer
        # startup (~2-3 s) that would otherwise land on the first row
        warm = quantized(spark, sf_dir, 4)
        (
            warm.select("o_orderkey", "xq", "yq", "zv")
            .repartitionByRange(N_FILES, F.col("zv"))
            .sortWithinPartitions("zv")
            .write.mode("overwrite")
            .parquet(os.path.join(scratch, "warmup"))
        )
        for order in (4, 8):
            q = quantized(spark, sf_dir, order)
            q.persist()
            q.count()
            for layout, key in (("zorder", "zv"), ("hilbert", "hv")):
                path = os.path.join(scratch, f"{layout}_{order}")
                samples = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    (
                        q.select("o_orderkey", "xq", "yq", key)
                        .repartitionByRange(N_FILES, F.col(key))
                        .sortWithinPartitions(key)
                        .write.mode("overwrite")
                        .parquet(path)
                    )
                    samples.append(time.perf_counter() - t0)
                samples.sort()
                wsec = samples[len(samples) // 2]
                row, (lo, hi) = prune_stats(q, key, order)
                print(
                    f"{order:5d} {layout:7s} {wsec:14.2f} {row.nf:7d} "
                    f"{row.hit:9d} [{lo},{hi}]^2 {row.cover:.6f}"
                )
            q.unpersist()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
