"""Invariant tests for the data-layout family (operators/layout.py).

The DuckDB oracle pins exact values; these assert the semantic contract:
Z-order placement must actually improve 2-D file skipping, and the
Morton-code math must be a true bit interleave.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.layout import (
    N_FILES,
    ZQ_BITS,
    _interleave,
    q_zorder_pruning_stats,
)


def test_interleave_is_morton_code(spark):
    """The column builder matches the textbook bit-interleave on the full
    16x16 grid."""

    def morton(x: int, y: int) -> int:
        z = 0
        for j in range(ZQ_BITS):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    grid = [(x, y) for x in range(1 << ZQ_BITS) for y in range(1 << ZQ_BITS)]
    df = spark.createDataFrame(grid, "xq long, yq long").select(
        "xq", "yq", _interleave(F.col("xq"), F.col("yq")).alias("zv")
    )
    got = {(r.xq, r.yq): r.zv for r in df.collect()}
    assert got == {(x, y): morton(x, y) for x, y in grid}
    # bijective over the grid: 256 distinct codes
    assert len(set(got.values())) == len(grid)


def test_zorder_beats_natural_layout(spark, sf_dir):
    rows = {r.layout: r for r in q_zorder_pruning_stats(spark, sf_dir).collect()}
    assert set(rows) == {"natural", "zorder"}
    for r in rows.values():
        assert r.n_files == N_FILES
        assert 0.0 < r.avg_x_span <= 1.0
        assert 0.0 < r.avg_y_span <= 1.0
        assert 0.0 < r.avg_cell_cover <= 1.0
    # the operator's reason to exist: Z-order files cover strictly less of
    # the 2-D predicate space than insertion-order files
    assert rows["zorder"].avg_cell_cover < rows["natural"].avg_cell_cover
