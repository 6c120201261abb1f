"""Property-style tests for the generic map/reduce surface (SURVEY §5.2.4):
engine result ≡ naive single-threaded map → group → reduce, across emit
patterns (0, 1, N per map call and per reduce group), and invariance to
value order within a group (SURVEY §1.4).
"""

from __future__ import annotations

import random
from collections import defaultdict

from thread_based_map_reduce_spark.mapreduce import run_map_reduce


def _naive(rows, map_fn, reduce_fn_list):
    groups = defaultdict(list)
    for row in rows:
        for k, v in map_fn(row):
            groups[k].append(v)
    out = []
    for k, vs in groups.items():
        out.extend(reduce_fn_list(k, vs))
    return sorted(out)


class Row:
    def __init__(self, k, v):
        self.k, self.v = k, v


def _run_engine(spark, rows, map_fn, reduce_fn):
    df = spark.createDataFrame([(r.k, r.v) for r in rows], schema="k long, v long")
    out = run_map_reduce(
        df,
        map_fn,
        reduce_fn,
        map_schema="k2 long, v2 long",
        out_schema="k3 long, v3 long",
        key_cols=["k2"],
    )
    return sorted((r.k3, r.v3) for r in out.collect())


def _cases(seed):
    rng = random.Random(seed)
    return [Row(rng.randrange(8), rng.randrange(100)) for _ in range(rng.randrange(1, 120))]


def test_multi_emit_map_and_reduce(spark):
    rows = _cases(1)

    def map_fn(row):  # N emissions per row
        return [(row.k, row.v), (row.k + 1, row.v * 2)]

    def reduce_fn(key, pdf):  # 2 emissions per group
        s = int(pdf["v2"].sum())
        yield (key[0], s)
        yield (key[0] + 100, s % 7)

    def naive_reduce(k, vs):
        s = sum(vs)
        return [(k, s), (k + 100, s % 7)]

    assert _run_engine(spark, rows, map_fn, reduce_fn) == _naive(
        rows, lambda r: [(r.k, r.v), (r.k + 1, r.v * 2)], naive_reduce
    )


def test_zero_emit_paths(spark):
    rows = _cases(2)

    def map_fn(row):  # filter inside map: 0 emissions for odd values
        if row.v % 2 == 0:
            yield (row.k, row.v)

    def reduce_fn(key, pdf):  # 0 emissions for small groups
        if len(pdf) >= 3:
            yield (key[0], int(pdf["v2"].max()))

    def naive_map(r):
        return [(r.k, r.v)] if r.v % 2 == 0 else []

    def naive_reduce(k, vs):
        return [(k, max(vs))] if len(vs) >= 3 else []

    assert _run_engine(spark, rows, map_fn, reduce_fn) == _naive(rows, naive_map, naive_reduce)


def test_value_order_invariance(spark):
    # a reduce that is order-sensitive ON PURPOSE must be normalized by the
    # client (sorting inside reduce) — the engine guarantees only the full
    # multiset of values per key. Mirror of SURVEY §1.4.
    rows = _cases(3)

    def map_fn(row):
        yield (row.k, row.v)

    def reduce_fn(key, pdf):
        vs = sorted(pdf["v2"].tolist())
        yield (key[0], sum(v * (i + 1) for i, v in enumerate(vs)))

    def naive_reduce(k, vs):
        svs = sorted(vs)
        return [(k, sum(v * (i + 1) for i, v in enumerate(svs)))]

    assert _run_engine(spark, rows, map_fn, reduce_fn) == _naive(
        rows, lambda r: [(r.k, r.v)], naive_reduce
    )


def test_single_row_and_identity(spark):
    rows = [Row(5, 42)]

    def map_fn(row):
        yield (row.k, row.v)

    def reduce_fn(key, pdf):
        yield (key[0], int(pdf["v2"].iloc[0]))

    assert _run_engine(spark, rows, map_fn, reduce_fn) == [(5, 42)]
