"""Property-based parity tests (SURVEY §5.2.4): the generic map/reduce
surface must equal a naive single-threaded map → group → reduce oracle for
random inputs and random emit patterns — including 0-emit and multi-emit
(legal per the reference contracts, MapReduceClient.h:57-64) — and the
flagship char-count must equal collections.Counter.

Each Spark round-trip costs ~1 s, so example counts are kept moderate;
the generators still cover the documented edge cases (empty strings,
single-char, all-identical, 0-emit maps, 0/multi-emit reduces).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st

from thread_based_map_reduce_spark.mapreduce import run_map_reduce

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("abc XYZ09!"),  # printable incl. spaces, repeats
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
).map(
    # always include the documented edge cases
    lambda ts: ts + ["", "a", "zzzzzz"]
)


@SETTINGS
@given(texts=texts_strategy)
def test_charcount_equals_counter(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def map_fn(row):
        return Counter(row.text).items()

    def reduce_fn(key, pdf):
        yield (key[0], int(pdf["partial"].sum()))

    got = {
        (r.ch, r.cnt)
        for r in run_map_reduce(
            df.select("text"),
            map_fn,
            reduce_fn,
            map_schema="ch string, partial long",
            out_schema="ch string, cnt long",
            key_cols=["ch"],
        ).collect()
    }
    want = set(Counter("".join(texts)).items())
    assert got == want


rows_strategy = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(-100, 100)),
    min_size=0,
    max_size=40,
)


@SETTINGS
@given(rows=rows_strategy, n_emit_map=st.integers(0, 3), reduce_mode=st.sampled_from(["sum", "expand", "drop_neg"]))
def test_generic_mapreduce_equals_naive(spark, rows, n_emit_map, reduce_mode):
    # map: emit n_emit_map copies of (k, v+i) per row — covers 0-emit (filter),
    # 1-emit (project), N-emit (explode)
    def map_fn(row):
        return [(row.k, row.v + i) for i in range(n_emit_map)]

    # reduce variants: 1-emit aggregation / N-emit expansion / 0-emit filter
    def reduce_fn(key, pdf):
        vals = sorted(int(v) for v in pdf["v"])  # value order is NOT a contract
        if reduce_mode == "sum":
            yield (key[0], sum(vals))
        elif reduce_mode == "expand":
            for v in vals:
                yield (key[0], v)
        else:  # drop_neg: emit only for non-negative-sum groups
            if sum(vals) >= 0:
                yield (key[0], sum(vals))

    df = spark.createDataFrame(rows or [(0, 0)], "k long, v long")
    if not rows:
        df = df.limit(0)  # exercise the empty-input plan shape
    got = sorted(
        (r.k, r.out)
        for r in run_map_reduce(
            df,
            map_fn,
            reduce_fn,
            map_schema="k long, v long",
            out_schema="k long, out long",
            key_cols=["k"],
        ).collect()
    )

    # naive single-threaded oracle: map → group → reduce
    groups: dict[int, list[int]] = defaultdict(list)
    for k, v in rows:
        for kk, vv in map_fn(type("R", (), {"k": k, "v": v})()):
            groups[kk].append(vv)
    import pandas as pd

    want: list[tuple[int, int]] = []
    for k, vals in groups.items():
        want.extend(reduce_fn((k,), pd.DataFrame({"v": vals})))
    assert got == sorted(want)


# -- float-key equality corner (MapReduceFramework.cpp:163-165) ---------------
#
# The reference derives key equality from operator< : -0.0 and 0.0 compare
# equal, and NaN (never less than anything) collapses into one group.
# run_map_reduce normalizes float keys pre-groupBy to reproduce that.

float_keys_strategy = st.lists(
    st.floats(min_value=-3, max_value=3, allow_nan=False).map(lambda x: round(x, 2)),
    min_size=0,
    max_size=20,
).map(
    # always plant the corner keys, several times each
    lambda ks: ks + [0.0, -0.0, float("nan"), float("nan"), -0.0, 1.5]
)


@SETTINGS
@given(keys=float_keys_strategy)
def test_float_key_ordering_equality(spark, keys):
    rows = [(float(k), i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k double, v long")

    def map_fn(row):
        yield (row.k, row.v)

    def reduce_fn(key, pdf):
        yield (key[0], len(pdf), int(pdf["v"].sum()))

    got = run_map_reduce(
        df,
        map_fn,
        reduce_fn,
        map_schema="k double, v long",
        out_schema="k double, n long, s long",
        key_cols=["k"],
    ).collect()

    # naive sort-and-group oracle with ordering-derived equality
    import math

    def canon(k):
        # NaN crosses the pandas/Arrow boundary as NULL (pandas' missing
        # marker) — either way it is ONE group, per the documented contract
        if k is None or math.isnan(k):
            return "nan"
        return 0.0 if k == 0.0 else k  # catches -0.0

    want: dict = defaultdict(list)
    for k, v in rows:
        want[canon(k)].append(v)

    got_by_key = {canon(r.k): (r.n, r.s) for r in got}
    assert len(got) == len(want), "a float corner key split into multiple groups"
    assert got_by_key == {k: (len(vs), sum(vs)) for k, vs in want.items()}
    # the normalized key value itself: -0.0 must surface as +0.0
    for r in got:
        if r.k == 0.0:
            assert math.copysign(1.0, r.k) == 1.0
    # pin the documented Arrow-lane surface (README parity notes): the NaN
    # group is exactly ONE group and its output key arrives as NULL (pandas
    # uses NaN as its missing marker, so the key cannot round-trip as NaN)
    nan_groups = [r for r in got if r.k is None or math.isnan(r.k)]
    assert len(nan_groups) == 1, "NaN keys split into multiple groups"
    assert nan_groups[0].k is None, "NaN key expected to surface as NULL"
