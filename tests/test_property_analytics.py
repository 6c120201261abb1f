"""Property-based tests for the round-4 analytic cores: the distributed
skyline and the gaps-and-islands streak must equal brute-force python
oracles on RANDOM inputs — catching boundary cases (duplicate points,
all-one-price, tie storms) the fixed testdata can't."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from thread_based_map_reduce_spark.operators.analytics import (
    longest_streaks,
    pareto_skyline,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

points_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),  # dense -> many ties/dups
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(pts=points_strategy)
def test_skyline_equals_bruteforce(spark, pts):
    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    got = {
        (r.id, r.price, r.size)
        for r in pareto_skyline(df, "price", "size").collect()
    }
    want = {
        (i, float(p), s)
        for i, (p, s) in enumerate(pts)
        if not any(
            (qp <= p and qs >= s and (qp < p or qs > s)) for qp, qs in pts
        )
    }
    assert got == want


events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2)),  # (user, type) sequence
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(seq=events_strategy)
def test_longest_streak_equals_python(spark, seq):
    # event_id doubles as the timestamp tiebreak; ts constant per user to
    # stress the (ts, event_id) ordering contract
    rows = [
        (i, u, f"t{t}", 1000 + i)  # us timestamps via timestamp_micros
        for i, (u, t) in enumerate(seq)
    ]
    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, us long"
        )
        .withColumn("ts", F.timestamp_micros("us"))
        .drop("us")
    )
    got = {
        r.user_id: (r.event_type, r.streak_len, r.start_us)
        for r in longest_streaks(df).collect()
    }

    # python oracle: scan each user's (event_id-ordered) sequence
    per_user: dict[int, list[tuple[int, str]]] = {}
    for i, (u, t) in enumerate(seq):
        per_user.setdefault(u, []).append((1000 + i, f"t{t}"))
    want = {}
    for u, evs in per_user.items():
        best = None  # (len, start_us, type)
        cur_len, cur_start, cur_type = 0, None, None
        for us, t in evs:
            if t == cur_type:
                cur_len += 1
            else:
                cur_len, cur_start, cur_type = 1, us, t
            cand = (-cur_len, cur_start, cur_type)
            if best is None or cand < best:
                best = cand
        want[u] = (best[2], -best[0], best[1])
    assert got == want


rank_strategy = st.lists(
    # dense (group, value) space -> duplicate values within and across
    # groups, empty-bucket runs, single-element groups
    st.tuples(st.integers(0, 2), st.integers(0, 5)),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(rows=rank_strategy)
def test_bucketed_group_rank_equals_window_rank(spark, rows):
    from pyspark.sql import Window, functions as F

    from thread_based_map_reduce_spark.operators.analytics import (
        bucketed_group_rank,
    )

    df = spark.createDataFrame(
        [(i, g, float(v)) for i, (g, v) in enumerate(rows)],
        "id long, g int, v double",
    )
    got = {
        (r.g, r.id): r.i
        for r in bucketed_group_rank(df, "g", "v", "id", buckets=4).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r.g, r.id): r.i
        for r in df.withColumn("i", F.row_number().over(w)).collect()
    }
    assert got == want


@given(st.integers(min_value=1, max_value=500))
@settings(max_examples=200, deadline=None)
def test_ntile_reconstruction_formula(n):
    """customer_ltv_deciles reconstructs ntile(10) arithmetically from the
    exact global rank: the first n%10 tiles take floor(n/10)+1 rows, the
    rest floor(n/10) — verify the closed form against ntile's documented
    allocation for every rank at every n."""
    base, r = n // 10, n % 10
    big = base + 1
    cut = r * big
    # reference allocation: tile sizes big×r then base×(10-r)
    ref = []
    for tile in range(1, 11):
        ref.extend([tile] * (big if tile <= r else base))
    assert len(ref) == n
    for i in range(1, n + 1):
        got = (i - 1) // big + 1 if i <= cut else r + (i - cut - 1) // max(base, 1) + 1
        assert got == ref[i - 1], (n, i, got, ref[i - 1])
