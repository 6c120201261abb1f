"""Property test for the MERGE-apply core: random base/changelog pairs
must produce exactly the state a brute-force python merge produces —
catching matched/unmatched rule mix-ups the fixed testdata can't."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from thread_based_map_reduce_spark.operators.engineering import merge_apply

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

base_strategy = st.lists(st.integers(0, 9), max_size=8, unique=True)
chg_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.sampled_from(["U", "D"])),
    max_size=8,
    unique_by=lambda t: t[0],
)


@SETTINGS
@given(base_keys=base_strategy, chg=chg_strategy)
def test_merge_apply_equals_python_merge(spark, base_keys, chg):
    base = spark.createDataFrame(
        [(k, f"old{k}") for k in base_keys] or [],
        "doc_id long, text string",
    )
    chg_df = spark.createDataFrame(
        [(k, op, f"new{k}") for k, op in chg] or [],
        "c_doc_id long, op string, new_text string",
    )
    _, final = merge_apply(base, chg_df)
    got = {(r.k, r.text) for r in final.collect()}

    state = {k: f"old{k}" for k in base_keys}
    for k, op in chg:
        if op == "U":
            state[k] = f"new{k}"
        elif op == "D":
            state.pop(k, None)
    assert got == {(k, v) for k, v in state.items()}
