"""The micronat ±1 tolerance path in the oracle comparison (VERDICT r5 #7).

The quantization pattern floor(1e6 * ln(x)) -> BIGINT (operators/ml.py
header) carries a documented ~1-ulp platform exposure: if a driver box's
libm ever rounds differently, a *_micronat column may legitimately differ
by ±1. These tests prove the prepared fix works — a ±1 flip passes ONLY
under the opt-in tolerance AND only for suffix-tagged columns — without
ever being on by default.
"""

from __future__ import annotations

import pandas as pd

from thread_based_map_reduce_spark.plans.oracle_check import compare_frames


def _frames(delta: int, col: str = "ll_micronat"):
    a = pd.DataFrame({"k": ["a", "b"], col: [1000000, -2000000]})
    b = pd.DataFrame({"k": ["a", "b"], col: [1000000 + delta, -2000000]})
    return a, b


def test_exact_match_passes_both_modes():
    a, b = _frames(0)
    assert compare_frames(a, b) == []
    assert compare_frames(a, b, micronat_tolerance=1) == []


def test_one_ulp_flip_fails_by_default():
    a, b = _frames(1)
    problems = compare_frames(a, b)
    assert problems and "value hash" in problems[0]


def test_one_ulp_flip_passes_under_tolerance():
    a, b = _frames(1)
    assert compare_frames(a, b, micronat_tolerance=1) == []


def test_two_ulp_flip_fails_even_under_tolerance():
    a, b = _frames(2)
    problems = compare_frames(a, b, micronat_tolerance=1)
    assert problems and "±1" in problems[0]


def test_untagged_column_gets_no_tolerance():
    # the suffix is the opt-in: a plain integer column must stay exact
    a, b = _frames(1, col="ll_micro")
    assert compare_frames(a, b, micronat_tolerance=1) != []


def test_exact_columns_still_exact_under_tolerance():
    a = pd.DataFrame({"k": ["a"], "ll_micronat": [5]})
    b = pd.DataFrame({"k": ["A"], "ll_micronat": [5]})
    assert compare_frames(a, b, micronat_tolerance=1) != []


def test_group_alignment_pairs_sorted_tolerance_values():
    # two rows with identical exact columns, micronat values crossing by 1:
    # sorted pairing must align (10, 11) with (11, 10) -> within ±1
    a = pd.DataFrame({"k": ["a", "a"], "ll_micronat": [10, 11]})
    b = pd.DataFrame({"k": ["a", "a"], "ll_micronat": [11, 10]})
    assert compare_frames(a, b, micronat_tolerance=1) == []
