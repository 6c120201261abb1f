"""Lifecycle tests mirroring the reference's edge cases (SURVEY §5.2.5):
empty input rejected (MapReduceFramework.cpp:329), bad parallelism rejected
(:326), repeated waitForJob safe (:369-374), close-after-close safe
(:406-410), progress states well-formed (:383-402).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from thread_based_map_reduce_spark.jobs import JobError, JobState, Stage, start_map_reduce_job


def _plan(spark, n=200_000):
    # a two-stage plan (map → exchange → reduce), slow enough to observe
    return (
        spark.range(n)
        .select((F.col("id") % 512).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )


def test_async_start_wait_result(spark):
    h = start_map_reduce_job(_plan(spark))
    rows = h.wait_for_job()
    assert len(rows) == 512
    # repeated wait is idempotent and returns the same result
    assert len(h.wait_for_job()) == 512
    h.close()
    h.close()  # double close: warning-level no-op, no crash


def test_get_job_state_shape(spark):
    h = start_map_reduce_job(_plan(spark, 2_000_000))
    seen = set()
    for _ in range(200):
        st = h.get_job_state()
        assert isinstance(st, JobState)
        assert st.stage in set(Stage)
        assert 0.0 <= st.percentage <= 100.0
        seen.add(st.stage)
        if not h._thread.is_alive():
            break
        time.sleep(0.01)
    h.wait_for_job()
    final = h.get_job_state()
    assert final.stage is Stage.REDUCE and final.percentage == 100.0
    h.close()


def test_empty_input_rejected(spark):
    empty = spark.range(0)
    with pytest.raises(JobError, match="empty"):
        start_map_reduce_job(empty)


def test_bad_parallelism_rejected(spark):
    with pytest.raises(JobError, match="multi_thread_level"):
        start_map_reduce_job(spark.range(10), multi_thread_level=0)
    with pytest.raises(JobError, match="multi_thread_level"):
        start_map_reduce_job(spark.range(10), multi_thread_level=-4)


def test_closed_handle_raises(spark):
    h = start_map_reduce_job(spark.range(10))
    h.wait_for_job()
    h.close()
    with pytest.raises(JobError):
        h.wait_for_job()
    with pytest.raises(JobError):
        h.get_job_state()


def test_failing_job_surfaces_error(spark):
    bad = spark.range(10).selectExpr("CAST('nope' AS BIGINT) + id AS x")  # ANSI cast error
    h = start_map_reduce_job(bad, validate_input=False)
    with pytest.raises(Exception):
        h.wait_for_job()
    h.close()


def test_between_stages_shuffle_respects_monotone_clamp():
    """ADVICE r1: the 'between stages' SHUFFLE/100 report must route through
    the monotone clamp — after REDUCE progress has been observed, a stage
    gap must not regress the observable state back to SHUFFLE."""
    from thread_based_map_reduce_spark.jobs import JobHandle, JobState, Stage

    h = JobHandle.__new__(JobHandle)  # no job needed: clamp is pure state
    h._last_stage, h._last_pct = Stage.UNDEFINED, 0.0

    assert h._clamped(Stage.MAP, 40.0) == JobState(Stage.MAP, 40.0)
    assert h._clamped(Stage.SHUFFLE, 100.0) == JobState(Stage.SHUFFLE, 100.0)
    assert h._clamped(Stage.REDUCE, 30.0) == JobState(Stage.REDUCE, 30.0)
    # the regression ADVICE flagged: between-stages gap while reducing
    assert h._clamped(Stage.SHUFFLE, 100.0) == JobState(Stage.REDUCE, 30.0)
    # same-stage percentage never moves backwards either
    assert h._clamped(Stage.REDUCE, 10.0) == JobState(Stage.REDUCE, 30.0)
    assert h._clamped(Stage.REDUCE, 80.0) == JobState(Stage.REDUCE, 80.0)
