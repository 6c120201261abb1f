"""Streaming tests: the streaming tumbling-window aggregation must agree
with its batch twin (catalog query ``events_tumbling_hour``), and the
stateful per-user operator must agree with a batch groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.plans.catalog import queries
from thread_based_map_reduce_spark.sources.registry import load_table
from thread_based_map_reduce_spark.streaming.events import (
    run_stream_to_memory,
    session_counts_stream,
    tumbling_counts_stream,
    user_running_totals_stream,
)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_memory(
        tumbling_counts_stream(spark, sf_dir), "t_tumbling", "complete"
    )
    got = {
        (r.hour_start_s, r.event_type): (r.n, r.total_value) for r in stream_out.collect()
    }
    batch = queries()["events_tumbling_hour"](spark, sf_dir)
    want = {
        (r.hour_start_s, r.event_type): (r.n, r.total_value) for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_stream_session_window_equals_batch(spark, sf_dir):
    # complete mode emits the full merged session set every trigger (session
    # aggregations support append/complete, not update)
    stream_out = run_stream_to_memory(
        session_counts_stream(spark, sf_dir), "t_sessions", "complete"
    )
    got = {
        (r.user_id, r.session_start_us): (r.n_events, r.total_value)
        for r in stream_out.collect()
    }
    batch = queries()["session_window_agg"](spark, sf_dir)
    want = {
        (r.user_id, r.session_start_us): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_stateful_running_totals(spark, sf_dir):
    out = run_stream_to_memory(
        user_running_totals_stream(spark, sf_dir), "t_state", "update"
    )
    # final state per user (last update wins) must equal the batch rollup
    final = {}
    for r in out.collect():
        final[r.user_id] = (r.n_events, r.total_value)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert final == want and len(final) > 0
