"""Streaming-RUNTIME catalog entries (VERDICT r3 next-round #5).

The streaming-tagged batch twins (``events_tumbling_hour`` etc.) prove the
*semantics* through the driver's DuckDB oracle; these two entries prove the
*runtime*: each builds the real Structured Streaming plan (readStream over
the staged events source → watermark → aggregation), drives it to
completion inside the query builder, and returns the materialized sink
table as the result DataFrame — so the driver's rows/schema/hash gate runs
against output that actually flowed through micro-batch execution, state
stores, and a sink.

Reference parity note: the reference is strictly batch (one-shot over a
fixed input vector, ``MapReduceFramework.cpp:329``); streaming is an
engine extension — see ``streaming/events.py`` for the operator library.

Determinism: the file source feeds a fixed file set, aggregations are
deterministic, and the sinks are replay-safe (complete-mode memory table;
append-only parquet partials folded by a merge-on-read view), so repeated
runs produce identical tables for the oracle to hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.catalog import register
from ..streaming.events import (
    _events_stream,
    run_stream_to_memory,
    tumbling_counts_stream,
)


@register(
    "streaming_tumbling_runtime",
    # identical SQL to the batch twin events_tumbling_hour: the streaming
    # runtime must land on exactly the batch answer
    oracle="""
        SELECT
            CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start_s,
            event_type,
            count(*) AS n,
            round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="The ACTUAL Structured Streaming tumbling-window query executed to "
    "completion (readStream -> 2h watermark -> 1h window agg -> complete-"
    "mode memory sink) with the materialized sink table returned — a hard "
    "driver row for the streaming runtime itself, not just its batch twin",
    tags=("streaming", "runtime", "window"),
)
def q_streaming_tumbling_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(
        tumbling_counts_stream(spark, sf_dir),
        "tbmr_streaming_tumbling_runtime",
        "complete",
    )


@register(
    "streaming_upsert_runtime",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY user_id
    """,
    doc="foreachBatch upsert pipeline executed end-to-end: per-micro-batch "
    "partial aggregates appended to a parquet state table (merge-on-read "
    "upsert), then folded by the reader view — the oracle checks the merged "
    "totals equal one batch aggregation of the same events. Exercises "
    "foreachBatch, an external sink, and replay-safe partials through the "
    "driver's hash gate",
    tags=("streaming", "runtime", "sink"),
)
def q_streaming_upsert_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    target = tempfile.mkdtemp(prefix="tbmr-upsert-runtime-")
    atexit.register(shutil.rmtree, target, ignore_errors=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(target)
        )

    q = _events_stream(spark, sf_dir).writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.read.parquet(target)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.round(F.sum("value_sum"), 2).alias("total_value"),
        )
    )
