#!/usr/bin/env python3
"""Measure the streaming-minhash-dedup state store (VERDICT r7 #8):
drives minhash_dedup_stream to completion capturing the state operator's
numRowsTotal from the query progress — the measured point for SCALE.md's
state-size formula (state rows = distinct signatures inside the
watermark window; bytes ≈ rows × (8 perms × 8 B + event-time + store
overhead ≈ ~200 B/row in the HDFS-backed store).

Usage: python scripts/streaming_state_point.py [sf_dir ...]
Defaults to sf0.1 and the 10× Heaps fixture.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from thread_based_map_reduce_spark.session import get_spark
    from thread_based_map_reduce_spark.streaming.events import (
        _RUN_STREAM_LOCK,
        minhash_dedup_stream,
    )

    spark = get_spark()
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", os.path.join(ROOT, ".scale10h")]
    for i, sf_dir in enumerate(dirs):
        stream = minhash_dedup_stream(spark, sf_dir)
        name = f"tbmr_state_point_{i}"
        with _RUN_STREAM_LOCK:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                q = (
                    stream.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .start()
                )
                try:
                    q.processAllAvailable()
                    state_rows = 0
                    state_bytes = 0
                    n_batches = 0
                    for p in q.recentProgress:
                        for op in p.get("stateOperators", []):
                            state_rows = max(state_rows, op.get("numRowsTotal", 0))
                            state_bytes = max(
                                state_bytes, op.get("memoryUsedBytes", 0)
                            )
                        n_batches += 1
                finally:
                    q.stop()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
        emitted = spark.sql(f"SELECT count(*) AS n FROM {name}").first()["n"]
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "emitted_distinct_sigs": emitted,
                    "state_rows_max": state_rows,
                    "state_bytes_max": state_bytes,
                    "bytes_per_row": round(state_bytes / state_rows, 1)
                    if state_rows
                    else None,
                    "micro_batches": n_batches,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
