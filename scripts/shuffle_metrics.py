#!/usr/bin/env python3
"""Shuffle-volume measurement for the scale-curve champions.

Time curves (scale_curve.py) show the champions' RUNTIME is sub-linear;
this companion measures WHY it can stay that way on a real cluster: the
bytes that cross the wire. It runs each query in a session with the
Spark event log enabled, forces full evaluation (the scale_point timer),
then parses the event-log JSON for per-stage shuffle write/read bytes
and spill — the numbers a 1000-executor deployment actually pays for.

Usage: python scripts/shuffle_metrics.py [query ...]  (default champions)
Prints one JSON line per query per scale point:
    {"query": ..., "point": "10x", "shuffle_write_mb": ..., ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

POINTS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", os.path.join(ROOT, ".scale10h")),
    ("100x", os.path.join(ROOT, ".scale100h")),
]
CHAMPIONS = ["dedup_minhash_lsh_pairs", "ann_lsh_bucketed"]


def _sum_event_log(log_dir: str) -> dict[str, float]:
    paths = []
    for root, _, files in os.walk(log_dir):
        paths += [
            os.path.join(root, f)
            for f in files
            if not f.endswith(".crc") and "appstatus" not in f
        ]
    # Keyed by (app path, stage id), keeping the highest attempt: a stage
    # re-attempt after a fetch failure emits a second StageCompleted event
    # for the same stage id, and summing both would double-count its bytes
    # (ADVICE r6). The last attempt's Accumulables carry the stage totals.
    per_stage: dict[tuple[str, int], tuple[int, dict[str, int]]] = {}
    for path in paths:
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                info = ev["Stage Info"]
                key = (path, info.get("Stage ID", -1))
                attempt = info.get("Stage Attempt ID", 0)
                # "Accumulables" carries the stage-level totals the UI
                # shows; task-level sums would double-count retries.
                accs = {
                    acc.get("Name"): acc.get("Value")
                    for acc in info.get("Accumulables", [])
                    if isinstance(acc.get("Value"), int)
                }
                if key not in per_stage or attempt >= per_stage[key][0]:
                    per_stage[key] = (attempt, accs)
    write = read = spill_mem = spill_disk = 0
    for _, accs in per_stage.values():
        for name, val in accs.items():
            if name == "internal.metrics.shuffle.write.bytesWritten":
                write += val
            elif name in (
                "internal.metrics.shuffle.read.localBytesRead",
                "internal.metrics.shuffle.read.remoteBytesRead",
            ):
                read += val
            elif name == "internal.metrics.memoryBytesSpilled":
                spill_mem += val
            elif name == "internal.metrics.diskBytesSpilled":
                spill_disk += val
    mb = 1024.0 * 1024.0
    return {
        "shuffle_write_mb": round(write / mb, 2),
        "shuffle_read_mb": round(read / mb, 2),
        "mem_spill_mb": round(spill_mem / mb, 2),
        "disk_spill_mb": round(spill_disk / mb, 2),
    }


def main() -> None:
    from scale_point import time_query

    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all
    from thread_based_map_reduce_spark.session import get_spark

    _load_all()
    out = []
    for name in (sys.argv[1:] or CHAMPIONS):
        fn = CATALOG[name].fn
        for label, d in POINTS:
            # fresh session per point: the event log is per-application,
            # and isolating it gives per-(query, point) attribution
            log_dir = tempfile.mkdtemp(prefix=f"tbmr-evlog-{name}-{label}-")
            spark = get_spark(
                f"shuffle-metrics-{name}-{label}",
                extra_conf={
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": f"file://{log_dir}",
                    # plain single-file JSON so the parser needs no codecs
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.rolling.enabled": "false",
                },
            )
            try:
                t, rows = time_query(fn, spark, d)
            finally:
                spark.stop()
            rec = {"query": name, "point": label, "sec": round(t, 2), "rows": rows}
            rec.update(_sum_event_log(log_dir))
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"shuffle_metrics": out}))


if __name__ == "__main__":
    main()
