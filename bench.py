"""Bench harness: times the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect). A warmup pass of the flagship runs first so JVM/codegen startup
is not attributed to the first query.

    python bench.py                # headline (bench-flagged) queries
    python bench.py --all          # every catalog query
    python bench.py q1 q2 ...      # a subset by name
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thread_based_map_reduce_spark.plans.catalog import CATALOG, bench_queries, queries
from thread_based_map_reduce_spark.session import get_spark
from thread_based_map_reduce_spark.sources.registry import load_table


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# The 21 headline queries every BENCH_r{1..10} artifact timed, before
# dedup_exact_substring_spans joined the set in round 11 — their subtotal
# is stamped alongside so round-over-round totals stay comparable.
_R10_SET = frozenset((
    "charcount", "tpch_q1", "join_star_revenue", "window_topk_per_group",
    "asof_join_signup", "events_tumbling_hour", "sessionize",
    "tpch_q6_revenue", "tpch_q3_toporders", "tpch_q5_region_revenue",
    "tpch_q21_waiting_orders", "session_window_agg", "dedup_exact",
    "dedup_minhash_lsh_pairs", "dedup_clusters", "dedup_jaccard_blocked",
    "decontam_eval_overlap", "dup_span_fraction", "ann_bruteforce_topk",
    "text_token_stats", "zorder_pruning_stats",
))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    args = [a for a in sys.argv[1:]]
    if "--all" in args:
        selected = queries()
    elif args:
        allq = queries()
        selected = {name: allq[name] for name in args}
    else:
        selected = bench_queries()

    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("tbmr-bench")

    # warmup: spin up executors, codegen, and the parquet reader path on the
    # smallest scale factor so first-query timings aren't JVM startup
    materialize(spark.range(1_000_000).selectExpr("sum(id) AS s"))
    try:
        warm = CATALOG["charcount"].fn
        materialize(warm(spark, "/root/testdata/sf0.001"))
    except Exception:
        pass

    # Calibration probe (VERDICT r10 #6): the loadavg stamp below cannot
    # see page-cache state — a cold-cache run after a long suite read
    # 2.3x slow with contended=false (BASELINE.md r10).
    # Probe = full-byte scan of EVERY parquet table in the bench
    # sf_dir (the exact bytes the queries will read), timed twice back to
    # back. Pass 1 pays any cold-cache penalty AND warms the cache, so
    # the timed queries below always measure steady-state — the probe
    # doesn't just detect the r10 cold-cache hazard, it removes it.
    # Pass 2 is always cache-warm: compare it to BASELINE.md's reference
    # value to spot a slow/contended box from the artifact alone; the
    # pass1/pass2 ratio > 2 marks the artifact cold_cache=true. A plan-
    # shape warmup on the tiny sf0.001 dir precedes the timed passes so
    # codegen lands in neither (measured ~0.3 s otherwise).
    import glob as _glob

    def _calib_pass(d: str) -> float:
        # xxhash64(*) over every column defeats column pruning (a bare
        # count(*) would read only footers and warm nothing); load_table
        # normalizes the events timestamp vintage
        t0 = time.perf_counter()
        for f in sorted(_glob.glob(os.path.join(d, "*.parquet"))):
            name = os.path.splitext(os.path.basename(f))[0]
            materialize(
                load_table(spark, d, name).selectExpr(
                    "bit_xor(xxhash64(*)) AS h", "count(*) AS n"
                )
            )
        return round(time.perf_counter() - t0, 3)

    _calib_pass("/root/testdata/sf0.001")  # plan-shape warmup, untimed
    calib = [_calib_pass(sf_dir), _calib_pass(sf_dir)]
    # CPU-bound companion probe: a fixed 64M-row hash-agg pipeline with
    # no IO at all. The page-cache probe above cannot see host CPU
    # steal/frequency dips (observed r11: a quiet-stamped run with the
    # FASTEST warm scan timed the query set 1.5x slow, uniformly across
    # trivial queries — the r6 'uniform shift = host, not code'
    # signature). Quiet-box reference for this probe is in BASELINE.md.
    materialize(  # untimed shape warmup
        spark.range(1_000_000).selectExpr("bit_xor(xxhash64(id)) AS h")
    )
    t0 = time.perf_counter()
    materialize(
        spark.range(64_000_000).selectExpr(
            "bit_xor(xxhash64(id, id + 1, id + 2)) AS h", "count(*) AS n"
        )
    )
    calib_cpu = round(time.perf_counter() - t0, 3)
    cold_cache = calib[1] > 0 and calib[0] / calib[1] > 2.0
    if cold_cache:
        print(
            f"WARNING: calibration scan cold/warm = {calib[0]}/{calib[1]} s "
            "(ratio > 2): the page cache was cold when this bench started. "
            "The probe itself re-warmed the data, so query timings below "
            "are steady-state, but JVM/import effects may linger — artifact "
            "marked cold_cache=true.",
            file=sys.stderr,
        )

    # n>=3 reps per query (VERDICT r2 #2: single-shot timings moved 1.1-1.6x
    # between rounds on unchanged code — run-to-run variance, not regressions).
    # Per query we report the MEDIAN and keep the min/max spread alongside, so
    # a noisy outlier rep can't masquerade as a perf change. Reps run
    # back-to-back per query (interleaving whole passes would thrash the
    # page cache between queries and inflate variance further).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, fn in selected.items():
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        spread[name] = [round(samples[0], 3), round(samples[-1], 3)]
    total = round(sum(timings.values()), 3)
    # r2 precedent: when the headline set grows, keep history comparable
    # by also reporting the previous round's subtotal over its own names.
    # _R10_SET is the 21-query set every BENCH_r{1..10} artifact timed.
    total_r10_set = round(
        sum(t for n, t in timings.items() if n in _R10_SET), 3
    )

    # Environment stamps: host load (1m/5m/15m) before and after the run.
    # The r4/r6 drift investigations both traced disjoint-spread timing
    # moves to host iowait, not code — recording the load in the artifact
    # itself makes that call possible from the JSON alone. r6 closed the
    # loop the hard way (BENCH_r06: start load 1.90 on a box whose quiet
    # baseline is 0.03, +0.4-0.7 s uniform inflation on untouched trivial
    # queries); now the artifact SAYS so instead of requiring forensics:
    # a pre-run 1-minute load above the threshold marks the JSON
    # contended=true and warns on stderr. Read a contended artifact
    # against BASELINE.md's quiet-box record, not at face value.
    contended_threshold = float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_THRESHOLD", "0.5")
    )
    contended = load_start[0] > contended_threshold
    if contended:
        print(
            f"WARNING: bench started on a contended box (1m load "
            f"{load_start[0]} > {contended_threshold}); timings will be "
            "inflated by external load — artifact marked contended=true. "
            "See BASELINE.md 'Reading a contended artifact'.",
            file=sys.stderr,
        )
    load_end = [round(x, 2) for x in os.getloadavg()]
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "n_queries": len(timings),
                "reps": reps,
                "query_minmax": spread,
                "total_r10_set": total_r10_set,
                "calibration_sec": calib,
                "calibration_cpu_sec": calib_cpu,
                "cold_cache": cold_cache,
                "load_avg_start": load_start,
                "load_avg_end": load_end,
                "contended": contended,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
