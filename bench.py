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
# The 22-query set BENCH_r11 timed (gopher_repetition_rules joined in
# round 12, VERDICT r11 #5) — same continuity rule.
_R11_SET = _R10_SET | {"dedup_exact_substring_spans"}


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
    # smallest scale factor so first-query timings aren't JVM startup.
    # The warmup dir is derived from sf_dir's PARENT (ADVICE r11: a
    # hardcoded /root/testdata/sf0.001 silently no-ops when that fixture
    # tree is absent, and calibration pass 1 then absorbs plan-compile
    # time); fall back to sf_dir itself when no sibling sf0.001 exists.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    import glob as _glob

    if not _glob.glob(os.path.join(warm_dir, "*.parquet")):
        print(
            f"WARNING: warmup dir {warm_dir} matches no parquet files; "
            "codegen warmup is skipped and calibration pass 1 will absorb "
            "plan-compile time.",
            file=sys.stderr,
        )
    materialize(spark.range(1_000_000).selectExpr("sum(id) AS s"))
    try:
        warm = CATALOG["charcount"].fn
        materialize(warm(spark, warm_dir))
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

    _calib_pass(warm_dir)  # plan-shape warmup, untimed
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
    # Write-path probe (VERDICT r11 #1): BENCH_r11 read 4-14x inflation
    # concentrated in shuffle/checkpoint-heavy queries while the scan
    # probe, the CPU probe, AND loadavg all stamped healthy — the one
    # resource every probe above is blind to is the WRITE path of the
    # directory Spark spills shuffle and checkpoint blocks into. Probe =
    # write + fsync ~100 MB of incompressible parquet into the actual
    # spark.local.dir (the same filesystem those blocks hit), via the
    # same Spark parquet writer the engine uses; plan shape pre-warmed so
    # codegen lands outside the timing. Quiet-box reference in
    # BASELINE.md.
    import shutil

    local_dir = spark.sparkContext.getConf().get(
        "spark.local.dir", "/tmp"
    ).split(",")[0]
    probe_dir = os.path.join(local_dir, "tbmr-bench-write-probe")

    def _write_probe(n_rows: int) -> float:
        # xxhash64 values are incompressible, so parquet size ~= 16 B/row
        df = spark.range(n_rows).selectExpr(
            "xxhash64(id) AS a", "xxhash64(id + 1) AS b"
        )
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(probe_dir)
        for root, _dirs, files in os.walk(probe_dir):
            for fn in files:
                fd = os.open(os.path.join(root, fn), os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
        return round(time.perf_counter() - t0, 3)

    try:
        _write_probe(100_000)  # untimed shape warmup (~1.6 MB)
        calib_write = _write_probe(6_500_000)  # ~104 MB
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)
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
    total_r11_set = round(
        sum(t for n, t in timings.items() if n in _R11_SET), 3
    )

    # Environment stamps. VERDICT r11 #1: the 1-minute loadavg both
    # over-fires (stale average from a just-finished suite stamped the
    # judge's quiet 23.7 s run contended) and under-fires (r11's 79.7 s
    # write-contended artifact stamped healthy on every signal), so the
    # `contended` verdict is now derived from the three MEASURED probes —
    # warm scan (read path), calib_cpu (CPU steal/frequency), calib_write
    # (shuffle/checkpoint write path) — each against its quiet-box
    # reference from BASELINE.md. Loadavg is still recorded (and exposed
    # as contended_loadavg) for history, but no longer decides.
    cpu_ref = float(os.environ.get("SPARK_GRAFT_BENCH_CPU_REF", "0.45"))
    write_ref = float(os.environ.get("SPARK_GRAFT_BENCH_WRITE_REF", "0.6"))
    scan_ref = float(os.environ.get("SPARK_GRAFT_BENCH_SCAN_REF", "3.5"))
    probe_verdicts = {
        # warm-scan ref is sf0.1-specific (it scales with data volume);
        # at other scale factors the read-path signal abstains
        "scan": (sf == 0.1 and calib[1] > 2.0 * scan_ref),
        "cpu": calib_cpu > 1.5 * cpu_ref,
        "write": calib_write > 3.0 * write_ref,
    }
    contended = any(probe_verdicts.values())
    contended_loadavg = load_start[0] > float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_THRESHOLD", "0.5")
    )
    if contended:
        fired = ", ".join(k for k, v in probe_verdicts.items() if v)
        print(
            f"WARNING: calibration probes ({fired}) read far above the "
            f"quiet-box references (scan {calib[1]}/{scan_ref} s, cpu "
            f"{calib_cpu}/{cpu_ref} s, write {calib_write}/{write_ref} s); "
            "timings will be inflated by external load — artifact marked "
            "contended=true. See BASELINE.md 'Reading a contended "
            "artifact'.",
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
                "total_r11_set": total_r11_set,
                "calibration_sec": calib,
                "calibration_cpu_sec": calib_cpu,
                "calibration_write_sec": calib_write,
                "cold_cache": cold_cache,
                "load_avg_start": load_start,
                "load_avg_end": load_end,
                "contended": contended,
                "contended_probes": probe_verdicts,
                "contended_loadavg": contended_loadavg,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
