"""SparkSession factory.

The reference engine is configured with a single ``multiThreadLevel`` knob
(``MapReduceFramework.h:18-20``); our equivalent is the local[N] core count
plus shuffle parallelism. Defaults target the test box (local[32]) but the
builders here only *default* — any externally supplied session (e.g. the
driver's) works with every operator in this package, because query builders
pin the session-level settings they rely on (UTC timezone) at call time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["get_spark", "pin_session_defaults", "reliable_checkpoint"]


_TMPFS_AUTO_MIN_FREE = 32 * 1024**3  # bytes free on /dev/shm for auto mode


def _tmpfs_shuffle_ok(path: str) -> bool:
    """Decide whether shuffle/spill dirs may live on RAM-backed tmpfs."""
    flag = os.environ.get("TBMR_TMPFS_SHUFFLE")
    if flag is not None:
        return flag.strip().lower() in ("1", "true", "yes", "on")
    if not (os.path.isdir(path) and os.access(path, os.W_OK)):
        return False
    try:
        st = os.statvfs(path)
    except OSError:
        return False
    return st.f_bavail * st.f_frsize >= _TMPFS_AUTO_MIN_FREE


def get_spark(
    app_name: str = "tbmr-spark",
    cpus: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for local[N] analytics.

    - AQE on: runtime coalescing, skew-join splitting — our stand-in for the
      reference's dynamic work-queue load balancing
      (``MapReduceFramework.cpp:213-226``), but across partitions.
    - shuffle.partitions ≈ cores: local mode has no network; 200 default
      over-parallelizes small scale factors.
    - Arrow on: every Python-side operator in this package is Arrow-batched.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if extra_conf and SparkSession.getActiveSession() is not None:
        # getOrCreate silently ignores builder conf on reuse — a caller
        # relying on static conf (e.g. shuffle_metrics.py's event log)
        # would otherwise measure nothing with no error (ADVICE r6).
        import warnings

        warnings.warn(
            "get_spark(extra_conf=...) with an active session: static conf "
            f"{sorted(extra_conf)} will NOT be applied by getOrCreate; stop "
            "the active session first if you need it.",
            RuntimeWarning,
            stacklevel=2,
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("TBMR_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # 64 MiB: dimension tables (region/nation/supplier/customer/part)
        # stay broadcast-able well past sf0.1 so fact-side joins never shuffle
        # the big side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill files on tmpfs when the box has a LARGE one (the test
    # box mounts a 126 GiB /dev/shm; sf0.1 shuffle data is MBs). The
    # default /tmp sits on the system disk, whose I/O-wait — not CPU —
    # dominated the shuffle-heavy dedup timings on the shared box (BENCH
    # r4/r5 drift investigation: 98% idle CPU, load driven by iowait).
    # Gated (ADVICE r5): spill exists to relieve memory pressure, so
    # pointing it at RAM-backed tmpfs on an arbitrary host would consume
    # RAM (or hit ENOSPC) exactly when spilling matters. Auto mode
    # requires >= 32 GiB free on /dev/shm — a deliberate "big test box"
    # signature, far above the testdata's worst-case shuffle footprint;
    # TBMR_TMPFS_SHUFFLE=1 forces it on, =0 forces it off. A real cluster
    # sets spark.local.dir to executor-local NVMe; nothing here depends
    # on the knob.
    if _tmpfs_shuffle_ok("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/tbmr-spark-local")
    # Static conf (event log, etc.) for measurement harnesses; only
    # effective when this call actually CREATES the session — getOrCreate
    # ignores builder conf on reuse, so callers needing it must stop the
    # active session first (scripts/shuffle_metrics.py does).
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_defaults(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable conf this package's query semantics rely on.

    Called by every catalog query so results are deterministic even on a
    session we did not build (the driver supplies its own). Timestamps in
    the testdata parquet are UTC instants; DuckDB oracles see them as
    UTC-naive, so the session timezone must be UTC for string/date
    projections to agree.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage, fault-tolerantly when
    the session allows it (VERDICT r2 "what's wrong" #2).

    Iterative pipelines (``dedup_clusters`` label propagation,
    ``kmeans_train`` Lloyd rounds) and multi-consumer intermediates (the
    MinHash signature table) must cut lineage each round or the plan grows
    without bound. ``localCheckpoint()`` does that but stores blocks on
    executor-LOCAL disk/memory with no lineage left to recompute them: on a
    1000-executor cluster, ONE lost executor makes those partitions
    unrecoverable and fails the job. So:

    - if ``spark.checkpoint.dir`` is set (any production deployment points
      it at HDFS/S3), use reliable ``df.checkpoint()`` — blocks live in the
      cluster filesystem and survive executor loss;
    - else (local mode, tests) fall back to ``localCheckpoint()``, where
      executor == driver and the distinction is moot.

    Both are eager, so callers see identical materialize-now semantics.
    """
    sc = df.sparkSession.sparkContext
    # getCheckpointDir returns None unless spark.checkpoint.dir was set or
    # sc.setCheckpointDir was called.
    if sc.getCheckpointDir():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
