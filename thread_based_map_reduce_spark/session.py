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

from pyspark.sql import SparkSession

__all__ = ["get_spark", "pin_session_defaults"]


def get_spark(app_name: str = "tbmr-spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for local[N] analytics.

    - AQE on: runtime coalescing, skew-join splitting — our stand-in for the
      reference's dynamic work-queue load balancing
      (``MapReduceFramework.cpp:213-226``), but across partitions.
    - shuffle.partitions ≈ cores: local mode has no network; 200 default
      over-parallelizes small scale factors.
    - Arrow on: every Python-side operator in this package is Arrow-batched.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
