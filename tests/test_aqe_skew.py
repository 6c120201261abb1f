"""AQE skew-join split: the runtime answer to a hot join key (SCALE.md §1).

A 200k-row hot key next to 100 normal keys would pin one sort-merge task
to ~95% of the data; with adaptive skew-join enabled (the engine default,
``session.pin_session_defaults``) the runtime re-plans the oversized
partition into advisory-sized splits — the executed plan's join node is
annotated ``skew=true``. This is the no-code-change half of the skew
story; the explicit salting half is ``agg_salted_skew`` /
``join_salted_skew`` in the catalog."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(52000).select(
            F.when(F.col("id") < 50000, 0)
            .otherwise((F.col("id") % 100) + 1)
            .alias("k"),
            F.concat(
                F.lit("payload-payload-payload-payload-"),
                F.col("id").cast("string"),
            ).alias("pay"),
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right.hint("merge"), "k")
        # run THIS DataFrame's own action: AQE annotates the final plan
        # only on the executed QueryExecution (count() would plan its own)
        assert len(j.collect()) == 52000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
