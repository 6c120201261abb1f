"""Generic MapReduce surface — the reference-parity core.

The reference's entire public API is: user supplies ``map`` (one (K1,V1) in,
0..N (K2,V2) out via ``emit2``) and ``reduce`` (one key's full value vector
in, 0..N (K3,V3) out via ``emit3``) — ``MapReduceClient.h:55-65`` — and the
engine runs map → per-task sort → shuffle(group-by-key) → reduce
(``MapReduceFramework.cpp:270-295``).

Here the same contracts run on Spark:

- ``map_fn`` executes inside Arrow-batched ``mapInPandas`` (R2): a flatMap —
  rows in, any number of intermediate rows out. Emitting zero rows is a
  filter; emitting many is an explode. (``emit2`` "any number of times",
  ``MapReduceClient.h:57-58``.)
- the shuffle + group-by-key (R5-R7) is Spark's sort/hash exchange on
  ``key_cols`` — the engine-owned part, exactly like the reference;
- ``reduce_fn`` executes inside ``groupBy(...).applyInPandas`` (R8): it
  receives ONE key's complete intermediate vector as a pandas DataFrame and
  may emit 0..N output rows. Value order within the group is unspecified,
  matching SURVEY §1.4 (the reference concatenates per-thread vectors in
  arbitrary order).

Semantic parity notes:

- Key equality: the reference derives equality from ordering
  (``is_equal``, ``MapReduceFramework.cpp:163-165``). Spark groups by
  hash/binary equality of the key columns, which coincides with ordering
  equality for all atomic SQL types except float ``-0.0``/``0.0`` and NaN.
  :func:`run_map_reduce` therefore normalizes float/double key columns
  before grouping (``-0.0`` → ``0.0``; every NaN bit pattern → one
  canonical NaN), so grouping matches the reference's ordering-derived
  equality (tests/test_property_mapreduce.py). One Arrow-lane caveat:
  pandas uses NaN as its missing marker, so a NaN key emitted by
  ``map_fn`` crosses the Arrow boundary as NULL — it still lands in
  exactly ONE group (Spark groups nulls together), but surfaces as NULL
  rather than NaN in the output key.
- Memory: one group's whole value vector is materialized for ``reduce_fn``
  — the identical limitation the reference has (its per-key vector,
  ``MapReduceFramework.cpp:184-194``), but per group rather than the whole
  dataset, and spilled/partitioned across executors.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

MapFn = Callable[[Any], Iterable[tuple]]
ReduceFn = Callable[[tuple, pd.DataFrame], Iterable[tuple]]


def _schema_columns(ddl: str) -> list[str]:
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(ddl).fields]


def _map_stage(df: DataFrame, map_fn: MapFn, map_schema: str) -> DataFrame:
    """flatMap via mapInPandas: Arrow batches in, per-row map_fn emissions out."""
    columns = _schema_columns(map_schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False):
                out.extend(map_fn(row))
            yield pd.DataFrame(out, columns=columns)

    return df.mapInPandas(run, schema=map_schema)


def _normalize_float_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rewrite float/double key columns so hash-equality grouping matches
    the reference's ordering-derived ``is_equal`` (-0.0 and 0.0 compare
    equal under ``<``; NaN never compares less — one NaN group):
    ``-0.0`` → ``0.0`` and any NaN → the canonical NaN."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    for k in key_cols:
        dt = df.schema[k].dataType
        if isinstance(dt, (FloatType, DoubleType)):
            c = F.col(k)
            df = df.withColumn(
                k,
                F.when(F.isnan(c), F.lit(float("nan")).cast(dt))
                .when(c == 0.0, F.lit(0.0).cast(dt))  # true for -0.0 too
                .otherwise(c),
            )
    return df


def run_map_reduce(
    df: DataFrame,
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    *,
    map_schema: str,
    out_schema: str,
    key_cols: list[str] | tuple[str, ...],
) -> DataFrame:
    """The reference pipeline as one lazy DataFrame plan.

    map (R2) → shuffle/group on ``key_cols`` (R5-R7, Spark exchange) →
    reduce (R8). Returns a lazy DataFrame — trigger it with an action or
    hand it to :func:`start_map_reduce_job` for the reference's async
    JobHandle semantics.

    - ``map_fn(row)``: called once per input row (a pandas namedtuple);
      returns an iterable of tuples matching ``map_schema``.
    - ``reduce_fn(key, group_pdf)``: called once per distinct key with the
      full intermediate vector; returns an iterable of tuples matching
      ``out_schema``.
    """
    key_cols = list(key_cols)
    mapped = _normalize_float_keys(_map_stage(df, map_fn, map_schema), key_cols)
    out_columns = _schema_columns(out_schema)

    def run_reduce(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(list(reduce_fn(key, pdf)), columns=out_columns)

    # reduce_fn cost scales with KEY COUNT, not shuffle bytes — AQE's
    # byte-based partition coalescing would collapse a small-bytes /
    # many-keys shuffle to one partition and serialize every per-key
    # Python call on one core. An explicit repartition on the group keys
    # plans as REPARTITION_BY_NUM (exempt from coalescing) and satisfies
    # the groupBy's ClusteredDistribution, so it stays a single exchange.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    mapped = mapped.repartition(n_part, *key_cols)
    return mapped.groupBy(*key_cols).applyInPandas(run_reduce, schema=out_schema)
