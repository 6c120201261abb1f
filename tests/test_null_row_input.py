"""Every catalog query must EXECUTE when each table carries an all-NULL
row — the poisoned-record case a 100 TB ingest always contains. JVM
expressions null-propagate for free; the historical failure mode is the
Python lanes (this sweep found eight at introduction: bytes(None) in
the four multimodal payload kernels, None.split in a MapReduce map_fn,
int(nan) in the grouped-agg pandas UDAF, and None vectors reaching both
k-means trainers' centroid math).

As with test_empty_input, the assertion is "executes and collects
without raising" — row values are the oracle gate's job, on clean data.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def nullrow_sf(tmp_path_factory):
    """sf0.001 plus one all-NULL row appended to every table."""
    d = tmp_path_factory.mktemp("nullrow_sf")
    for t in TABLES:
        tab = pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet"))
        nulls = pa.table(
            {f.name: pa.array([None], type=f.type) for f in tab.schema},
            schema=tab.schema,
        )
        pq.write_table(pa.concat_tables([tab, nulls]), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.sweep
@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_runs_with_null_row(spark, nullrow_sf, name):
    fn = CATALOG[name].fn
    rows = fn(spark, nullrow_sf).collect()
    assert isinstance(rows, list)
