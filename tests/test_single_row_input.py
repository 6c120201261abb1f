"""Every catalog query must EXECUTE on single-row tables — the
degenerate-statistics case (variance of one sample, a 1-level factor, an
empty A/B arm after hash assignment) that ANSI-mode division turns from
a NULL into a dead job. Found at introduction: `ab_test_zstat` divided
by an empty variant's zero count, `chi2_lang_source_independence`
divided by a zero Cramér mindim when a factor has one level.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def onerow_sf(tmp_path_factory):
    """The first row of every sf0.001 table."""
    d = tmp_path_factory.mktemp("onerow_sf")
    for t in TABLES:
        tab = pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 1), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.sweep
@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_runs_on_single_row(spark, onerow_sf, name):
    rows = CATALOG[name].fn(spark, onerow_sf).collect()
    assert isinstance(rows, list)
