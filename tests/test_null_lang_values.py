"""VALUE-level regression for the ADVICE-r7 NULL-lang divergence: the
null-row sweep (test_null_row_input.py) only asserts execution, so an
inner counts-join silently dropping the NULL-lang group passed it. This
fixture gives the NULL lang a real population (non-null doc_ids/texts)
and runs the full DuckDB oracle comparison — the oracle's count window
emits the NULL-lang partition, so the engine must too."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries
from thread_based_map_reduce_spark.plans.oracle_check import (
    compare_query,
    duck_connection,
)

queries()  # force catalog load

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# every query that groups documents by lang and joins per-lang metadata
# back — the family the ADVICE finding applies to
_NULL_LANG_QUERIES = ("reservoir_sample_per_key", "mix_quota_exact_manifest")


@pytest.fixture(scope="module")
def nulllang_sf(tmp_path_factory):
    """sf0.001 with three extra documents rows whose lang is NULL but
    whose other columns are real values (unlike the all-NULL sweep row,
    these form a populated NULL-lang group the sample must emit)."""
    d = tmp_path_factory.mktemp("nulllang_sf")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t != "documents":
            os.symlink(src, str(d / f"{t}.parquet"))
            continue
        tab = pq.read_table(src)
        max_id = max(v.as_py() for v in tab.column("doc_id"))
        texts = ["null lang alpha beta", "null lang gamma", "null lang delta"]
        extra = pa.table(
            {
                "doc_id": pa.array(
                    [max_id + 1, max_id + 2, max_id + 3], type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array([None, None, None], type=pa.string()),
                "source": pa.array(["web", "web", "web"], type=pa.string()),
                "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
            }
        ).cast(pa.schema([pa.field(f.name, f.type) for f in tab.schema]))
        tab = tab.replace_schema_metadata(None)
        pq.write_table(pa.concat_tables([tab, extra]), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_nulllang(nulllang_sf):
    return duck_connection(nulllang_sf)


@pytest.mark.parametrize("name", _NULL_LANG_QUERIES)
def test_null_lang_group_value_gated(spark, duck_nulllang, nulllang_sf, name):
    res = compare_query(
        spark, duck_nulllang, name, CATALOG[name].fn, CATALOG[name].oracle, nulllang_sf
    )
    assert res.ok, res.problems


def test_null_lang_group_present(spark, nulllang_sf):
    # belt-and-braces beyond the hash: the NULL-lang group itself appears,
    # with its true population of 3
    rows = CATALOG["reservoir_sample_per_key"].fn(spark, nulllang_sf).collect()
    null_rows = [r for r in rows if r["lang"] is None]
    assert len(null_rows) == 3
    assert all(r["n_docs"] == 3 for r in null_rows)
