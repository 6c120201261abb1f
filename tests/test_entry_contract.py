"""Driver-contract safety net: __spark_entry__ must expose exactly what
the driver consumes, shaped the way it consumes it."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"ch", "cnt"}


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 90
    # every oracle belongs to a query; every entry is callable / a string
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
    # rows-only entries are the documented engine-specific few
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "approx_aggregates",
        "multimodal_decode_stats",
        "multimodal_resize_thumbs",
        "ivf_kmeans_assignments",
    }
