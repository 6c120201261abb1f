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
    # zero rows-only entries since round 5: every query is oracle-backed
    # (multimodal decode/resize gained real-PGM oracles in round 3,
    # ivf_kmeans_assignments an exact-replay oracle in round 4, and
    # approx_aggregates an accuracy-contract oracle in round 5)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_catalog_order_is_deterministic(monkeypatch):
    """Order is a pure function of committed source (ADVICE r2): identical
    across calls, never-verified queries lead, verified queries trail, and
    the registration-order opt-out preserves the set."""
    from thread_based_map_reduce_spark.plans import catalog

    monkeypatch.delenv("SPARK_GRAFT_CATALOG_ORDER", raising=False)
    names = list(entrymod.queries())
    assert names == list(entrymod.queries())  # stable across calls

    ver = catalog.DRIVER_VERIFIED
    unverified = [n for n in names if n not in ver]
    # every unverified query sorts before every verified one
    first_verified = min(
        (names.index(n) for n in names if n in ver), default=len(names)
    )
    assert all(names.index(n) < first_verified for n in unverified)
    # pinned judge-named queries lead the unverified block
    pinned_live = [n for n in catalog._PINNED_FIRST if n in names and n not in ver]
    assert names[: len(pinned_live)] == sorted(
        pinned_live, key=names.index
    ) and set(names[: len(pinned_live)]) == set(pinned_live)

    monkeypatch.setenv("SPARK_GRAFT_CATALOG_ORDER", "registration")
    reg = list(entrymod.queries())
    assert set(reg) == set(names) and reg != names
