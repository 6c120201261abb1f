"""Every catalog query must EXECUTE with one GIANT document in the
corpus — the straggler-row case at 100 TB: one pathological multi-
hundred-KB document landing in a task that otherwise holds average-sized
rows. The explosive columns are all text-derived (tokens, shingles,
char n-grams, span grams): a query whose per-row cost is super-linear in
document length, or whose explode materializes per-element state it
never bounds, turns that one row into the task that never finishes —
locally it shows up as a hang or an OOM, at scale as a straggler that
AQE cannot split (skew-join splitting works on KEYS, not on one row).

The giant text cycles the corpus's OWN vocabulary (Heaps-law realistic:
long documents repeat their vocabulary, so distinct-token state stays
bounded while positional state — token count, n-gram count, span count
— grows ~400×). Companion to the empty-input / all-NULL-row /
single-row sweeps; like them it asserts completion, plus spot checks
that the giant row actually flowed through the token path (not silently
truncated or dropped).
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

#: target size of the giant text (chars). ~400x the sf0.001 average doc
#: (306 chars): big enough that an O(len^2) per-row term or an unbounded
#: per-element materialization is felt, small enough for the local suite.
GIANT_CHARS = 120_000


def _giant_text(vocab: list[str]) -> str:
    out: list[str] = []
    n = 0
    i = 0
    while n < GIANT_CHARS:
        w = vocab[i % len(vocab)]
        out.append(w)
        n += len(w) + 1
        i += 1
    return " ".join(out)


@pytest.fixture(scope="session")
def giant_sf(tmp_path_factory):
    """sf0.001 with doc 0's text replaced by a ~120k-char document."""
    d = tmp_path_factory.mktemp("giant_sf")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t != "documents":
            os.symlink(src, str(d / f"{t}.parquet"))
            continue
        tab = pq.read_table(src)
        texts = tab.column("text").to_pylist()
        vocab = sorted({w for x in texts if x for w in x.split(" ") if w})
        texts[0] = _giant_text(vocab)
        n_chars = tab.column("n_chars").to_pylist()
        n_chars[0] = len(texts[0])
        tab = tab.set_column(
            tab.schema.get_field_index("text"), "text", pa.array(texts)
        ).set_column(
            tab.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array(n_chars, type=pa.int64()),
        )
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


def test_giant_row_flows_through_token_path(spark, giant_sf):
    # the giant doc must be visible at FULL size to the token pipeline —
    # otherwise every "completes fine" below is vacuous. Exact parity:
    # Spark's corpus-wide token total must equal the Python recount over
    # the fixture file (which includes the ~20k-token giant doc).
    tab = pq.read_table(os.path.join(giant_sf, "documents.parquet"))
    expected = sum(
        len([w for w in (x or "").split(" ") if w])
        for x in tab.column("text").to_pylist()
    )
    rows = CATALOG["text_token_stats"].fn(spark, giant_sf).collect()
    got = sum(r.total_tokens for r in rows)
    assert got == expected, f"giant doc truncated: {got} != {expected}"
    assert expected > 20_000  # the giant row dominates the corpus total


@pytest.mark.sweep
@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_runs_with_giant_row(spark, giant_sf, name):
    rows = CATALOG[name].fn(spark, giant_sf).collect()
    assert isinstance(rows, list)
