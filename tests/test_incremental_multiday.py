"""Multi-day incremental-store equivalence (VERDICT r7 #6): N append
cycles to the signature store, then prove that day-N batch pairs computed
FROM THE EVOLVING STORE equal a from-scratch run on the unioned corpus.
sigstore_append_compact's catalog gate proves one append+compact cycle is
value-preserving in CONTENT; this extends the guarantee across TIME — the
property a daily-ingest deployment actually relies on: no pair is lost or
invented however many appends (and an interleaved compaction) the store
has absorbed.

Day split: doc_id % 4 == d is day d's batch (orthogonal to the catalog
entries' % 10 split, so this test never touches the memoized per-sf_dir
store)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.dedup import (
    _bands_of_combined,
    _signature_combined,
    compact_signature_store,
    read_store_tables,
    store_incremental_pairs,
    write_store_tables,
)
from thread_based_map_reduce_spark.sources.registry import load_table

N_DAYS = 4  # days 0..2 accumulate in the store; day 3 is the probe batch


def _pairs_set(df):
    return {
        (r["doc_corpus"], r["doc_new"], r["jaccard"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def multiday(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents")
    days = [docs.where(F.col("doc_id") % N_DAYS == d) for d in range(N_DAYS)]
    store = str(tmp_path_factory.mktemp("multiday_store"))
    write_store_tables(spark, days[0], store, mode="overwrite")  # day 0
    for d in range(1, N_DAYS - 1):
        write_store_tables(spark, days[d], store, mode="append")  # days 1..N-2
    return docs, days, store


def test_multiday_store_equals_from_scratch(spark, sf_dir, multiday):
    docs, days, store = multiday
    probe = _signature_combined(days[N_DAYS - 1])
    corpus_bands, corpus_tsets = read_store_tables(spark, store)
    via_store = _pairs_set(
        store_incremental_pairs(corpus_bands, corpus_tsets, probe)
    )
    # from-scratch: same join definition, corpus relations derived in-plan
    # from the unioned day-0..N-2 documents — no store, no appends
    corpus = _signature_combined(docs.where(F.col("doc_id") % N_DAYS != N_DAYS - 1))
    scratch = _pairs_set(
        store_incremental_pairs(
            _bands_of_combined(corpus), corpus.select("doc_id", "ts"), probe
        )
    )
    assert via_store == scratch
    assert len(via_store) > 0  # the equivalence must be over a non-empty set


def test_multiday_store_survives_compaction(spark, sf_dir, multiday):
    docs, days, store = multiday
    probe = _signature_combined(days[N_DAYS - 1])
    before = _pairs_set(
        store_incremental_pairs(*read_store_tables(spark, store), probe)
    )
    audit = compact_signature_store(spark, store)
    assert audit["files_after"] <= audit["files_before"]
    after = _pairs_set(
        store_incremental_pairs(*read_store_tables(spark, store), probe)
    )
    assert before == after


def test_multiday_store_rowcounts_match_union(spark, sf_dir, multiday):
    docs, days, store = multiday
    corpus_bands, corpus_tsets = read_store_tables(spark, store)
    corpus = _signature_combined(docs.where(F.col("doc_id") % N_DAYS != N_DAYS - 1))
    assert corpus_tsets.count() == corpus.count()
    assert corpus_bands.count() == _bands_of_combined(corpus).count()
    # appends never duplicate a doc: every doc_id appears exactly once
    assert corpus_tsets.select("doc_id").distinct().count() == corpus_tsets.count()
