"""Invariant tests for the corpus-curation family (operators/curation.py).

The DuckDB oracles already pin exact values (tests/test_catalog_oracle.py);
these assert the *semantic contracts* a training pipeline relies on —
chunk coverage, fixed shard sizes, sampling determinism — independently of
any oracle formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.curation import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    EVAL_MOD,
    MIX_MAX_WEIGHT,
    MIX_RES,
    PACK_SEQ_LEN,
    PACK_SHARDS,
    SHARD_SIZE,
    q_decontam_eval_overlap,
    q_domain_mix_weights,
    q_dup_span_fraction,
    q_mix_quota_sample,
    q_pack_sequences_stats,
    q_rag_chunk_stats,
    q_shard_assignment_stats,
)
from thread_based_map_reduce_spark.functions.textfns import tokens
from thread_based_map_reduce_spark.sources.registry import load_table


def test_chunks_cover_every_token_exactly(spark, sf_dir):
    """Chunks tile each doc: contiguous ids, full-width interior chunks,
    and the last chunk ends exactly at the doc's last token."""
    ntok_by_doc = {
        r.doc_id: r.ntok
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens("text")).alias("ntok"))
        .collect()
    }
    chunks: dict[int, list] = {}
    for r in q_rag_chunk_stats(spark, sf_dir).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    assert set(chunks) == set(ntok_by_doc)
    for doc_id, rows in chunks.items():
        rows.sort(key=lambda r: r.chunk_id)
        ntok, nch = ntok_by_doc[doc_id], len(rows)
        assert [r.chunk_id for r in rows] == list(range(1, nch + 1))
        for r in rows[:-1]:
            assert r.n_chunk_tokens == CHUNK_SIZE
        # last chunk reaches exactly the final token
        last_start = CHUNK_STRIDE * (nch - 1)
        assert last_start + rows[-1].n_chunk_tokens == max(ntok, rows[-1].n_chunk_tokens)
        if ntok > CHUNK_SIZE:
            # a further chunk would start past the end OR add nothing new
            assert last_start + CHUNK_SIZE >= ntok
            assert rows[-1].n_chunk_tokens >= 1


def test_shards_have_fixed_size_except_last(spark, sf_dir):
    rows = sorted(
        q_shard_assignment_stats(spark, sf_dir).collect(), key=lambda r: r.shard_id
    )
    total = sum(r.n_docs for r in rows)
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r.n_docs == SHARD_SIZE
    assert 1 <= rows[-1].n_docs <= SHARD_SIZE
    assert total == load_table(spark, sf_dir, "documents").count()
    # the hash permutation must mix languages within every full shard
    for r in rows:
        if r.n_docs == SHARD_SIZE:
            assert r.n_langs >= 2


def test_quota_sampling_is_deterministic_and_bounded(spark, sf_dir):
    a = {r.lang: r.asDict() for r in q_mix_quota_sample(spark, sf_dir).collect()}
    b = {r.lang: r.asDict() for r in q_mix_quota_sample(spark, sf_dir).collect()}
    assert a == b  # pure function of doc_id — rerun-identical
    for row in a.values():
        assert 0 <= row["n_sampled"] <= row["n_docs"]
        assert 0 <= row["quota_threshold"] <= MIX_RES
        if row["quota_threshold"] == MIX_RES:
            assert row["n_sampled"] == row["n_docs"]


def test_decontam_excludes_eval_docs_and_flags_consistently(spark, sf_dir):
    rows = q_decontam_eval_overlap(spark, sf_dir).collect()
    assert rows, "train split empty"
    for r in rows:
        assert r.doc_id % EVAL_MOD != 0  # eval docs never scored
        assert 0 <= r.hit_grams <= r.n_grams
        if r.contaminated:
            assert r.hit_grams >= 0.5 * r.n_grams and r.n_grams > 0
        if r.n_grams:
            assert abs(r.contam_frac - r.hit_grams / r.n_grams) < 1e-6


def test_dup_span_fraction_bounds(spark, sf_dir):
    rows = q_dup_span_fraction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dup_spans <= r.n_spans or r.dup_spans == 0
        assert 0.0 <= r.dup_frac <= 1.0


def test_pack_sequences_accounting(spark, sf_dir):
    """Packing conserves docs/tokens and cannot split more docs than there
    are window boundaries."""
    corpus_docs = load_table(spark, sf_dir, "documents").count()
    rows = q_pack_sequences_stats(spark, sf_dir).collect()
    assert {r.shard_id for r in rows} <= set(range(PACK_SHARDS))
    assert sum(r.n_docs for r in rows) == corpus_docs
    for r in rows:
        want_seq = -(-r.total_tokens // PACK_SEQ_LEN)  # ceil
        assert r.n_sequences == want_seq
        # each of the n_sequences-1 interior boundaries splits at most one doc
        assert 0 <= r.n_docs_split <= max(r.n_sequences - 1, 0)
        assert 0.0 <= r.pad_frac < 1.0
        # pad_frac is exactly the tail shortfall of the last window
        pad = r.n_sequences * PACK_SEQ_LEN - r.total_tokens
        assert abs(r.pad_frac - pad / (r.n_sequences * PACK_SEQ_LEN)) < 1e-6


def test_domain_mix_weights_contract(spark, sf_dir):
    """Shares sum to 1, the target mix is uniform, weights respect the cap,
    and the KL sum is non-negative (Gibbs)."""
    rows = q_domain_mix_weights(spark, sf_dir).collect()
    langs = len(rows)
    assert langs >= 2
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.target_share - round(1.0 / langs, 6)) < 1e-9
        assert 0.0 < r.mix_weight <= MIX_MAX_WEIGHT
        uncapped = r.target_share / r.token_share
        assert abs(r.mix_weight - min(MIX_MAX_WEIGHT, uncapped)) < 1e-3
    assert sum(r.kl_term for r in rows) >= -1e-6
