"""Value-level assertions for the round-8 growth entries, beyond the
catalog-wide oracle sweep: each new operator's SEMANTIC claim is checked
(leakage really is zero under the cluster split; DSIR really enriches the
target domain; theta-sketch errors really sit near the 1/sqrt(K) bound;
temperature allocation really flattens the mix), not just engine parity.
"""

from __future__ import annotations

import pytest

from thread_based_map_reduce_spark.operators.curation import (
    DSIR_TARGET_LANG,
    MIX_TOKEN_BUDGET,
    q_dsir_importance_select,
    q_temperature_mix_allocation,
)
from thread_based_map_reduce_spark.operators.dedup import q_leakage_safe_split
from thread_based_map_reduce_spark.operators.relational_ext import (
    q_theta_sketch_setops,
)

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_10 = "/root/testdata/sf0.01"


class TestLeakageSafeSplit:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        return {r["split"]: r for r in q_leakage_safe_split(spark, SF_DIR).collect()}

    def test_cluster_split_never_leaks(self, rows):
        # 0 by construction (split is a function of the cluster id) — this
        # is the operator's contract, asserted on the computed output.
        assert all(r["leaky_pairs_cluster_split"] == 0 for r in rows.values())

    def test_doc_hash_split_would_leak(self, rows):
        # the motivating number: the naive doc_id-hash split scatters at
        # least one verified near-dup pair across splits on this corpus
        # (if the corpus ever stops having cross-split pairs the fixture,
        # not the operator, changed — see FIXTURES.md)
        assert any(r["leaky_pairs_doc_split"] > 0 for r in rows.values())

    def test_partition_of_corpus(self, rows, spark):
        import duckdb

        n_docs = duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        assert sum(r["n_docs"] for r in rows.values()) == n_docs
        assert sum(r["n_clusters"] for r in rows.values()) >= len(rows)
        assert set(rows) <= {"train", "val", "test"}
        assert "train" in rows and rows["train"]["n_docs"] > 0


class TestDsirImportanceSelect:
    def test_target_domain_enriched(self, spark):
        rows = q_dsir_importance_select(spark, SF_DIR).collect()
        assert len(rows) == 50
        # selection must ENRICH the target language well beyond its
        # natural share (~44% of the corpus): the whole point of DSIR
        share = sum(1 for r in rows if r["lang"] == DSIR_TARGET_LANG) / len(rows)
        assert share >= 0.6
        # descending weight with doc_id tiebreak (integer micronats — the
        # order-independent sum the oracle replays exactly)
        weights = [r["weight_micronat"] for r in rows]
        assert weights == sorted(weights, reverse=True)


class TestThetaSketchSetops:
    def test_error_bounds_and_mode(self, spark):
        row = q_theta_sketch_setops(spark, SF_DIR_10).collect()[0]
        # at sf0.01 both sets exceed K=256 -> estimation mode (theta < 2^60)
        assert row["theta"] < 2**60
        assert row["n_union_retained"] >= row["k"]
        # ~1/sqrt(K) ~ 6%; generous deterministic margins (the values are
        # fixed for this corpus: 6.9% and 18.6%)
        assert row["union_rel_err"] < 0.15
        assert row["inter_rel_err"] < 0.35
        assert abs(row["jaccard_est"] - row["jaccard_true"]) < 0.1

    def test_exact_mode_when_small(self, spark):
        # sf0.001 has |A| >= K too, so force exact mode semantics at the
        # math level instead: retained counts never exceed the true counts
        # scaled into the sampled region, and estimates bracket truth
        row = q_theta_sketch_setops(spark, SF_DIR).collect()[0]
        assert row["true_inter"] <= row["true_union"]
        assert 0 <= row["jaccard_est"] <= 1


class TestTemperatureMixAllocation:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        return q_temperature_mix_allocation(spark, SF_DIR_10).collect()

    def test_probabilities_normalize(self, rows):
        assert abs(sum(r["temp_prob"] for r in rows) - 1.0) < 1e-4
        assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-4
        assert sum(r["quota_tokens"] for r in rows) <= MIX_TOKEN_BUDGET

    def test_flattens_the_mix(self, rows):
        # alpha < 1 upsamples small languages and downsamples large ones
        by_n = sorted(rows, key=lambda r: r["n_tokens"])
        assert by_n[0]["upsample_weight"] > 1.0
        assert by_n[-1]["upsample_weight"] < 1.0
        # temperature probabilities are strictly flatter: max/min ratio
        # shrinks versus the natural shares
        nat = [r["natural_share"] for r in rows]
        tmp = [r["temp_prob"] for r in rows]
        assert max(tmp) / min(tmp) < max(nat) / min(nat)


class TestBpeTrainMerges:
    def test_merge_semantics(self, spark):
        from thread_based_map_reduce_spark.operators.text import (
            BPE_ROUNDS,
            q_bpe_train_merges,
        )

        rows = sorted(
            q_bpe_train_merges(spark, SF_DIR_10).collect(),
            key=lambda r: r["round"],
        )
        assert [r["round"] for r in rows] == list(range(1, BPE_ROUNDS + 1))
        for r in rows:
            assert r["merged"] == r["merge_left"] + r["merge_right"]
            assert r["pair_count"] > 0
        # every merge strictly shrinks the weighted token count (each
        # applied merge replaces two symbols with one) ...
        toks = [r["n_tokens_after"] for r in rows]
        assert all(a > b for a, b in zip(toks, toks[1:]))
        # ... and the merge count actually applied is bounded by the
        # counted adjacencies (overlaps can only reduce it)
        for a, b, row in zip(toks, toks[1:], rows[1:]):
            assert a - b <= row["pair_count"]
        # vocab grows by at most 1 per round (the new symbol; constituents
        # may or may not survive)
        vocabs = [r["vocab_after"] for r in rows]
        assert all(b <= a + 1 for a, b in zip(vocabs, vocabs[1:]))


class TestSimhashHammingPairs:
    def test_complete_vs_bruteforce(self, spark):
        # the pigeonhole claim: blocking loses NOTHING — the pair set must
        # equal the brute-force all-pairs hamming filter (computed here in
        # DuckDB over the same weighted fingerprints)
        import duckdb

        from thread_based_map_reduce_spark.operators.dedup import (
            SIMHASH64_HAM_K,
            q_dedup_simhash_hamming_pairs,
        )
        from thread_based_map_reduce_spark.plans.catalog import CATALOG

        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in q_dedup_simhash_hamming_pairs(spark, SF_DIR).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        oracle = CATALOG["dedup_simhash_hamming_pairs"].oracle
        # brute-force variant: swap the blocked candidate set for ALL pairs
        brute = oracle.replace(
            """blocks AS (""", """unused_blocks AS ("""
        ).replace(
            """cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM blocks x
            JOIN blocks y ON x.b = y.b AND x.v = y.v AND y.doc_id > x.doc_id
        )""",
            """cand AS (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM sims x JOIN sims y ON y.doc_id > x.doc_id
        )""",
        )
        want = {tuple(r) for r in con.execute(brute).fetchall()}
        assert got == want and len(got) > 0
        assert all(h <= SIMHASH64_HAM_K for _, _, h in got)

    def test_sized_blocks_stay_complete(self, spark):
        # the Manku multi-table sizing (more blocks -> wider table keys ->
        # fewer candidates) must not change the RESULT: pigeonhole
        # completeness holds at every block count the sizing rule can pick
        from thread_based_map_reduce_spark.operators.dedup import (
            simhash_hamming_pairs_impl,
            sized_simhash_blocks,
        )

        base = {
            tuple(r) for r in simhash_hamming_pairs_impl(spark, SF_DIR).collect()
        }
        for m in (5, 6):
            got = {
                tuple(r)
                for r in simhash_hamming_pairs_impl(
                    spark, SF_DIR, n_blocks=m
                ).collect()
            }
            assert got == base
        # the rule widens keys as the corpus grows
        assert sized_simhash_blocks(5_000) == 5
        assert sized_simhash_blocks(500_000) == 6


class TestWeightedSampleAres:
    def test_overrepresents_heavy_docs(self, spark):
        import duckdb

        from thread_based_map_reduce_spark.operators.curation import (
            ARES_K,
            q_weighted_sample_ares,
        )

        rows = q_weighted_sample_ares(spark, SF_DIR).collect()
        assert len(rows) == ARES_K
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, ARES_K + 1)
        )
        # the point of weighting: the selected docs' mean weight exceeds
        # the corpus mean (u^(1/w) keys favour heavy documents)
        corpus_avg = duckdb.sql(
            f"SELECT avg(n_chars) FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        sample_avg = sum(r["weight"] for r in rows) / len(rows)
        assert sample_avg > corpus_avg


class TestBpeApplyEncode:
    def test_compression_semantics(self, spark):
        from thread_based_map_reduce_spark.operators.text import q_bpe_apply_encode

        rows = q_bpe_apply_encode(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            # BPE can only merge: symbol count per doc is bounded by the
            # character count below and the word count above
            assert r["n_words"] <= r["n_bpe_symbols"] <= r["n_char_symbols"]
            assert 0 < r["compression"] <= 1.0
        # the trained merges must actually compress SOMETHING corpus-wide
        assert any(r["n_bpe_symbols"] < r["n_char_symbols"] for r in rows)


class TestHeldoutBackoffNll:
    def test_backoff_actually_fires(self, spark):
        import duckdb

        from thread_based_map_reduce_spark.operators.text import (
            HELDOUT_MOD,
            q_heldout_backoff_nll,
        )

        rows = q_heldout_backoff_nll(spark, SF_DIR).collect()
        n_eval = duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet' "
            f"WHERE doc_id % {HELDOUT_MOD} = 0"
        ).fetchone()[0]
        assert 0 < len(rows) <= n_eval
        # the raison d'etre: on held-out docs a substantial share of
        # trigrams is unseen in training, so the backoff tiers engage
        # (self-scored bigram NLL can never back off)
        assert sum(r["backoff_trigrams"] for r in rows) > 0
        for r in rows:
            assert 0 <= r["backoff_trigrams"] <= r["n_trigrams"]
            assert 0 <= r["oov_trigrams"] <= r["backoff_trigrams"]
            # NLL is positive (every scored probability < 1)
            assert r["nll_micronat"] > 0
