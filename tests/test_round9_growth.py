"""Round-9 growth and fix tests.

1. BPE dry-round guard (ADVICE r8 medium): a corpus whose words are all
   single characters produces an EMPTY pair table in round 1 — before the
   fix, the argmax crossJoin annihilated the vocabulary table and both BPE
   entries returned zero rows; the DuckDB oracle had the identical
   `FROM w{p}, b{r}` cross join so the parity gate was structurally blind
   to it. The fix (LEFT JOIN ON TRUE + null-guard, mirrored in both
   engines) must leave the vocabulary intact: train emits no merge rows,
   apply reports compression = 1.0 for every document.

2. Corpus-alphabet invariant (ADVICE r8 low): the BPE marker scheme
   (chr(31)/chr(30) symbol delimiters, tab tie-break) and the tab-joined
   n-gram keys in heldout_backoff_nll / DSIR assume corpus tokens never
   contain these control characters. A token containing them corrupts the
   symbol representation identically in Spark and DuckDB, so the oracle
   gate cannot catch it — this fixture invariant fails LOUDLY instead if
   a future testdata change breaks the assumption.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thread_based_map_reduce_spark.operators.text import (
    q_bpe_apply_encode,
    q_bpe_train_merges,
)
from thread_based_map_reduce_spark.plans.catalog import CATALOG
from thread_based_map_reduce_spark.plans.oracle_check import (
    compare_query,
    duck_connection,
)

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def singlechar_sf(tmp_path_factory):
    """A dataset dir whose documents are ALL single-character words (the
    ADVICE r8 repro: every BPE round is dry), other tables empty."""
    d = tmp_path_factory.mktemp("singlechar_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SF_SMOKE, f"{t}.parquet"))
        if t == "documents":
            docs = pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "text": pa.array(["a b a b", "b a a"], type=pa.string()),
                    "lang": pa.array(["en", "en"], type=pa.string()),
                    "source": pa.array(["web", "web"], type=pa.string()),
                    "n_chars": pa.array([7, 5], type=pa.int64()),
                }
            ).cast(pa.schema([schema.field(i) for i in range(len(schema.names))]))
            pq.write_table(docs, str(d / f"{t}.parquet"))
        else:
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_bpe_dry_round_preserves_vocabulary(spark, singlechar_sf):
    # Every round is dry (no adjacent symbol pair anywhere) -> zero merge
    # rows, but the vocabulary table must SURVIVE: each word encodes to
    # exactly its character symbols, compression exactly 1.0.
    train = q_bpe_train_merges(spark, singlechar_sf).collect()
    assert train == [], f"dry rounds must emit no merge rows, got {train}"
    enc = {r["doc_id"]: r for r in q_bpe_apply_encode(spark, singlechar_sf).collect()}
    assert set(enc) == {1, 2}, "apply lost documents (vocabulary annihilated?)"
    for r in enc.values():
        assert r["n_bpe_symbols"] == r["n_char_symbols"]
        assert r["compression"] == 1.0


def test_bpe_dry_round_oracle_parity(spark, singlechar_sf):
    # The guard must stay engine-identical: both BPE oracles run the same
    # LEFT JOIN ON TRUE + CASE null-guard, so the driver-style comparison
    # holds on the dry-round fixture too (rows + schema + value hash).
    con = duck_connection(singlechar_sf)
    for name in ("bpe_train_merges", "bpe_apply_encode"):
        q = CATALOG[name]
        res = compare_query(spark, con, name, q.fn, q.oracle, singlechar_sf)
        assert res.ok, f"{name}: {res.problems}"


def test_bpe_mixed_dry_rounds(spark, tmp_path):
    # One merge is possible ('ab' everywhere), then rounds 2..N are dry:
    # the guard must let round 1 fire and rounds 2+ no-op without damage.
    d = tmp_path / "mixed_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SF_SMOKE, f"{t}.parquet"))
        if t == "documents":
            docs = pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "text": pa.array(["ab ab c"], type=pa.string()),
                    "lang": pa.array(["en"], type=pa.string()),
                    "source": pa.array(["web"], type=pa.string()),
                    "n_chars": pa.array([7], type=pa.int64()),
                }
            ).cast(pa.schema([schema.field(i) for i in range(len(schema.names))]))
            pq.write_table(docs, str(d / f"{t}.parquet"))
        else:
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    sf = str(d)
    rows = q_bpe_train_merges(spark, sf).collect()
    assert [r["round"] for r in rows] == [1]
    assert rows[0]["merged"] == "ab"
    enc = q_bpe_apply_encode(spark, sf).collect()
    assert len(enc) == 1
    # 'ab' -> 1 symbol (x2 words), 'c' -> 1 symbol: 3 bpe symbols / 5 chars
    assert enc[0]["n_bpe_symbols"] == 3
    assert enc[0]["n_char_symbols"] == 5
    con = duck_connection(sf)
    for name in ("bpe_train_merges", "bpe_apply_encode"):
        q = CATALOG[name]
        res = compare_query(spark, con, name, q.fn, q.oracle, sf)
        assert res.ok, f"{name}: {res.problems}"


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_corpus_alphabet_invariant(sf):
    # chr(9) tab (argmax tie-break + n-gram join keys), chr(30)/chr(31)
    # (BPE symbol markers) must never appear in document text. Pure
    # pyarrow scan — no Spark session needed, runs in milliseconds.
    import pyarrow.compute as pc

    t = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
    col = t.column("text")
    for ch, why in ((chr(9), "tab"), (chr(30), "RS marker"), (chr(31), "US marker")):
        hits = pc.sum(
            pc.cast(pc.match_substring(col, ch), pa.int64())
        ).as_py() or 0
        assert hits == 0, (
            f"{sf}/documents.text contains {why} (chr({ord(ch)})) in {hits} "
            "rows — the BPE marker scheme and tab-joined n-gram keys are "
            "corrupted identically in Spark and DuckDB; fix the fixture or "
            "re-key the affected operators"
        )


# -- round-9 batch 2: AMS F2, CCNet buckets, bucketed join --------------------


def test_ams_f2_exact_binary_estimates(spark):
    from thread_based_map_reduce_spark.operators.relational_ext import (
        AMS_ROWS,
        q_ams_f2_sketch_estimate,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_ams_f2_sketch_estimate(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["f2_exact"] > 0
    # mean estimator is EXACTLY sum_sq / 16 (binary fraction, no rounding)
    assert r["f2_est_mean"] == r["sum_sq"] / AMS_ROWS
    assert r["f2_est_mom"] > 0
    con = duck_connection(sf)
    q = CATALOG["ams_f2_sketch_estimate"]
    res = compare_query(spark, con, q.name, q.fn, q.oracle, sf)
    assert res.ok, res.problems


def test_ccnet_buckets_partition_documents(spark):
    from thread_based_map_reduce_spark.operators.text import (
        q_ccnet_perplexity_buckets,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.01"
    rows = q_ccnet_perplexity_buckets(spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    per_lang = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(per_lang)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["bucket"])
        # terciles PARTITION the language's documents
        assert sum(r["n_docs"] for r in rs) == per_lang[lang]
        # ntile: earlier buckets never smaller, sizes differ by <= 1
        sizes = [r["n_docs"] for r in rs]
        assert sizes == sorted(sizes, reverse=True)
        assert max(sizes) - min(sizes) <= 1
        # perplexity ordering is monotone across buckets (ties split by
        # doc_id, so non-strict boundary ordering must hold)
        for a, b in zip(rs, rs[1:]):
            assert a["max_nll_nano"] <= b["min_nll_nano"]
        # head+middle kept, tail dropped
        assert [r["kept"] for r in rs] == [1, 1, 0][: len(rs)]
        assert [r["tier"] for r in rs] == ["head", "middle", "tail"][: len(rs)]


def test_bucketed_join_plan_is_exchange_and_sort_free(spark):
    import re

    from thread_based_map_reduce_spark.operators import layout  # noqa: F401

    sf = "/root/testdata/sf0.001"
    q = CATALOG["bucketed_join_revenue"]
    df = q.fn(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    # the ONLY exchange is the final groupBy; the join itself is
    # bucket-co-located with one pre-sorted file per bucket, so there is
    # NO Sort anywhere in the plan either
    assert len(re.findall(r"\bExchange ", plan)) == 1, plan
    assert len(re.findall(r"\bSort \[", plan)) == 0, plan
    con = duck_connection(sf)
    res = compare_query(spark, con, q.name, q.fn, q.oracle, sf)
    assert res.ok, res.problems


def test_streaming_outer_join_runtime_parity_and_withholding(spark):
    """11th runtime: left-outer stream-stream join — oracle parity at
    sf0.001 plus the semantics the inner-join runtime can't show: rows
    are exactly-once, every matched pair emits, and ONLY
    watermark-cleared unmatched purchases emit null-padded."""
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.operators import (  # noqa: F401
        streaming_runtime,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.001"
    q = CATALOG["streaming_outer_join_runtime"]
    con = duck_connection(sf)
    res = compare_query(spark, con, q.name, q.fn, q.oracle, sf)
    assert res.ok, res.problems

    rows = q.fn(spark, sf).collect()
    # exactly-once: no duplicate emissions across micro-batches
    assert len(rows) == len({tuple(r) for r in rows})
    matched = [r for r in rows if r["matched"] == 1]
    unmatched = [r for r in rows if r["matched"] == 0]
    assert len(matched) == 88 and len(unmatched) == 135  # sf0.001 fixture
    assert all(r["s_us"] is None for r in unmatched)
    # the withheld tail: the fixture has exactly 1 unmatched purchase
    # inside the watermark horizon — it must NOT appear in the sink
    ev = load_table(spark, sf, "events")
    wm_cut = ev.agg(
        F.least(
            F.max(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))),
            F.max(F.when(F.col("event_type") == "signup", F.unix_micros("ts"))),
        )
        - 3600 * 1000000
        - 1000000
    ).collect()[0][0]
    assert all(r["p_us"] <= wm_cut for r in unmatched)


def test_dedup_blocking_recall_eval_invariants(spark):
    from thread_based_map_reduce_spark.operators.dedup import (
        q_dedup_blocking_recall_eval,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r["method"]: r for r in q_dedup_blocking_recall_eval(spark, sf).collect()}
    # round 10 added the exact_substring family and the matched-budget
    # columns (VERDICT r9 #7) — the invariants extend accordingly
    assert set(rows) == {
        "minhash_lsh",
        "simhash_ham3",
        "sorted_neighborhood",
        "winnowing",
        "exact_substring",
    }
    budget = min(r["n_pairs"] for r in rows.values())
    for r in rows.values():
        assert 0 <= r["n_hit"] <= min(r["n_pairs"], r["n_truth"])
        if r["n_truth"]:
            assert r["recall"] == round(r["n_hit"] / r["n_truth"], 6)
        if r["n_pairs"]:
            assert r["prec"] == round(r["n_hit"] / r["n_pairs"], 6)
        assert r["n_budget"] == budget
        assert 0 <= r["hit_at_budget"] <= budget
        assert r["hit_at_budget"] <= r["n_hit"]  # top-budget is a subset
        assert r["prec_at_budget"] == round(r["hit_at_budget"] / budget, 6)
    con = duck_connection(sf)
    q = CATALOG["dedup_blocking_recall_eval"]
    res = compare_query(spark, con, q.name, q.fn, q.oracle, sf)
    assert res.ok, res.problems


def test_textrank_keywords_parity_and_shape(spark):
    from thread_based_map_reduce_spark.operators.text import (
        TEXTRANK_TOPK,
        q_textrank_keywords,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_textrank_keywords(spark, sf).collect()
    assert 0 < len(rows) <= TEXTRANK_TOPK
    # descending rank with word tie-break, all microunit ranks >= teleport
    ranks = [(r["pr_microunits"], r["word"]) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))
    assert all(r["pr_microunits"] >= 150000 for r in rows)
    con = duck_connection(sf)
    q = CATALOG["textrank_keywords"]
    res = compare_query(spark, con, q.name, q.fn, q.oracle, sf)
    assert res.ok, res.problems


def test_bmp_decoder_is_a_real_parser(spark):
    from thread_based_map_reduce_spark.operators.multimodal import (
        decode_bmp,
        with_bmp_payload,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.001"
    payloads = (
        with_bmp_payload(load_table(spark, sf, "documents")).limit(40).collect()
    )
    flip_matters = False
    for row in payloads:
        buf = bytes(row["payload"])
        w, h, rows = decode_bmp(buf)
        assert len(rows) == h and all(len(r) == 3 * w for r in rows)
        # rows[0] is the TOP row = the LAST stored row (bottom-up format)
        stride = ((3 * w + 3) // 4) * 4
        off = len(buf) - stride * h
        assert rows[0] == buf[off + (h - 1) * stride : off + (h - 1) * stride + 3 * w]
        if h > 1 and rows[0] != rows[-1]:
            flip_matters = True
        # real validation: corrupt magic and a truncated file must raise
        import pytest as _pytest

        with _pytest.raises(ValueError):
            decode_bmp(b"XX" + buf[2:])
        with _pytest.raises(ValueError):
            decode_bmp(buf[:-1])
    assert flip_matters, "fixture never exercised the vertical flip"
    con = duck_connection(sf)
    q = CATALOG["multimodal_bmp_decode"]
    res = compare_query(spark, con, q.name, q.fn, q.oracle, sf)
    assert res.ok, res.problems
