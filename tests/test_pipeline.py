"""End-to-end corpus-curation pipeline: structural properties the curated
output must satisfy, plus a DuckDB recomputation of the exact-dedup +
quality gates (the near-dup stage is covered by the dedup_clusters oracle
in the catalog gate)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.dedup import q_dedup_clusters
from thread_based_map_reduce_spark.pipeline import curate_corpus


def test_curated_corpus_properties(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    curate_corpus(spark, sf_dir, out, quality_min=0.5)
    back = spark.read.parquet(out)

    # partitioned layout survives the round trip with all columns
    assert set(back.columns) == {
        "doc_id", "lang", "source", "text", "text_hash", "n_tokens", "quality", "embedding"
    }
    n = back.count()
    assert n > 0

    # no duplicate texts survive
    assert back.select("text_hash").distinct().count() == n

    # every row passed the quality gate
    assert back.where(F.col("quality") < 0.5).count() == 0

    # no non-canonical near-dup cluster member survives
    clusters = q_dedup_clusters(spark, sf_dir)
    bad = clusters.where(F.col("doc_id") != F.col("cluster"))
    assert back.join(bad, "doc_id", "left_semi").count() == 0

    # partition pruning works on the written layout
    one_lang = back.select("lang").first().lang
    assert back.where(F.col("lang") == one_lang).count() > 0


def test_curated_count_matches_duckdb_recompute(spark, sf_dir):
    curated = curate_corpus(spark, sf_dir, out_dir=None, quality_min=0.5)
    got = curated.count()

    # DuckDB recomputation of exact-dedup + quality gates; subtract the
    # near-dup non-canonical members (cluster table recomputed on Spark —
    # its values are oracle-checked separately in the catalog gate)
    near_dups = {
        r.doc_id
        for r in q_dedup_clusters(spark, sf_dir)
        .where(F.col("doc_id") != F.col("cluster"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    drop = f"AND doc_id NOT IN ({','.join(map(str, near_dups))})" if near_dups else ""
    want = con.execute(
        f"""
        WITH exact AS (
            SELECT doc_id, text,
                   row_number() OVER (
                       PARTITION BY ('0x' || substr(md5(text), 1, 15))::BIGINT
                       ORDER BY doc_id
                   ) AS rn
            FROM documents
        )
        SELECT count(*) FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
                   len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_uniq,
                   length(text) AS length_chars
            FROM exact WHERE rn = 1 {drop}
        )
        WHERE round(0.5 * (n_uniq::DOUBLE / nullif(n_tokens, 0))
              + 0.3 * least(n_tokens / 20.0, 1.0)
              + 0.2 * least(length_chars / 100.0, 1.0), 6) >= 0.5
        """
    ).fetchone()[0]
    assert got == want


def test_rollup_events_pipeline(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.pipeline import rollup_events
    from thread_based_map_reduce_spark.sources.registry import load_table

    out = str(tmp_path_factory.mktemp("events-rollup"))
    sessions = rollup_events(spark, sf_dir, out)

    # session rows agree with the oracle-checked session_window_agg query
    from thread_based_map_reduce_spark.plans.catalog import queries

    want = {
        (r.user_id, r.session_start_us): r.n_events
        for r in queries()["session_window_agg"](spark, sf_dir).collect()
    }
    got = {(r.user_id, r.session_start_us): r.n_events for r in sessions.collect()}
    assert got == want and len(got) > 0

    # daily rollup round-trips and reconciles: total events in the rollup
    # equal the (deduped = all, event_ids are unique) raw event count
    back = spark.read.parquet(out)
    assert back.agg(F.sum("n_events")).first()[0] == load_table(
        spark, sf_dir, "events"
    ).count()
    # partition layout: day directories exist
    assert back.select("day").distinct().count() > 1
