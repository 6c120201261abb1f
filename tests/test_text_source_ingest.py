"""Raw text-file ingestion: one .txt file per document → spark.read.text
(wholetext) → the flagship char-count — the reference's in-memory string
input model (SampleClient.cpp:74-79) replayed over the file-based shape a
real corpus arrives in. Results must be identical to the parquet path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.sources.registry import load_table


def _charcount(df, text_col: str):
    return (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count("*").alias("n"))
    )


def test_text_files_match_parquet_charcount(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(50)
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        (tmp_path / f"{r.doc_id}.txt").write_text(r.text, encoding="utf-8")

    from_files = spark.read.text(str(tmp_path), wholetext=True)
    got = {
        (r.ch, r.n) for r in _charcount(from_files, "value").collect()
    }
    want = {
        (r.ch, r.n)
        for r in _charcount(docs.select("text"), "text").collect()
    }
    assert got == want


def test_text_source_line_mode_splits_rows(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line one\nline two\n", encoding="utf-8")
    lines = spark.read.text(str(tmp_path))
    assert sorted(r.value for r in lines.collect()) == ["line one", "line two"]
