"""The real multimodal ingestion path: files on disk → Spark binaryFile
source → the PGM decode kernel.

The catalog's multimodal queries synthesize payloads JVM-side (so the
driver's oracle can check them); production images arrive as object-store
FILES. This test closes that gap: it writes genuine .pgm files, reads
them back through ``spark.read.format("binaryFile")``, runs the SAME
Arrow-batched decode kernel, and requires bit-identical stats to the
inline path. At 100 TB this is the shape that matters — binaryFile scans
parallelize per-file, and the kernel neither knows nor cares which
source produced the payload column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.operators.multimodal import (
    decode_pgm_images,
    with_pgm_payload,
)
from thread_based_map_reduce_spark.sources.registry import load_table


def test_binaryfile_ingest_matches_inline_decode(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(40)
    inline = with_pgm_payload(docs).select("doc_id", "payload")

    for r in inline.collect():
        (tmp_path / f"{r.doc_id}.pgm").write_bytes(bytes(r.payload))

    from_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(str(tmp_path))
        .select(
            F.regexp_extract("path", r"(\d+)\.pgm$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )

    key = lambda r: r.doc_id  # noqa: E731
    got = sorted(decode_pgm_images(from_files).collect(), key=key)
    want = sorted(decode_pgm_images(inline).collect(), key=key)
    assert len(got) == 40
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_binaryfile_scan_prunes_by_glob(spark, tmp_path):
    # a junk file next to the images must not reach the kernel
    (tmp_path / "0.pgm").write_bytes(b"P5\n1 1\n255\nx")
    (tmp_path / "notes.txt").write_bytes(b"not an image")
    paths = [
        r.path
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(str(tmp_path))
        .select("path")
        .collect()
    ]
    assert len(paths) == 1 and paths[0].endswith("0.pgm")
