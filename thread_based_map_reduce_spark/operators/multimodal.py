"""Multimodal column operators (mandated extension, SURVEY §2.3).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs riding alongside. The container has no image/audio libraries, so
the decode kernels are deterministic fakes (clearly marked below, gated
behind import-try for the real libraries) — but everything Spark-side is
real and tested: binary column synthesis, schema, Arrow batch shape through
``mapInPandas``, partitioning.

The testdata has no binary column, so payloads are synthesized
deterministically (md5(text) → 16 bytes) — stand-ins for real image bytes
with the same plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.catalog import register
from ..sources.registry import load_table

try:  # real decoder if ever available in the runtime image
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 16-byte binary payload + metadata struct —
    the multimodal column pattern: (payload binary, meta struct<...>)."""
    payload = F.unhex(F.md5("text"))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(payload).alias("n_bytes"),
            (F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("bigint") % 64 + 1).alias("width"),
            (F.conv(F.substring(F.md5("text"), 3, 2), 16, 10).cast("bigint") % 64 + 1).alias("height"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, width: int, height: int) -> list[int]:
    """FAKE DECODER (deterministic): the container has no image libs.

    Real implementation would be PIL/libvips; the fake tiles the payload
    bytes to width*height "pixels". Swap body for real decode when
    ``HAVE_PIL``.
    """
    if HAVE_PIL:
        raise NotImplementedError("real decode path not wired in this image")
    n = width * height
    reps = (n + len(payload) - 1) // len(payload)
    return list((payload * reps)[:n])


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payload batches → per-image pixel stats.

    This is the real scale plumbing for a multimodal pipeline: Arrow moves
    the binary column into Python in columnar batches, the kernel runs
    per-batch (not per-row RPC), and the output schema is fixed so the
    optimizer can prune downstream.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                px = decode_payload(bytes(row.payload), meta["width"], meta["height"])
                out.append(
                    (
                        row.doc_id,
                        int(meta["width"]),
                        int(meta["height"]),
                        len(px),
                        float(sum(px)) / len(px),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "n_pixels", "mean_pixel"]
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, width long, height long, n_pixels long, mean_pixel double",
    )


def sample_frames(df: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: explode each
    payload into "frames" (here: one per byte) and keep every n-th.
    Pure built-ins — the explode/filter pattern is the real one; only the
    notion of 'frame = byte' is the stand-in."""
    n = F.length("payload")
    return (
        df.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), n)).alias("frame_idx"),
            F.col("payload"),
        )
        .where((F.col("frame_idx") - 1) % every_nth == 0)
        .select(
            "doc_id",
            F.col("frame_idx").cast("bigint").alias("frame_idx"),
            F.substring("payload", F.col("frame_idx"), F.lit(1)).alias("frame"),
        )
    )


def resize_images(df: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Resize (mean-pool) decoded images to a fixed out_w×out_h thumbnail —
    the feature-extraction step of an image pipeline. Same FAKE-decode
    caveat as decode_images; the Arrow batching, fixed output schema, and
    array<double> feature column are the real plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w, h = int(meta["width"]), int(meta["height"])
                px = decode_payload(bytes(row.payload), w, h)
                thumb = []
                for oy in range(out_h):
                    for ox in range(out_w):
                        xs = range(ox * w // out_w, max((ox + 1) * w // out_w, ox * w // out_w + 1))
                        ys = range(oy * h // out_h, max((oy + 1) * h // out_h, oy * h // out_h + 1))
                        cell = [px[y * w + x] for y in ys for x in xs]
                        thumb.append(sum(cell) / len(cell))
                out.append((row.doc_id, thumb))
            yield pd.DataFrame(out, columns=["doc_id", "thumb"])

    return df.mapInPandas(kernel, schema="doc_id long, thumb array<double>")


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id,
               CAST(i AS BIGINT) AS frame_idx,
               upper(substr(md5(text), 2 * i - 1, 2)) AS frame_hex
        FROM (
            SELECT doc_id, text, unnest(range(1, 17)) AS i
            FROM documents WHERE doc_id < 50
        )
        WHERE (i - 1) % 4 = 0
    """,
    doc="Frame sampling over video-shaped payloads: explode to frames, keep "
    "every 4th — pure built-ins (sequence/explode/substring), so the frame "
    "selection plan is Catalyst-visible; frames compared as hex (the 16-byte "
    "payload is md5(text), so frame i ≡ hex chars 2i-1..2i)",
    tags=("multimodal", "explode"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    frames = sample_frames(with_payload(docs), every_nth=4)
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


@register(
    "multimodal_resize_thumbs",
    oracle=None,  # Python resize kernel — not SQL-expressible; rows-only check
    doc="Mean-pool resize to 4x4 thumbnails via Arrow-batched mapInPandas "
    "(fake decode, real plumbing); per-doc feature vector as array<double>",
    tags=("multimodal",),
)
def q_multimodal_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    thumbs = resize_images(with_payload(docs))
    return thumbs.select(
        "doc_id",
        F.round(F.aggregate("thumb", F.lit(0.0), lambda a, v: a + v) / F.size("thumb"), 4).alias(
            "thumb_mean"
        ),
        F.size("thumb").cast("bigint").alias("thumb_len"),
    )


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(unhex(md5(text))) AS BIGINT) AS n_bytes,
               CAST(('0x' || substr(md5(text), 1, 2))::BIGINT % 64 + 1 AS BIGINT) AS width,
               CAST(('0x' || substr(md5(text), 3, 2))::BIGINT % 64 + 1 AS BIGINT) AS height
        FROM documents
    """,
    doc="Multimodal metadata projection: binary payload byte length + typed "
    "width/height metadata (binary column plumbing, JVM-side)",
    tags=("multimodal",),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mm = with_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "multimodal_decode_stats",
    oracle=None,  # Python decode kernel — not SQL-expressible; rows-only check
    doc="Decode kernel over binary payloads via Arrow-batched mapInPandas "
    "(deterministic fake decode; real plumbing), aggregated per width bucket",
    tags=("multimodal",),
)
def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_images(with_payload(docs))
    return decoded.groupBy("width").agg(
        F.count("*").alias("n_images"),
        F.round(F.avg("mean_pixel"), 4).alias("avg_pixel"),
        F.sum("n_pixels").alias("total_pixels"),
    )
