"""Multimodal plumbing tests: binary payload synthesis, Arrow-batched
decode kernel shape, frame sampling."""

from __future__ import annotations

from thread_based_map_reduce_spark.operators.multimodal import (
    decode_images,
    decode_payload,
    sample_frames,
    with_payload,
)
from thread_based_map_reduce_spark.sources.registry import load_table


def test_payload_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    mm = with_payload(docs)
    assert [f.name for f in mm.schema.fields] == ["doc_id", "payload", "meta"]
    rows = {r.doc_id: r for r in mm.collect()}
    again = {r.doc_id: r for r in with_payload(docs).collect()}
    for k in rows:
        assert bytes(rows[k].payload) == bytes(again[k].payload)
        assert len(bytes(rows[k].payload)) == 16
        assert 1 <= rows[k].meta.width <= 64 and 1 <= rows[k].meta.height <= 64


def test_decode_kernel_matches_local_fake(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    mm = with_payload(docs)
    decoded = {r.doc_id: r for r in decode_images(mm).collect()}
    for r in mm.collect():
        px = decode_payload(bytes(r.payload), r.meta.width, r.meta.height)
        d = decoded[r.doc_id]
        assert d.n_pixels == r.meta.width * r.meta.height == len(px)
        assert abs(d.mean_pixel - sum(px) / len(px)) < 1e-9


def test_frame_sampling(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    frames = sample_frames(with_payload(docs), every_nth=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in by_doc.values():
        assert sorted(idxs) == [1, 5, 9, 13]  # every 4th of 16 bytes
    assert all(len(bytes(r.frame)) == 1 for r in frames)


def test_resize_thumbs_deterministic_shape(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").limit(20)
    thumbs = {r.doc_id: r.thumb for r in resize_images(with_payload(docs)).collect()}
    again = {r.doc_id: r.thumb for r in resize_images(with_payload(docs)).collect()}
    assert thumbs == again and len(thumbs) == 20
    for t in thumbs.values():
        assert len(t) == 16  # 4x4 mean-pooled
        assert all(0.0 <= v <= 255.0 for v in t)


# -- REAL PGM decode path -----------------------------------------------------


def test_decode_pgm_golden():
    """Handcrafted 3x2 PGM: the parser must return exact known pixels."""
    from thread_based_map_reduce_spark.operators.multimodal import decode_pgm

    payload = b"P5\n3 2\n255\n" + bytes([0, 128, 255, 1, 2, 3])
    w, h, raster = decode_pgm(payload)
    assert (w, h) == (3, 2)
    assert list(raster) == [0, 128, 255, 1, 2, 3]


def test_decode_pgm_rejects_corrupt():
    import pytest as _pytest

    from thread_based_map_reduce_spark.operators.multimodal import decode_pgm

    with _pytest.raises(ValueError, match="not a binary PGM"):
        decode_pgm(b"JFIF....")
    with _pytest.raises(ValueError, match="raster length"):
        decode_pgm(b"P5\n3 2\n255\n" + bytes([1, 2, 3]))  # truncated raster
    with _pytest.raises(ValueError, match="unsupported maxval"):
        decode_pgm(b"P5\n1 1\n65535\n\x00")


def test_pgm_roundtrip_spark(spark, sf_dir):
    """JVM-synthesized payloads must be valid PGMs whose decoded dims match
    the metadata used to build them."""
    from thread_based_map_reduce_spark.operators.multimodal import (
        decode_pgm,
        with_pgm_payload,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    rows = with_pgm_payload(docs).collect()
    assert len(rows) == 20
    for r in rows:
        w, h, raster = decode_pgm(bytes(r.payload))
        assert (w, h) == (r.width, r.height)
        assert len(raster) == w * h


# -- REAL WAV decode path -----------------------------------------------------


def _wav(samples: bytes, sr: int = 8000) -> bytes:
    import struct

    return (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr, 1, 8)
        + b"data" + struct.pack("<I", len(samples)) + samples
    )


def test_decode_wav_golden():
    from thread_based_map_reduce_spark.operators.multimodal import decode_wav

    sr, n, samples = decode_wav(_wav(bytes([128, 0, 255, 128])))
    assert (sr, n) == (8000, 4)
    assert list(samples) == [128, 0, 255, 128]


def test_decode_wav_rejects_corrupt():
    import struct

    import pytest as _pytest

    from thread_based_map_reduce_spark.operators.multimodal import decode_wav

    with _pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS....")
    good = _wav(bytes([1, 2, 3, 4]))
    with _pytest.raises(ValueError, match="RIFF size"):
        decode_wav(good[:-2])  # truncation surfaces at the RIFF size check
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 22, 2)  # channels = 2
    with _pytest.raises(ValueError, match="unsupported format"):
        decode_wav(bytes(stereo))


def test_wav_roundtrip_spark(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.multimodal import (
        decode_wav,
        with_wav_payload,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    for r in with_wav_payload(docs).collect():
        sr, n, samples = decode_wav(bytes(r.payload))
        assert sr == 8000 and n == r.n_samples and len(samples) == n


# -- REAL Y4M decode path -----------------------------------------------------


def test_decode_y4m_golden():
    from thread_based_map_reduce_spark.operators.multimodal import decode_y4m

    y = bytes(range(4))          # 2x2 luma plane
    uv = bytes([7, 9])           # C420: one U + one V sample for 2x2
    payload = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\n" + b"FRAME\n" + y + uv + b"FRAME\n" + y + uv
    w, h, frames = decode_y4m(payload)
    assert (w, h) == (2, 2)
    assert len(frames) == 2 and all(list(f) == [0, 1, 2, 3] for f in frames)


def test_decode_y4m_rejects_corrupt():
    import pytest as _pytest

    from thread_based_map_reduce_spark.operators.multimodal import decode_y4m

    with _pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF....\n")
    with _pytest.raises(ValueError, match="missing FRAME marker"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nJUNK!!" + bytes(6))
    with _pytest.raises(ValueError, match="truncated frame"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nFRAME\n" + bytes(3))


def test_y4m_roundtrip_spark(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.multimodal import (
        _Y4M_FRAMES,
        decode_y4m,
        with_y4m_payload,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    for r in with_y4m_payload(docs).collect():
        w, h, frames = decode_y4m(bytes(r.payload))
        assert (w, h) == (8, 8) and len(frames) == _Y4M_FRAMES
