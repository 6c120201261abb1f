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


def _make_png(w, h, raster, filters=None):
    """Independent minimal PNG encoder (zlib.compress path, NOT the SQL
    stored-block path) for golden tests."""
    import struct
    import zlib

    filters = filters or [0] * h
    raw = b"".join(
        bytes([filters[r]]) + _filter_row(raster, w, h, r, filters[r])
        for r in range(h)
    )

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _filter_row(raster, w, h, r, ft):
    from thread_based_map_reduce_spark.operators.multimodal import _paeth_predictor

    out = bytearray(w)
    for c in range(w):
        x = raster[r * w + c]
        left = raster[r * w + c - 1] if c else 0
        up = raster[(r - 1) * w + c] if r else 0
        ul = raster[(r - 1) * w + c - 1] if r and c else 0
        pred = [0, left, up, (left + up) // 2, _paeth_predictor(left, up, ul)][ft]
        out[c] = (x - pred) & 255
    return bytes(out)


def test_decode_png_golden_all_filters():
    from thread_based_map_reduce_spark.operators.multimodal import decode_png

    raster = bytes(range(30))  # 6 rows x 5 px
    payload = _make_png(5, 6, raster, filters=[0, 1, 2, 3, 4, 1])
    w, h, out, ftypes = decode_png(payload)
    assert (w, h) == (5, 6)
    assert out == raster  # every filter round-trips through the unfilter loop
    assert ftypes == [0, 1, 2, 3, 4, 1]


def test_decode_png_rejects_corrupt():
    import zlib as _zlib

    import pytest as _pytest

    from thread_based_map_reduce_spark.operators.multimodal import decode_png

    good = _make_png(3, 2, bytes(range(6)))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff\xe0JFIF" + good[8:])
    with _pytest.raises(ValueError, match="bad CRC"):
        bad = bytearray(good)
        bad[20] ^= 0xFF  # flip a byte inside IHDR data
        decode_png(bytes(bad))
    with _pytest.raises(ValueError, match="truncated chunk"):
        decode_png(good[:-6])  # IEND ripped mid-chunk
    with _pytest.raises(ValueError, match="unsupported PNG variant"):
        import struct as _struct

        ihdr = _struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)  # RGB, not gray
        chunk = (
            _struct.pack(">I", 13) + b"IHDR" + ihdr
            + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
    with _pytest.raises(ValueError, match="bad zlib stream"):
        # valid chunks, garbage IDAT body
        import struct as _struct

        ihdr = _struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
        def _chunk(typ, data):
            return (
                _struct.pack(">I", len(data)) + typ + data
                + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
            )
        decode_png(
            b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", b"\x00garbage") + _chunk(b"IEND", b"")
        )
    with _pytest.raises(ValueError, match="missing IHDR"):
        import struct as _struct

        def _chunk2(typ, data):
            return (
                _struct.pack(">I", len(data)) + typ + data
                + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
            )
        decode_png(b"\x89PNG\r\n\x1a\n" + _chunk2(b"IEND", b""))
    with _pytest.raises(ValueError, match="bad filter type"):
        raw = b"\x07" + bytes(3) + b"\x00" + bytes(3)  # filter 7 invalid
        import struct as _struct

        ihdr = _struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
        def _chunk3(typ, data):
            return (
                _struct.pack(">I", len(data)) + typ + data
                + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
            )
        decode_png(
            b"\x89PNG\r\n\x1a\n" + _chunk3(b"IHDR", ihdr)
            + _chunk3(b"IDAT", _zlib.compress(raw)) + _chunk3(b"IEND", b"")
        )


def test_png_roundtrip_spark(spark, sf_dir):
    # JVM-synthesized payloads must be REAL PNGs: decode locally with the
    # stdlib-backed parser and compare the recovered raster to the md5
    # tiling the synthesis promises.
    import hashlib

    from thread_based_map_reduce_spark.operators.multimodal import (
        decode_png,
        with_png_payload,
    )
    from thread_based_map_reduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = with_png_payload(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    ).limit(40).collect()
    assert rows
    for r in rows:
        w, h, raster, ftypes = decode_png(bytes(r.payload))
        assert (w, h) == (r.width, r.height)
        md5_hex = hashlib.md5(r.text.encode()).hexdigest()
        tiled = bytes.fromhex(md5_hex * ((w * h + 15) // 16))[: w * h]
        assert raster == tiled, f"doc {r.doc_id}: raster != md5 tiling"
        assert ftypes == [i % 5 for i in range(h)]
