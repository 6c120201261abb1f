"""Baseline-JPEG kernel tests: the closed-form DC path the catalog oracle
checks, the AC/ZRL/negative-magnitude entropy paths the flat catalog
payloads cannot reach (exact quantized-coefficient recovery on random
rasters), and the malformed-input contract."""

from __future__ import annotations

import math

import numpy as np
import pytest

from thread_based_map_reduce_spark.operators.multimodal_jpeg import (
    _QUANT_TABLE,
    _ZIGZAG,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    quantize_block,
)


def _closed_form(v: int) -> int:
    return min(255, max(0, int(2 * math.floor((v - 128.0) / 2 + 0.5) + 128)))


def _random_mcu_image(rng, wm, hm):
    yv = rng.randint(0, 256, (hm, wm)).astype(np.uint8)
    cbv = rng.randint(0, 256, (hm, wm)).astype(np.uint8)
    crv = rng.randint(0, 256, (hm, wm)).astype(np.uint8)
    y = np.kron(yv, np.ones((16, 16), dtype=np.uint8))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.uint8))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.uint8))
    return yv, cbv, crv, y, cb, cr


def test_zigzag_is_a_permutation_with_spec_anchors():
    assert sorted(_ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
    # first/last few entries of the published order
    assert _ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_constant_mcu_round_trip_matches_closed_form():
    rng = np.random.RandomState(7)
    for _ in range(8):
        wm, hm = rng.randint(1, 3), rng.randint(1, 3)
        yv, cbv, crv, y, cb, cr = _random_mcu_image(rng, wm, hm)
        d = decode_baseline_jpeg(encode_baseline_jpeg(y, cb, cr))
        assert (d["width"], d["height"]) == (16 * wm, 16 * hm)
        assert d["n_mcus"] == wm * hm
        assert d["n_blocks"] == 6 * wm * hm
        assert d["samplings"] == {1: (2, 2), 2: (1, 1), 3: (1, 1)}
        cf = np.vectorize(_closed_form)
        up16 = np.ones((16, 16), dtype=int)
        assert (d["planes"][1].astype(int) == np.kron(cf(yv), up16)).all()
        assert (d["planes"][2].astype(int) == np.kron(cf(cbv), up16)).all()
        assert (d["planes"][3].astype(int) == np.kron(cf(crv), up16)).all()


def test_quantization_is_visibly_lossy():
    # v=129 -> floor(0.5+0.5)=1 -> decoded 130 != 129: quantization ran.
    assert _closed_form(129) == 130
    y = np.full((16, 16), 129, dtype=np.uint8)
    c = np.full((8, 8), 128, dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(y, c, c))
    assert int(d["planes"][1][0, 0]) == 130


def test_random_raster_coefficient_recovery_exact():
    # The strongest entropy-layer check: on full-noise rasters (dense
    # nonzero AC, negative magnitudes, runs, ZRL, mid-block EOBs) the
    # decoder must recover EXACTLY the quantized coefficients the encoder
    # wrote, for every component.
    rng = np.random.RandomState(1234)
    for _ in range(4):
        wm, hm = rng.randint(1, 3), rng.randint(1, 3)
        y = rng.randint(0, 256, (16 * hm, 16 * wm)).astype(np.uint8)
        cb = rng.randint(0, 256, (8 * hm, 8 * wm)).astype(np.uint8)
        cr = rng.randint(0, 256, (8 * hm, 8 * wm)).astype(np.uint8)
        d = decode_baseline_jpeg(encode_baseline_jpeg(y, cb, cr), want_coeffs=True)
        idx = 0
        for my in range(hm):
            for mx in range(wm):
                for by in range(2):
                    for bx in range(2):
                        blk = y[
                            my * 16 + by * 8 : my * 16 + by * 8 + 8,
                            mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8,
                        ]
                        assert (
                            d["coeffs"][1][idx] == quantize_block(blk, _QUANT_TABLE)
                        ).all()
                        idx += 1
        for cid, plane in ((2, cb), (3, cr)):
            idx = 0
            for my in range(hm):
                for mx in range(wm):
                    blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    assert (
                        d["coeffs"][cid][idx] == quantize_block(blk, _QUANT_TABLE)
                    ).all()
                    idx += 1


def test_gradient_exercises_zrl_and_long_runs():
    # A smooth horizontal gradient concentrates energy in the first AC
    # row: long zero runs + ZRL symbols on the luma path.
    y = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (32, 1))
    cb = np.full((16, 16), 90, dtype=np.uint8)
    cr = np.full((16, 16), 200, dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(y, cb, cr), want_coeffs=True)
    some_ac = any(int(np.abs(b).sum()) - abs(int(b[0, 0])) > 0 for b in d["coeffs"][1])
    assert some_ac, "gradient produced no AC coefficients — test is vacuous"
    idx = 0
    for my in range(2):
        for mx in range(2):
            for by in range(2):
                for bx in range(2):
                    blk = y[
                        my * 16 + by * 8 : my * 16 + by * 8 + 8,
                        mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8,
                    ]
                    assert (
                        d["coeffs"][1][idx] == quantize_block(blk, _QUANT_TABLE)
                    ).all()
                    idx += 1


def test_corrupt_inputs_raise():
    rng = np.random.RandomState(5)
    _, _, _, y, cb, cr = _random_mcu_image(rng, 1, 1)
    good = encode_baseline_jpeg(y, cb, cr)

    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"\x00\x00" + good[2:])
    with pytest.raises(ValueError):
        decode_baseline_jpeg(good[:40])  # truncated mid-segment
    with pytest.raises(ValueError, match="truncated"):
        decode_baseline_jpeg(good[:-20])  # truncated entropy stream
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    sof = good.index(b"\xFF\xC0")
    bad = bytearray(good)
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        decode_baseline_jpeg(bytes(bad))
    # oversize dims vs entropy data: height doubled -> stream truncates
    bad = bytearray(good)
    h = int.from_bytes(good[sof + 5 : sof + 7], "big")
    bad[sof + 5 : sof + 7] = (h * 2).to_bytes(2, "big")
    with pytest.raises(ValueError):
        decode_baseline_jpeg(bytes(bad))


def test_encoder_input_validation():
    y = np.zeros((17, 16), dtype=np.uint8)
    c = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_baseline_jpeg(y, c, c)
    y = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="subsampled"):
        encode_baseline_jpeg(y, np.zeros((16, 16), dtype=np.uint8), c)


def test_byte_stuffing_round_trip():
    # deterministic check of the stuffing mechanism itself: a 0xFF byte in
    # the writer's output must gain a 0x00, and the reader must strip it
    from thread_based_map_reduce_spark.operators.multimodal_jpeg import (
        _BitReader,
        _BitWriter,
    )

    w = _BitWriter()
    w.write(0xFF, 8)
    w.write(0xA5, 8)
    assert bytes(w.out) == b"\xFF\x00\xA5"
    r = _BitReader(bytes(w.out), 0)
    assert r.receive(8) == 0xFF
    assert r.receive(8) == 0xA5
    # and end-to-end: random payloads that DO contain a stuffed byte in
    # their entropy segment must still decode (skip quietly if none do —
    # the unit check above already pins the mechanism)
    rng = np.random.RandomState(11)
    for _ in range(40):
        _, _, _, y, cb, cr = _random_mcu_image(rng, 2, 2)
        payload = encode_baseline_jpeg(y, cb, cr)
        scan_at = payload.index(b"\xFF\xDA")
        if b"\xFF\x00" in payload[scan_at:]:
            d = decode_baseline_jpeg(payload)
            assert d["n_blocks"] == 24
            break


def test_catalog_query_runs(spark, sf_dir):
    from thread_based_map_reduce_spark.plans.catalog import CATALOG

    rows = CATALOG["multimodal_jpeg_decode"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.width in (16, 32) and r.height in (16, 32)
        assert r.n_blocks == 6 * r.n_mcus
        assert 0 <= r.y_min <= r.y_max <= 255
