"""Baseline JPEG codec tests (operators/jpeg.py) — same pattern as the
PNG/WAV kernels: own writer → own parser → roundtrip property with a
lossy-error bound, plus hostile-payload rejection and the multimodal
dispatch integration."""

import struct

import numpy as np
import pytest

from readability_scanner_spark.operators import multimodal
from readability_scanner_spark.operators.jpeg import (
    JPEG_DECODE_MAX_SAMPLES,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    make_jpeg,
)


def _smooth(w, h, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = (seed * 3) % 100 + xx * 155.0 / max(w - 1, 1)
    g = (seed * 5) % 100 + yy * 155.0 / max(h - 1, 1)
    b = (seed * 7) % 100 + (xx + yy) * 155.0 / max(w + h - 2, 1)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    # T.81 Figure 5 first and last entries, and a permutation of 0..63
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("size", [(8, 8), (17, 13), (32, 24), (1, 1), (40, 1)])
def test_roundtrip_all_subsamplings_and_odd_sizes(sub, size):
    w, h = size
    orig = _smooth(w, h, seed=9)
    payload = encode_jpeg(orig, quality=92, subsampling=sub)
    dw, dh, c, samples = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(h, w, 3)
    err = np.abs(dec.astype(int) - orig.astype(int))
    # lossy bound: 4:4:4 quantization noise is tiny; subsampled chroma
    # pays nearest-neighbor upsampling on top
    assert err.max() <= (6 if sub == "444" else 20), (sub, size, err.max())


def test_roundtrip_restart_intervals():
    orig = _smooth(48, 40, seed=3)
    payload = encode_jpeg(orig, quality=90, subsampling="420", restart_interval=2)
    assert b"\xff\xdd" in payload  # DRI emitted
    assert b"\xff\xd0" in payload  # at least one RST0
    dw, dh, c, samples = decode_jpeg(payload)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(40, 48, 3)
    assert np.abs(dec.astype(int) - orig.astype(int)).max() <= 20


def test_roundtrip_grayscale():
    gray = (np.mgrid[0:20, 0:30][1] * 7).astype(np.uint8)
    dw, dh, c, samples = decode_jpeg(encode_jpeg(gray, quality=95))
    assert (dw, dh, c) == (30, 20, 1)
    dec = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(20, 30)
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 4


def test_make_jpeg_deterministic_and_header_parsable():
    a = make_jpeg(24, 18, seed=5)
    assert a == make_jpeg(24, 18, seed=5)
    assert a != make_jpeg(24, 18, seed=6)
    assert multimodal.parse_image_dimensions(a) == (24, 18)


def test_decode_rejects_hostile_payloads():
    good = make_jpeg(16, 16, seed=1)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy data / missing EOI
    # progressive SOF2 is an honest refusal, not garbage output
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))
    # dimension bomb: SOF claims a huge frame — rejected by the sample
    # cap BEFORE any allocation proportional to the claim
    bomb = bytearray(good)
    h_off = bomb.find(b"\xff\xc0") + 5
    bomb[h_off : h_off + 4] = struct.pack(">HH", 60000, 60000)
    with pytest.raises(ValueError, match="JPEG_DECODE_MAX_SAMPLES"):
        decode_jpeg(bytes(bomb))
    assert 60000 * 60000 * 3 > JPEG_DECODE_MAX_SAMPLES


def test_corrupt_entropy_data_raises_not_hangs():
    good = bytearray(make_jpeg(16, 16, seed=2))
    # flip bytes in the entropy segment (after SOS header)
    sos = good.find(b"\xff\xda")
    for i in range(sos + 20, min(sos + 40, len(good) - 2)):
        good[i] ^= 0x5A
    try:
        # corrupted streams may still decode to SOME image (huffman is
        # not integrity-checked) — the contract is: return or ValueError,
        # never hang or segfault
        decode_jpeg(bytes(good))
    except ValueError:
        pass


def test_image_pixel_stats_jpeg_and_dispatch():
    payload = make_jpeg(20, 10, seed=4)
    feats = multimodal.image_pixel_stats(payload)
    assert feats[:3] == [20.0, 10.0, 3.0]
    assert all(0.0 <= f <= 1.0 for f in feats[3:])
    # dispatch: real stats, not the crc fake
    assert multimodal._features_dispatch(payload) == feats
    # and the stats agree with decoding by hand
    w, h, c, samples = decode_jpeg(payload)
    arr = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(-1, 3)
    assert feats[3] == pytest.approx(float(arr[:, 0].mean()) / 255.0)


def test_synthetic_media_rows_cycle_png_jpeg_gif():
    kinds = {}
    for i in range(0, 36, 3):  # image rows
        kind, payload, w, h = multimodal.synthetic_media_row(i)
        assert kind == "image"
        if payload[:2] == b"\xff\xd8":
            fmt = "jpeg"
        elif payload[:3] == b"GIF":
            fmt = "gif"
        else:
            fmt = "png"
        kinds.setdefault(fmt, 0)
        kinds[fmt] += 1
        assert multimodal.parse_image_dimensions(payload) == (w, h)
        # ALL three formats really pixel-decode
        assert multimodal.image_pixel_stats(payload)[:2] == [float(w), float(h)]
    assert kinds == {"png": 4, "jpeg": 4, "gif": 4}


def test_media_features_real_stats_for_jpeg_rows(spark):
    df = multimodal.synthetic_media_df(spark, 12)
    out = {
        r["media_id"]: r
        for r in multimodal.extract_media_features(df).collect()
    }
    jpeg_ids = [
        i for i in range(0, 12, 3)
        if multimodal.synthetic_media_row(i)[1][:2] == b"\xff\xd8"
    ]
    assert jpeg_ids, "corpus must contain JPEG rows"
    for i in jpeg_ids:
        kind, payload, w, h = multimodal.synthetic_media_row(i)
        row = out[i]
        assert row["width"] == w and row["height"] == h
        want = multimodal.image_pixel_stats(payload)
        got = list(row["features"])
        assert got == pytest.approx(want, abs=1e-6)
