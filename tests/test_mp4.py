"""MP4/ISO-BMFF container parse tests (operators/mp4.py) — writer →
box-walk parser roundtrip, version-1 boxes, hostile payloads, and the
multimodal dimension dispatch. Frame decode is out of scope by design
(the one remaining honest codec stub)."""

import struct

import pytest

from readability_scanner_spark.operators import multimodal
from readability_scanner_spark.operators.mp4 import make_mp4, parse_mp4_info


@pytest.mark.parametrize(
    "w,h,dur", [(640, 360, 5500), (160, 120, 1000), (1920, 1080, 3_600_000)]
)
def test_roundtrip(w, h, dur):
    assert parse_mp4_info(make_mp4(w, h, dur, seed=3)) == (w, h, dur)


def test_deterministic():
    assert make_mp4(320, 240, 2000, seed=1) == make_mp4(320, 240, 2000, seed=1)
    assert make_mp4(320, 240, 2000, seed=1) != make_mp4(320, 240, 2000, seed=2)


def test_version1_mvhd_parses():
    """Hand-build a v1 mvhd (64-bit times, 8-byte duration) — real
    encoders emit these for long recordings."""
    mvhd_v1 = struct.pack(">B3x", 1) + struct.pack(
        ">QQIQ", 0, 0, 90000, 90000 * 42
    )
    box = struct.pack(">I", len(mvhd_v1) + 8) + b"mvhd" + mvhd_v1
    moov = struct.pack(">I", len(box) + 8) + b"moov" + box
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    info = parse_mp4_info(ftyp + moov)
    assert info == (0, 0, 42_000)


def test_hostile_payloads():
    good = make_mp4(320, 240, 2000)
    assert parse_mp4_info(None) is None
    assert parse_mp4_info(b"\x00" * 30) is None  # no ftyp
    assert parse_mp4_info(good[:40]) is None  # truncated before moov
    # box claiming a size past EOF: walk stops, no exception/loop
    trunc = bytearray(good)
    moov_at = trunc.find(b"moov") - 4
    trunc[moov_at : moov_at + 4] = struct.pack(">I", 1 << 30)
    assert parse_mp4_info(bytes(trunc)) is None
    # size-0 box (extends to EOF) must not loop forever
    zero = bytearray(good)
    zero[moov_at : moov_at + 4] = struct.pack(">I", 0)
    parse_mp4_info(bytes(zero))  # returns something or None, terminates


def test_media_dimension_dispatch_and_duration():
    payload = make_mp4(224, 168, 7000, seed=5)
    assert multimodal.parse_media_dimensions(payload) == (224, 168)
    # image headers still win through the same dispatch
    png = multimodal.make_png(9, 4, seed=1)
    assert multimodal.parse_media_dimensions(png) == (9, 4)
    assert multimodal.parse_media_dimensions(b"junk" * 10) is None
    # synthetic video rows: REAL container, REAL parsed duration
    kind, p, w, h = multimodal.synthetic_media_row(5)  # 5 % 3 == 2 -> video
    assert kind == "video"
    pw, ph, pdur = parse_mp4_info(p)
    assert (pw, ph) == (w, h)
    assert pdur == (5 % 10 + 1) * 1000


def test_video_features_stay_marked_fake(spark):
    """Frame decode is honestly stubbed: video payloads fall to the
    crc-fake vector (16 entries), while dims/duration are real."""
    kind, p, _, _ = multimodal.synthetic_media_row(5)
    feats = multimodal._features_dispatch(p)
    assert feats == multimodal._fake_features(p)
    with pytest.raises(NotImplementedError):
        multimodal._decode_image(p)
