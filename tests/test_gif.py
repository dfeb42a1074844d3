"""GIF codec tests (operators/gif.py) — writer → parser → EXACT
roundtrip (GIF is lossless), LZW edge cases incl. dictionary growth and
the KwKwK case via a hand-packed stream, interlace reordering, and
hostile-payload rejection."""

import struct

import pytest

from readability_scanner_spark.operators import multimodal
from readability_scanner_spark.operators.gif import (
    GIF_DECODE_MAX_SAMPLES,
    decode_gif,
    make_gif,
)


def _expected_rgb(w, h, seed):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            idx = (x * 2 + y * 5 + seed) % 256
            out += bytes(
                (
                    (idx * 3 + seed) % 256,
                    (idx * 7 + seed * 5) % 256,
                    (idx * 11 + seed * 9) % 256,
                )
            )
    return bytes(out)


@pytest.mark.parametrize("size", [(1, 1), (8, 8), (23, 17), (300, 2)])
def test_roundtrip_exact(size):
    w, h = size
    payload = make_gif(w, h, seed=5)
    dw, dh, c, samples = decode_gif(payload)
    assert (dw, dh, c) == (w, h, 3)
    assert bytes(samples) == _expected_rgb(w, h, 5)


def test_deterministic_and_header_parsable():
    a = make_gif(20, 12, seed=1)
    assert a == make_gif(20, 12, seed=1)
    assert a != make_gif(20, 12, seed=2)
    assert multimodal.parse_image_dimensions(a) == (20, 12)


def _tiny_gif(codes_bytes: bytes, w=3, h=1, min_code=2, iflags=0):
    """Hand-assembled GIF: 4-color GCT, one frame, given LZW bytes."""
    palette = b"".join(bytes((10 * i, 20 * i, 30 * i)) for i in range(4))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
    out += palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    out.append(min_code)
    out.append(len(codes_bytes))
    out += codes_bytes
    out += b"\x00\x3b"
    return bytes(out)


def test_lzw_kwkwk_and_dictionary_growth():
    """codes [clear=4, 1, 6, end=5] at width 3: code 6 == next table
    slot -> the KwKwK rule yields '1'+'1' = pixels [1,1,1]."""
    packed = 4 | (1 << 3) | (6 << 6) | (5 << 9)
    stream = bytes((packed & 0xFF, (packed >> 8) & 0xFF))
    w_, h_, c, samples = decode_gif(_tiny_gif(stream))
    assert (w_, h_, c) == (3, 1, 3)
    assert bytes(samples) == bytes((10, 20, 30)) * 3  # palette[1] x3


def test_interlaced_frame_reordered():
    """Encode rows in interlace pass order with the interlace flag set;
    the decoder must reorder them back to raster order."""
    base = make_gif(4, 9, seed=3)  # 9 rows exercises all four passes
    w, h = 4, 9
    # raster-order indices from the generator formula
    rows = [
        bytes((x * 2 + y * 5 + 3) % 256 for x in range(w)) for y in range(h)
    ]
    passes = [range(0, h, 8), range(4, h, 8), range(2, h, 4), range(1, h, 2)]
    interlaced = b"".join(rows[y] for p in passes for y in p)
    from readability_scanner_spark.operators.gif import _lzw_encode_flushed

    lzw = _lzw_encode_flushed(interlaced, 8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += base[13 : 13 + 768]  # reuse the standard palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    got = decode_gif(bytes(out))
    want = decode_gif(base)
    assert bytes(got[3]) == bytes(want[3])


def test_hostile_payloads_raise():
    good = make_gif(10, 10, seed=1)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_gif(good[:10])  # truncated header
    with pytest.raises(ValueError):
        decode_gif(good[:200])  # truncated mid-data
    # dimension bomb: header claims a huge frame. The image descriptor
    # sits at 13 (header) + 768 (256-entry GCT); don't find(0x2C) — the
    # palette bytes can contain 0x2C
    bomb = bytearray(good)
    off = 13 + 768 + 5
    assert bomb[13 + 768] == 0x2C
    bomb[off : off + 4] = struct.pack("<HH", 50000, 50000)
    with pytest.raises(ValueError, match="GIF_DECODE_MAX_SAMPLES"):
        decode_gif(bytes(bomb))
    assert 50000 * 50000 * 3 > GIF_DECODE_MAX_SAMPLES
    # palette index out of range (4-color table, index 3->ok, craft idx>=4)
    packed = 4 | (3 << 3) | (5 << 6)  # clear, literal 3, end — valid
    ok_stream = bytes((packed & 0xFF, (packed >> 8) & 0xFF))
    assert decode_gif(_tiny_gif(ok_stream, w=1))[3] == bytearray((30, 60, 90))
    # LZW output longer than declared frame -> bounded, raises
    too_long = 4 | (1 << 3) | (1 << 6) | (1 << 9) | (1 << 12)
    stream = struct.pack("<I", too_long)[:3] + bytes([5 >> 0])
    with pytest.raises(ValueError):
        decode_gif(_tiny_gif(stream, w=1, h=1))


def test_dispatch_and_features():
    payload = make_gif(12, 7, seed=9)
    feats = multimodal.image_pixel_stats(payload)
    assert feats[:3] == [12.0, 7.0, 3.0]
    assert multimodal._features_dispatch(payload) == feats
    # corrupted GIF falls back to the fake vector, never raises
    assert len(multimodal._features_dispatch(payload[:30])) == 16


def _real_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """A REAL compressing GIF-LZW encoder (dictionary grows, code width
    bumps at exactly 2**width entries) — exists to exercise the
    decoder's growth path, which make_gif's clear-flush writer never
    does."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    acc = nbits = 0
    out = bytearray()

    def put(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear, width)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        put(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            # encoder must widen when next_code reaches 2**width (the
            # decoder widens after APPENDING entry 2**width - 1)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        buf = bytes([b])
    if buf:
        put(table[buf], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decoder_handles_real_lzw_with_width_growth():
    """Roundtrip through a genuinely compressing LZW stream: 4000
    repetitive pixels build a deep dictionary and force multiple width
    bumps (8->9->10 for a 256-color table) — the path make_gif never
    exercises and the classic place GIF decoders get the off-by-one
    wrong."""
    w, h = 80, 50
    indices = bytes((x // 7 + y // 5) % 11 for y in range(h) for x in range(w))
    lzw = _real_lzw_encode(indices, 8)
    # sanity: this stream really is compressed (clear-flush streams are
    # ~9 bits/pixel; dictionary reuse must beat that by a wide margin)
    assert len(lzw) < len(indices)
    palette = b"".join(bytes(((i * 5) % 256, (i * 11) % 256, (i * 17) % 256)) for i in range(256))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    dw, dh, c, samples = decode_gif(bytes(out))
    assert (dw, dh, c) == (w, h, 3)
    want = b"".join(palette[3 * i : 3 * i + 3] for i in indices)
    assert bytes(samples) == want
