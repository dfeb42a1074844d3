"""GIF87a/89a decoder + writer — pure stdlib.

Closes the GIF leg of the media pixel-decode family (PNG and baseline
JPEG are in multimodal.py / jpeg.py): LZW decompression with variable
code widths, global/local color tables, interlacing, first-frame
extraction. Same hardening contract as the siblings: bounded output
(GIF_DECODE_MAX_SAMPLES), dictionary bounded at 4096 codes per the
spec, ValueError on malformed input — never garbage output.

The writer emits a spec-valid single-frame GIF using the classic
clear-code-flush technique (dictionary never grows past the initial
width), so any conformant decoder — including this one — reads it back
pixel-exact; GIF is lossless, which makes the roundtrip property test
EXACT, unlike JPEG's tolerance bound.

The reference has no media surface at all; this belongs to the
multimodal column family the graft adds for training-data pipelines.
"""

from __future__ import annotations

import struct

# LZW symbol decode is the pure-python cost driver (~1 dict-entry append
# per pixel); the palette gather itself is a vectorized numpy lookup
GIF_DECODE_MAX_SAMPLES = 4_000_000


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _LzwReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW (variable width, clear/end codes, 4096-entry cap)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LzwReader(data)
    out = bytearray()
    # shared literal objects: a clear code arrives every ~253 symbols
    # from our own writer, so reset must be a cheap list copy, not
    # 2**min_code_size fresh bytes objects per clear
    literals = [bytes([i]) for i in range(clear)] + [b"", b""]

    def reset():
        return list(literals), min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while True:
        code = reader.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before first literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds declared image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[int, int, int, bytearray]:
    """First frame of a GIF → (width, height, 3, interleaved RGB) — the
    decode_png/decode_jpeg contract. Transparency is ignored (the pixel
    takes its palette color); animation beyond frame 1 is ignored."""
    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated header")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    n_bytes = len(payload)
    while pos < n_bytes:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= n_bytes:
                raise ValueError("truncated extension")
            pos += 1
            while pos < n_bytes and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02X}")
        # image descriptor
        if pos + 9 > n_bytes:
            raise ValueError("truncated image descriptor")
        _left, _top, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if iw == 0 or ih == 0:
            raise ValueError("degenerate frame")
        if iw * ih * 3 > GIF_DECODE_MAX_SAMPLES:
            raise ValueError(f"image exceeds GIF_DECODE_MAX_SAMPLES ({iw}x{ih})")
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = payload[pos : pos + 3 * n]
            if len(table) < 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("no color table")
        if pos >= n_bytes:
            raise ValueError("missing LZW data")
        min_code = payload[pos]
        pos += 1
        chunks = bytearray()
        while pos < n_bytes and payload[pos] != 0:
            ln = payload[pos]
            chunks += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # terminator
        indices = _lzw_decode(bytes(chunks), min_code, iw * ih)
        # _lzw_decode raises above iw*ih, this raises below -> exact
        if len(indices) < iw * ih:
            raise ValueError("LZW output shorter than frame")
        if iflags & 0x40:  # interlaced: reorder rows
            rows = [indices[r * iw : (r + 1) * iw] for r in range(ih)]
            ordered: list[bytes | None] = [None] * ih
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, ih, step):
                    ordered[y] = rows[src]
                    src += 1
            indices = bytearray().join(ordered)  # type: ignore[arg-type]
        # numpy palette gather: a cap-sized frame is ~1.3M pixels — a
        # python per-pixel loop here would cost hundreds of ms in the
        # mapInPandas hot path vs ~1ms for the vectorized lookup
        import numpy as np

        n_colors = len(table) // 3
        idx_arr = np.frombuffer(bytes(indices), dtype=np.uint8)
        if int(idx_arr.max()) >= n_colors:
            raise ValueError("palette index out of range")
        pal = np.frombuffer(bytes(table), dtype=np.uint8).reshape(-1, 3)
        return iw, ih, 3, bytearray(pal[idx_arr].tobytes())
    raise ValueError("no image frame")


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _lzw_encode_flushed(indices: bytes, min_code_size: int) -> bytes:
    """Spec-valid LZW stream that never grows the dictionary: emit a
    clear code whenever the next literal would force a width bump.
    Larger than real LZW, decodable by any conformant decoder."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    # after a clear, a decoder adds one table entry per symbol; flush
    # before the table reaches 2**width (when it would widen codes)
    budget = (1 << width) - end - 2
    used = 0
    for idx in indices:
        if used >= budget:
            put(clear)
            used = 0
        put(idx)
        used += 1
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic single-frame GIF with a 256-entry palette and a
    seed-phased pixel pattern; exercised end to end by decode_gif."""
    if width <= 0 or height <= 0:
        raise ValueError("degenerate image")
    palette = bytearray()
    for i in range(256):
        palette += bytes(
            (
                (i * 3 + seed) % 256,
                (i * 7 + seed * 5) % 256,
                (i * 11 + seed * 9) % 256,
            )
        )
    indices = bytes(
        (x * 2 + y * 5 + seed) % 256 for y in range(height) for x in range(width)
    )
    lzw = _lzw_encode_flushed(indices, 8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x07, 0, 0)  # GCT, 256
    out += palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
