"""MP4/ISO-BMFF container header parse + minimal writer — pure stdlib.

Shrinks the video stub to its honest core: FRAME decode still needs
codec libraries (h264/vp9 entropy coding), but the CONTAINER metadata —
duration from `mvhd`, track dimensions from `tkhd` — is a plain box
walk (ISO/IEC 14496-12), the same stdlib-parser pattern as PNG/WAV/GIF.
The writer emits a minimal-but-valid `ftyp`+`moov(mvhd+trak(tkhd))`+
`mdat` file so the parser is exercised end to end and synthetic video
rows carry structurally real payloads.
"""

from __future__ import annotations

import struct
from typing import Optional

_CONTAINERS = {b"moov", b"trak"}  # boxes whose payload is more boxes


def _walk(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (box_type, payload_start, payload_end) for the box list in
    data[start:end]; recurses into container boxes. Depth-capped and
    bounds-checked — truncated/hostile sizes terminate, never loop."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        header = 8
        if size == 1:  # 64-bit largesize
            if body + 8 > end:
                return
            (size,) = struct.unpack(">Q", data[body : body + 8])
            body += 8
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            # malformed size (incl. a largesize smaller than its own
            # 16-byte header, which would invert the payload range):
            # stop walking, parse what we had
            return
        yield typ, body, pos + size
        if typ in _CONTAINERS and depth < 8:
            yield from _walk(data, body, pos + size, depth + 1)
        pos += size


def parse_mp4_info(payload: Optional[bytes]) -> Optional[tuple[int, int, int]]:
    """(width, height, duration_ms) from the container header, or None
    for non-MP4/undecodable bytes. Width/height come from the first
    `tkhd` with non-zero dimensions (16.16 fixed point); duration from
    `mvhd` (movie timescale units)."""
    if payload is None or len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    duration_ms = None
    width = height = None
    for typ, b0, b1 in _walk(payload, 0, len(payload)):
        if typ == b"mvhd" and b1 - b0 >= 24 and duration_ms is None:
            version = payload[b0]
            if version == 1:
                if b1 - b0 < 32:
                    continue
                timescale, duration = struct.unpack(">IQ", payload[b0 + 20 : b0 + 32])
            else:
                timescale, duration = struct.unpack(">II", payload[b0 + 12 : b0 + 20])
            if timescale:
                duration_ms = duration * 1000 // timescale
        elif typ == b"tkhd" and width is None:
            if b1 - b0 < 4:  # truncated box: version byte itself missing
                continue  # (row-never-throws: skip, don't IndexError)
            version = payload[b0]
            # fixed header up to the 36-byte matrix: v0 = 4+4+4+4+4(dur)
            # +8+2+2+2+2 = 36 after the version/flags word; v1 widens the
            # three time fields by 4 each
            off = b0 + 4 + (32 if version == 1 else 20) + 8 + 2 + 2 + 2 + 2 + 36
            if off + 8 <= b1:
                w_fx, h_fx = struct.unpack(">II", payload[off : off + 8])
                if w_fx and h_fx:
                    width, height = w_fx >> 16, h_fx >> 16
    if duration_ms is None and width is None:
        return None
    return (width or 0, height or 0, duration_ms or 0)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def make_mp4(width: int, height: int, duration_ms: int, seed: int = 0) -> bytes:
    """Minimal valid MP4: ftyp + moov(mvhd + trak(tkhd)) + mdat with
    deterministic filler bytes. Timescale 1000 so duration_ms is exact."""
    if width <= 0 or height <= 0 or duration_ms < 0:
        raise ValueError("degenerate video parameters")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">IIII", 0, 0, 1000, duration_ms)  # ctime mtime ts dur
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)  # pre_defined
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3B", 0, 0, 0, 7)  # version 0, flags: enabled
        + struct.pack(">IIIII", 0, 0, 1, 0, duration_ms)  # times, id, dur
        + struct.pack(">8x hh h 2x", 0, 0, 0)  # layer, alt_group, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    filler = bytes((seed * 31 + j * 7) % 256 for j in range(64))
    return ftyp + moov + _box(b"mdat", filler)
