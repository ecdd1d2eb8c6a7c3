"""Pure-Python PNG codec — closes the JPEG/PNG gap from the round-4 verdict.

PNG is zlib-deflate over per-scanline filtered bytes (public spec: RFC 2083 /
W3C PNG 2nd ed.), and CPython ships zlib — so unlike JPEG no numerical
transform is involved and EVERY conforming image round-trips losslessly.
Features are therefore exact integer sums + one division, DuckDB-oracle
reproducible for arbitrary (not just constant-block) payloads.

Scope: 8-bit greyscale (colour type 0), truecolour (2), and truecolour+alpha
(6), non-interlaced, all five filter types. Palette (3), 16-bit, and Adam7
interlace raise MediaDecodeError — strict-contract error rows. The encoder
writes colour types 0/2 with filter 0 and is the synthesis/test helper.

Feature definition (media_codecs contract): per-channel
[sum(channel)/(255*n_px)] over the decoded raster (grey -> 1 feature,
RGB -> 3, RGBA -> 4).
"""

from __future__ import annotations

import struct
import zlib

from .media_codecs import MediaDecodeError

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _crc_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Minimal PNG writer: 8-bit grey (channels=1) or RGB (channels=3),
    filter type 0 on every scanline."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (grey) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _crc_chunk(b"IHDR", ihdr)
        + _crc_chunk(b"IDAT", zlib.compress(raw, 6))
        + _crc_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> dict:
    """Parse + inflate + unfilter; return the media_codecs decode dict."""
    if payload[:8] != PNG_SIG:
        raise MediaDecodeError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise MediaDecodeError("truncated chunk body")
        crc_off = pos + 8 + length
        if crc_off + 4 > len(payload):
            raise MediaDecodeError("truncated chunk crc")
        (crc,) = struct.unpack_from(">I", payload, crc_off)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise MediaDecodeError(f"bad crc in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks: skip
        pos = crc_off + 4
    if ihdr is None:
        raise MediaDecodeError("missing IHDR")
    if not seen_iend:
        raise MediaDecodeError("missing IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise MediaDecodeError("zero image dimension")
    if depth != 8:
        raise MediaDecodeError(f"{depth}-bit depth unsupported (8 only)")
    if color_type not in _CHANNELS:
        raise MediaDecodeError(f"colour type {color_type} unsupported")
    if comp != 0 or filt != 0:
        raise MediaDecodeError("nonzero compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("Adam7 interlace unsupported")
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"IDAT inflate failed: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise MediaDecodeError(
            f"raster size mismatch: got {len(raw)}, "
            f"expected {height * (stride + 1)}"
        )
    prev = bytearray(stride)
    sums = [0] * channels
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise MediaDecodeError(f"bad filter type {ftype} on line {y}")
        for ch in range(channels):
            sums[ch] += sum(line[ch::channels])
        prev = line
    n_px = width * height
    return {
        "codec": "png",
        "width": width,
        "height": height,
        "duration_ms": None,
        "features": [s / (255 * n_px) for s in sums],
    }
