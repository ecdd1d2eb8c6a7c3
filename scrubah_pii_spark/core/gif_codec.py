"""Pure-Python GIF codec — extends the real-media family (wav/ppm/jpeg/png).

GIF (CompuServe GIF87a/GIF89a, public spec) is variable-width LZW over
palette indices; CPython needs nothing beyond `struct` for it. Like PNG it
is LOSSLESS, so every conforming image round-trips exactly and features are
exact integer sums + one division — DuckDB-oracle reproducible for arbitrary
payloads.

Reference behavior parity: the reference app treats images as opaque blobs
routed through parseImage (documented n-a for webtext in SURVEY.md §2.1);
this codec exists for the multimodal-column family the build brief makes
first-class. Decoder scope: first image frame, global or local color table,
both interlaced (GIF 4-pass) and sequential rasters, extension blocks
skipped per spec. Strict contract (media_codecs module doc): a payload whose
signature matches but whose structure doesn't parse raises MediaDecodeError
-> per-row error column.

Feature definition (media_codecs contract): per-channel
[sum(ch)/(255*n_px)] over the palette-mapped RGB raster — 3 features.
"""

from __future__ import annotations

import struct

from .media_codecs import MediaDecodeError

# GIF 4-pass interlace: (start row, row step) per pass, spec Appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --- LZW ----------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Variable-width LZW per the GIF spec: emit Clear first, grow code width
    at table size 2^w, cap at 12 bits and re-Clear."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytearray:
    """Inverse of _lzw_encode; stops at EOI or when n_expected indices are
    produced. Strict: bad codes / truncation raise."""
    if not (2 <= min_code_size <= 8):
        raise MediaDecodeError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise MediaDecodeError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise MediaDecodeError(f"first LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise MediaDecodeError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise MediaDecodeError(
            f"LZW raster short: {len(out)} of {n_expected} indices"
        )
    return out[:n_expected]


# --- container ----------------------------------------------------------------


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Minimal GIF89a writer: global color table, one image, no extensions.
    palette = packed RGB bytes, len must be 3*2^k (2 <= 2^k <= 256);
    indices = w*h palette indices (row-major). Synthesis/test helper."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if len(indices) != width * height:
        raise ValueError("index buffer size mismatch")
    n_colors = len(palette) // 3
    if len(palette) != n_colors * 3 or n_colors < 2 or n_colors > 256:
        raise ValueError("palette must be 3*n bytes, 2 <= n <= 256")
    k = max(1, (n_colors - 1).bit_length())
    pal = palette + b"\x00" * (3 * ((1 << k) - n_colors))
    if max(indices) >= n_colors:
        raise ValueError("index out of palette range")
    lsd = struct.pack("<HHBBB", width, height, 0x80 | (k - 1), 0, 0)
    if interlace:
        rows = bytearray()
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                rows += indices[y * width : (y + 1) * width]
        raster = bytes(rows)
    else:
        raster = indices
    min_code = max(2, k)
    lzw = _lzw_encode(raster, min_code)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    img_desc = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    return (
        b"GIF89a" + lsd + pal + img_desc + bytes([min_code]) + bytes(sub)
        + b"\x3b"
    )


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise MediaDecodeError("truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def decode_gif(payload: bytes) -> dict:
    """Parse header + first image frame; return the media_codecs decode
    dict with palette-mapped per-channel RGB means."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise MediaDecodeError("truncated logical screen descriptor")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise MediaDecodeError("truncated global color table")
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise MediaDecodeError("no image descriptor before EOF")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise MediaDecodeError("trailer before any image frame")
        if block == 0x21:  # extension: label byte then sub-blocks
            if pos >= len(payload):
                raise MediaDecodeError("truncated extension block")
            pos = _skip_sub_blocks(payload, pos + 1)
            continue
        if block == 0x2C:
            break
        raise MediaDecodeError(f"unknown block introducer 0x{block:02x}")
    if pos + 9 > len(payload):
        raise MediaDecodeError("truncated image descriptor")
    _ix, _iy, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if w == 0 or h == 0:
        raise MediaDecodeError("zero image dimension")
    pal = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        pal = payload[pos : pos + 3 * n]
        if len(pal) < 3 * n:
            raise MediaDecodeError("truncated local color table")
        pos += 3 * n
    if not pal:
        raise MediaDecodeError("no color table (global absent, local absent)")
    n_colors = len(pal) // 3
    if pos >= len(payload):
        raise MediaDecodeError("missing LZW min code size")
    min_code = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise MediaDecodeError("truncated image data sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        chunk = payload[pos : pos + n]
        if len(chunk) < n:
            raise MediaDecodeError("truncated image data sub-block")
        lzw += chunk
        pos += n
    raster = _lzw_decode(bytes(lzw), min_code, w * h)
    if ipacked & 0x40:  # de-interlace (4-pass)
        seq = bytearray(w * h)
        src = 0
        for start, step in _INTERLACE_PASSES:
            for y in range(start, h, step):
                seq[y * w : (y + 1) * w] = raster[src : src + w]
                src += w
        raster = seq
    if max(raster) >= n_colors:
        raise MediaDecodeError("palette index out of range")
    # exact integer channel sums via a per-palette-entry histogram
    counts = [0] * n_colors
    for idx in raster:
        counts[idx] += 1
    sums = [0, 0, 0]
    for k in range(n_colors):
        c = counts[k]
        if c:
            sums[0] += c * pal[3 * k]
            sums[1] += c * pal[3 * k + 1]
            sums[2] += c * pal[3 * k + 2]
    n_px = w * h
    return {
        "codec": "gif",
        "width": w,
        "height": h,
        "duration_ms": None,
        "features": [s / (255 * n_px) for s in sums],
    }
