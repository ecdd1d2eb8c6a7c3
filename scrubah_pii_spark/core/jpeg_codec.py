"""Pure-Python baseline JPEG (JFIF) codec — the last real-media branch.

Round-4 verdict item #3: the container has no PIL, so this is a from-scratch
baseline sequential decoder built only from the public ITU-T T.81 spec
(Annex K gives the example Huffman/quant tables used by the encoder below):

- decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker parse, Huffman
  entropy decode with byte-unstuffing, dequantize, dezigzag, float IDCT
  (numpy separable basis), level shift + clamp. Grayscale (1 component) and
  4:4:4 colour (3 components, all 1x1 sampling) are supported; progressive
  (SOF2), arithmetic coding, 12-bit precision and subsampled chroma raise
  MediaDecodeError — strict-contract error rows, not silent fallback.
- encoder: the matching grayscale baseline writer (test/synthesis helper),
  default quant table all-ones so that constant-valued 8x8 blocks round-trip
  EXACTLY (DC = 8*(v-128) is an integer; the IDCT of a DC-only block is a
  constant, so clamp(round(.)) recovers v bit-for-bit). That exactness is
  what lets the q_media_decode DuckDB oracle model JPEG features in closed
  form, same as the WAV/PPM branches.

Feature definition (mirrors media_codecs contract — exact integer sums then
one division): grayscale -> [sum(pixels) / (255 * n_px)]; colour ->
per-channel means of the decoded (un-subsampled) Y, Cb, Cr planes.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import MediaDecodeError

# --- tables (ITU-T T.81 Annex K) --------------------------------------------

# zigzag scan order, generated from the diagonal rule (K.1 figure A.6)
def _zigzag() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        idx = rng if s % 2 == 1 else reversed(rng)
        for i in idx:
            order.append((i, s - i))
    return order


ZIGZAG = _zigzag()

# Annex K.3.3.1 / K.3.3.2: example luminance DC + AC tables
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: row u of A is C(u)/2 * cos((2x+1)u*pi/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


# --- Huffman ----------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG assignment (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise MediaDecodeError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise MediaDecodeError("truncated after 0xFF in scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside the scan (e.g. premature EOI)
                raise MediaDecodeError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise MediaDecodeError("invalid Huffman code in scan")

    def align_and_expect_rst(self, n: int) -> None:
        """Consume padding to a byte boundary + the RSTn marker (E.2.4)."""
        self.nbits = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise MediaDecodeError("expected restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (n % 8):
            raise MediaDecodeError(f"bad restart marker 0xFF{m:02X}")
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding (F.1.2.1): value -> (category, extra bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    extra = v if v >= 0 else v + (1 << size) - 1
    return size, extra


def _extend(extra: int, size: int) -> int:
    """Inverse of _magnitude (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if extra < (1 << (size - 1)):
        return extra - (1 << size) + 1
    return extra


# --- encoder ----------------------------------------------------------------


def encode_jpeg(
    pixels: bytes, width: int, height: int, quant_val: int = 1
) -> bytes:
    """Minimal grayscale baseline-JFIF writer (synthesis/test helper).

    `pixels` = width*height raw gray bytes, row-major. quant_val fills the
    whole quant table (1 => lossless-for-constant-blocks, see module doc).
    Edge blocks are replicated-padded to the 8x8 grid (A.2.1 convention).
    """
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    if not (1 <= quant_val <= 255):
        raise ValueError("quant_val must be 1..255")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:height, :width] = img
    if bw * 8 > width:
        padded[:height, width:] = img[:, -1:]
    if bh * 8 > height:
        padded[height:, :] = padded[height - 1 : height, :]

    qtab = np.full((8, 8), float(quant_val))
    dc_codes = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.rint(_fdct(block) / qtab).astype(np.int64)
            # DC
            diff = int(coef[0, 0]) - prev_dc
            prev_dc = int(coef[0, 0])
            size, extra = _magnitude(diff)
            if size > 11:
                raise ValueError("DC difference out of baseline range")
            code, length = dc_codes[size]
            w.write(code, length)
            if size:
                w.write(extra, size)
            # AC: run-length of zeros + magnitude, ZRL/EOB
            run = 0
            for i, j in ZIGZAG[1:]:
                v = int(coef[i, j])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                size, extra = _magnitude(v)
                if size > 10:
                    raise ValueError("AC coefficient out of baseline range")
                code, length = ac_codes[(run << 4) | size]
                w.write(code, length)
                w.write(extra, size)
                run = 0
            if run:
                code, length = ac_codes[0x00]  # EOB
                w.write(code, length)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = bytes(int(qtab[i, j]) for i, j in ZIGZAG)
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qz)  # DQT: 8-bit precision, id 0
    out += seg(  # SOF0: precision 8, 1 component id=1 sampling 1x1 qtab 0
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )
    out += seg(0xFFC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> dict:
    """Parse baseline-sequential JFIF; return the media_codecs decode dict.

    Features: grayscale -> [sum(gray)/(255*n_px)] (exact integer sum, one
    division — DuckDB-oracle-reproducible); 3-component 4:4:4 -> per-plane
    means of Y, Cb, Cr (no colour transform: the planes themselves are the
    deterministic decode output)."""
    if payload[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None  # (height, width, [(comp_id, h, v, tq), ...])
    restart_interval = 0
    scan = None  # (components [(idx, dc_id, ac_id)], data_start)

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise MediaDecodeError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            raise MediaDecodeError("EOI before SOS")
        length = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise MediaDecodeError("truncated marker segment")
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise MediaDecodeError("16-bit quant tables unsupported")
                vals = body[b + 1 : b + 65]
                if len(vals) < 64:
                    raise MediaDecodeError("truncated quant table")
                tab = np.zeros((8, 8))
                for k, (i, j) in enumerate(ZIGZAG):
                    tab[i, j] = vals[k]
                qtabs[tq] = tab
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                if len(vals) < nv:
                    raise MediaDecodeError("truncated Huffman table")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_map(
                    bits, vals
                )
                b += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise MediaDecodeError(f"{prec}-bit precision unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                f"non-baseline frame type 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise MediaDecodeError("SOS before SOF0")
            ns = body[0]
            comps = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    (k for k, t in enumerate(sof[2]) if t[0] == cs), None
                )
                if idx is None:
                    raise MediaDecodeError(f"scan references unknown component {cs}")
                comps.append((idx, tda >> 4, tda & 0x0F))
            scan = (comps, pos + 2 + length)
            break
        # APPn / COM / others: skip
        pos += 2 + length

    if scan is None:
        raise MediaDecodeError("no SOS marker found")
    height, width, fcomps = sof
    if height == 0 or width == 0:
        raise MediaDecodeError("zero image dimension")
    if len(fcomps) not in (1, 3):
        raise MediaDecodeError(f"{len(fcomps)}-component frames unsupported")
    if any(hs != 1 or vs != 1 for _, hs, vs, _ in fcomps):
        raise MediaDecodeError("subsampled chroma unsupported (4:4:4 only)")

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    planes = [
        np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in fcomps
    ]
    scomps, data_start = scan
    for idx, dc_id, ac_id in scomps:
        if dc_id not in huff_dc or ac_id not in huff_ac:
            raise MediaDecodeError("scan references missing Huffman table")
        if fcomps[idx][3] not in qtabs:
            raise MediaDecodeError("frame references missing quant table")

    r = _BitReader(payload, data_start)
    prev_dc = [0] * len(fcomps)
    mcu = 0
    rst_no = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align_and_expect_rst(rst_no)
                rst_no += 1
                prev_dc = [0] * len(fcomps)
            for idx, dc_id, ac_id in scomps:
                qtab = qtabs[fcomps[idx][3]]
                coef = np.zeros((8, 8))
                size = r.decode_huff(huff_dc[dc_id])
                diff = _extend(r.read_bits(size), size)
                prev_dc[idx] += diff
                coef[0, 0] = prev_dc[idx] * qtab[0, 0]
                k = 1
                while k < 64:
                    rs = r.decode_huff(huff_ac[ac_id])
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise MediaDecodeError("AC run past end of block")
                    i, j = ZIGZAG[k]
                    coef[i, j] = _extend(r.read_bits(size), size) * qtab[i, j]
                    k += 1
                planes[idx][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct(coef) + 128.0
                )
            mcu += 1

    # crop padding, clamp, integerize
    out_planes = [
        np.clip(np.rint(p[:height, :width]), 0, 255).astype(np.int64)
        for p in planes
    ]
    n_px = width * height
    feats = [float(int(p.sum()) / (255 * n_px)) for p in out_planes]
    return {
        "codec": "jpeg",
        "width": width,
        "height": height,
        "duration_ms": None,
        "features": feats,
    }
