"""Baseline JFIF (JPEG) codec in pure numpy — the real lossy path for the
image table's ``fmt == "jpeg"`` payloads (M12; closes the r01 gap where
jpeg decode was stubbed and the PSNR≥40dB invariant never ran end-to-end).

Scope: baseline DCT process, 8-bit, 3 components, 4:4:4 (no chroma
subsampling), standard Annex-K huffman + quantization tables (published
constants of ISO/IEC 10918-1), one scan. Output is a spec-conforming JFIF
stream that standard viewers open; the decoder handles exactly this
baseline subset (enough for self-produced payloads — the same scoping as
the PNG codec in codec.py).

Vectorization: color transform, block split, DCT/IDCT (one einsum over
all blocks), quantization and zigzag are numpy; only the entropy coding
walks symbols in Python (dozens of symbols per 8×8 block — payload images
are small by design, DEFAULT_IMAGE_BATCH keeps batches small).
"""

from __future__ import annotations

import struct

import functools

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------- spec constants --

# zigzag scan order (spec Figure 5)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 base quantization tables (natural order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K.3 standard huffman tables: (BITS list of 16 counts, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix
_k = np.arange(8)[:, None]
_n = np.arange(8)[None, :]
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_DCT[0] = np.sqrt(1.0 / 8.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """HUFFVAL → (code, length) via canonical assignment (spec C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut_uncached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> tuple[list[int], list[int]]:
    """16-bit-prefix lookup tables (symbol, code length) — one list index
    decodes any huffman symbol (max JPEG code length is 16). Plain Python
    lists: list indexing is ~15x faster than numpy scalar indexing in the
    per-symbol decode loop."""
    sym = np.zeros(1 << 16, dtype=np.int64)
    ln = np.zeros(1 << 16, dtype=np.int64)
    for s, (code, length) in _canonical_codes(list(bits), list(vals)).items():
        start = code << (16 - length)
        end = (code + 1) << (16 - length)
        sym[start:end] = s
        ln[start:end] = length
    return sym.tolist(), ln.tolist()


@functools.lru_cache(maxsize=16)
def _decode_lut_cached(bits: tuple[int, ...], vals: tuple[int, ...]):
    return _decode_lut_uncached(bits, vals)


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    # every self-encoded image uses the standard annex-K tables, so the
    # expensive 65536-entry build runs once per process, not per image
    return _decode_lut_cached(tuple(bits), tuple(vals))


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _to_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H,W) channel → (n_blocks, 8, 8) with edge-replicate padding."""
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    blocks = ch.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, hh // 8, ww // 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, bits) per spec F.1.2.1 (negative values one's-comp)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def encode_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """uint8 (H,W,3) RGB → baseline JFIF bytes (4:4:4, standard tables)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    qy = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)
    ycc = _rgb_to_ycbcr(pixels) - 128.0

    dc_y = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_y = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    # DCT + quantize all channels up front (vectorized over blocks)
    comp_coeffs = []
    for ci in range(3):
        blocks, _, _ = _to_blocks(ycc[..., ci])
        f = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qy if ci == 0 else qc
        comp_coeffs.append(np.round(f / q).astype(np.int64))

    bw = _BitWriter()
    n_blocks = comp_coeffs[0].shape[0]
    pred = [0, 0, 0]
    for b in range(n_blocks):
        for ci in range(3):
            dct_codes = dc_y if ci == 0 else dc_c
            act_codes = ac_y if ci == 0 else ac_c
            zz = comp_coeffs[ci][b].reshape(64)[_ZIGZAG]
            # DC differential
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s, bits = _magnitude(diff)
            code, ln = dct_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(bits, s)
            # AC run-length
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            end = last_nz[-1] + 2 if len(last_nz) else 1
            for k in range(1, end):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s, bits = _magnitude(v)
                code, ln = act_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(bits, s)
                run = 0
            if end < 64:
                code, ln = act_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(q.reshape(64)[_ZIGZAG].astype(np.uint8)))

    def dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += dqt(0, qy) + dqt(1, qc)
    # SOF0: 8-bit, 3 components, all 1x1 sampling (4:4:4)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


class _BitReader:
    """Destuffs the entropy segment once (vectorized), then serves any
    16-bit window with three pure-Python byte reads — bytes indexing is
    ~15x faster per call than a numpy scalar index in this loop."""

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, dtype=np.uint8)
        keep = np.ones(len(arr), dtype=bool)
        if len(arr) > 1:  # drop the 0x00 of every FF00 stuffing pair
            keep[1:][(arr[:-1] == 0xFF) & (arr[1:] == 0x00)] = False
        self.buf = arr[keep].tobytes() + b"\x00" * 8
        self.pos = 0  # bit position

    def peek16(self) -> int:
        p = self.pos
        byte, sh = p >> 3, p & 7
        b = self.buf
        return (((b[byte] << 16) | (b[byte + 1] << 8) | b[byte + 2]) >> (8 - sh)) & 0xFFFF

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    """F.2.2.1 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _read_symbol(br: _BitReader, lut: tuple[list[int], list[int]]) -> int:
    w = br.peek16()
    length = lut[1][w]
    if length == 0:
        raise ValueError("invalid huffman code in JPEG stream")
    br.pos += length
    return lut[0][w]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline 4:4:4 JFIF bytes (this module's encoder subset) → uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q: dict[int, int] = {}
    comp_h: dict[int, tuple[int, int]] = {}
    scan_order: list[int] = []
    scan_start = None
    while pos < len(data):
        (marker,) = struct.unpack_from(">H", data, pos)
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            off = 0
            while off < len(payload):
                pq, tid = payload[off] >> 4, payload[off] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = np.frombuffer(payload, dtype=np.uint8, count=64, offset=off + 1)
                q = np.zeros(64)
                q[_ZIGZAG] = zz
                qtables[tid] = q.reshape(8, 8).astype(np.float64)
                off += 65
        elif marker == 0xFFC4:
            off = 0
            while off < len(payload):
                tclass, tid = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(payload[off + 17 : off + 17 + nv])
                htables[(tclass, tid)] = _decode_lut(bits, vals)
                off += 17 + nv
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload)
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline supported")
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 sampling supported")
                comp_q[cid] = tq
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xFFDA:
            ns = payload[0]
            for i in range(ns):
                cid, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_order.append(cid)
                comp_h[cid] = (tt >> 4, tt & 0xF)
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_start is None or h is None:
        raise ValueError("truncated JPEG")

    br = _BitReader(data[scan_start:])
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    n_blocks = bh * bw_
    coeffs = {cid: np.zeros((n_blocks, 64), dtype=np.float64) for cid in scan_order}
    pred = {cid: 0 for cid in scan_order}
    for b in range(n_blocks):
        for cid in scan_order:
            dc_t = htables[(0, comp_h[cid][0])]
            ac_t = htables[(1, comp_h[cid][1])]
            zz = np.zeros(64)
            s = _read_symbol(br, dc_t)
            diff = _extend(br.read_bits(s), s) if s else 0
            pred[cid] += diff
            zz[0] = pred[cid]
            k = 1
            while k < 64:
                sym = _read_symbol(br, ac_t)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            coeffs[cid][b] = zz
    # dequantize + IDCT, vectorized over all blocks per component
    chans = []
    for cid in scan_order:
        q = qtables[comp_q[cid]]
        f = np.zeros((n_blocks, 64))
        f[:, _ZIGZAG] = coeffs[cid]
        f = f.reshape(n_blocks, 8, 8) * q
        px = np.einsum("ji,njk,kl->nil", _DCT, f, _DCT)
        full = (
            px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        chans.append(full[:h, :w] + 128.0)
    return _ycbcr_to_rgb(np.stack(chans, axis=-1))
