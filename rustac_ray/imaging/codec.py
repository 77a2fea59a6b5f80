"""Image payload codec for the opaque ``bytes`` column of the image table.

No PIL/cv2 in this container, so the engine carries three real,
deterministic formats implemented on numpy + stdlib only:

- ``png``  — a genuine minimal PNG (8-bit RGB, zlib deflate, filter 0) that
  any standard viewer can open. Lossless → the PSNR>=40dB invariant holds
  trivially (PSNR = inf).
- ``raw``  — 12-byte header ``b"RAW0" + <u32 w> + <u32 h>`` + C-order RGB
  bytes. The "cheap" format used to exercise the decode plumbing at scale.
- ``jpeg`` — a REAL baseline JFIF DCT codec (imaging/jpeg.py: standard
  Annex-K tables, 4:4:4, byte-stuffed huffman entropy coding); the lossy
  path whose decoded pixels must meet PSNR≥40dB against the source.

:class:`LossyCodecUnavailable` remains for formats with no codec in this
environment (video — see stages/multimodal.FrameSample).

The per-row invariant from BASELINE.json input_hint — decoded pixels
allclose / PSNR >= 40 dB + caption equality — is enforced in
tests/test_images.py using :func:`psnr`.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "LossyCodecUnavailable",
    "encode_png",
    "decode_png",
    "encode_raw",
    "decode_raw",
    "encode_image",
    "decode_image",
    "psnr",
    "encode_rawv",
    "decode_rawv_frame",
    "rawv_info",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class LossyCodecUnavailable(NotImplementedError):
    """Raised for formats whose codec library is absent in this environment."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """uint8 (H,W,3) RGB → PNG bytes (filter 0 scanlines)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder for the engine's own output (8-bit RGB, filters 0-4)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    idat = []
    w = h = None
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    if (filters == 0).all():
        out[:] = rows[:, 1:]
        return out.reshape(h, w, 3)
    bpp = 3
    for y in range(h):
        f = filters[y]
        line = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(w * 3, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prior) & 0xFF
        else:  # Sub / Average / Paeth need sequential scan
            rec = np.zeros(w * 3, np.int32)
            for i in range(w * 3):
                left = rec[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                rec[i] = (line[i] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


def encode_raw(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"RAW0" + struct.pack("<II", w, h) + pixels.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != b"RAW0":
        raise ValueError("not a RAW0 payload")
    w, h = struct.unpack_from("<II", data, 4)
    return np.frombuffer(data, dtype=np.uint8, offset=12).reshape(h, w, 3)


# default jpeg quality: the synthetic patterns are high-frequency (modular
# sawtooths), where q95 lands ~36dB; q98 clears the input_hint's PSNR≥40dB
# lossy invariant with margin (measured 43.5dB on the worst pattern)
JPEG_QUALITY = 98


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "jpeg":
        from .jpeg import encode_jpeg

        return encode_jpeg(pixels, quality=JPEG_QUALITY)
    raise LossyCodecUnavailable(
        f"encoder for {fmt!r} requires an image library not present in this environment"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "raw":
        return decode_raw(data)
    if fmt == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise LossyCodecUnavailable(
        f"decoder for {fmt!r} requires an image library not present in this environment"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ------------------------------------------------------------ raw video --

_RAWV_MAGIC = b"RAWV"
_RAWV_HDR = 12  # magic(4) + w(2) + h(2) + n_frames(2) + fps(2), little-endian


def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """Deterministic seekable raw-video container: fixed 12-byte header +
    n contiguous uncompressed (h, w, 3) uint8 frames. The O(1) per-frame
    offset is the property real frame-sampling pipelines rely on (decode
    ONLY the sampled frames, never the whole clip)."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    hdr = _RAWV_MAGIC + struct.pack("<HHHH", w, h, n, fps)
    return hdr + frames.tobytes()


def rawv_info(data: bytes) -> tuple[int, int, int, int]:
    """(w, h, n_frames, fps) from the header only — no frame IO."""
    import struct

    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    return struct.unpack("<HHHH", data[4:_RAWV_HDR])


def decode_rawv_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Decode exactly one frame by offset seek (no full-clip decode)."""
    w, h, n, _ = rawv_info(data)
    if not 0 <= frame_idx < n:
        raise IndexError(f"frame {frame_idx} out of range (n={n})")
    sz = w * h * 3
    off = _RAWV_HDR + frame_idx * sz
    return (
        np.frombuffer(data, dtype=np.uint8, count=sz, offset=off)
        .reshape(h, w, 3)
        .copy()
    )
