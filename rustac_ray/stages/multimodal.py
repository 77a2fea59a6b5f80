"""Multimodal (image payload) stages: decode / feature-extract / resize.

The ``bytes`` column is treated as an opaque binary payload with typed
metadata (w, h, fmt) — exactly the input_hint schema. Stages are actor
pools (``map_batches(Cls, concurrency=N, batch_size=small)``): codecs and
buffers initialize once per actor; batches stay SMALL because each row
carries kilobytes of binary (memory-aware sizing, SURVEY.md §4).

Real codecs for png/raw/jpeg (pure numpy + stdlib,
rustac_ray.imaging.codec + imaging.jpeg — jpeg is a genuine baseline JFIF
DCT codec); only video frame decode remains stubbed
(LossyCodecUnavailable) since no video codec exists in this container.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..imaging.codec import LossyCodecUnavailable, decode_image
from ..imaging.phash import average_hash

__all__ = ["DecodeStats", "BandMath", "Thumbnail", "VerifyPayload",
           "RandomCrop", "DEFAULT_IMAGE_BATCH"]

# image rows are wide (KBs of binary each): keep payload batches small so
# batch_size x concurrency x row_width stays well inside a worker heap
DEFAULT_IMAGE_BATCH = 256


class DecodeStats:
    """Decode each payload and emit per-image pixel statistics
    (mean/std per channel + recomputed phash). Skips undecodable formats
    unless strict=True."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n = len(batch)
        mean = np.full((n, 3), np.nan)
        std = np.full((n, 3), np.nan)
        ph = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = decode_image(payloads[i], fmts[i])
            except LossyCodecUnavailable:
                if self.strict:
                    raise
                continue
            f = px.reshape(-1, 3).astype(np.float64)
            mean[i] = f.mean(axis=0)
            std[i] = f.std(axis=0)
            ph[i] = average_hash(px)
            ok[i] = True
        out = batch.select(["image_id", "w", "h", "fmt"])
        out = out.append_column("decoded", pa.array(ok))
        for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
            out = out.append_column(name, pa.array(mean[:, c], pa.float64()))
        for c, name in enumerate(("std_r", "std_g", "std_b")):
            out = out.append_column(name, pa.array(std[:, c], pa.float64()))
        out = out.append_column("phash_recomputed", pa.array(ph, pa.int64()))
        return out


class BandMath:
    """Per-image band algebra (r5): decode once, fold the
    normalized-difference index (R−G)/(R+G) — the NDVI shape on the
    synthetic RGB's first two channels — as INTEGER partials:
    ``sum_diff = Σ(R−G)``, ``sum_plus = Σ(R+G)``, ``n_px``. Integer
    sums are exact and order-free (hashable against a scalar oracle);
    the float index mean derives as one division downstream. The
    actor-pool decode-once shape of every pixel op here."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n = len(batch)
        npx = np.zeros(n, np.int64)
        sdiff = np.zeros(n, np.int64)
        splus = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i in range(n):
            try:
                px = decode_image(payloads[i], fmts[i])
            except LossyCodecUnavailable:
                if self.strict:
                    raise
                continue
            f = px.reshape(-1, 3).astype(np.int64)
            npx[i] = len(f)
            sdiff[i] = int((f[:, 0] - f[:, 1]).sum())
            splus[i] = int((f[:, 0] + f[:, 1]).sum())
            ok[i] = True
        out = batch.select(["image_id"])
        out = out.append_column("decoded", pa.array(ok))
        out = out.append_column("n_px", pa.array(npx, pa.int64()))
        out = out.append_column("sum_diff", pa.array(sdiff, pa.int64()))
        out = out.append_column("sum_plus", pa.array(splus, pa.int64()))
        return out


class Thumbnail:
    """Decode → box-downsample to (size × size) → re-encode png.

    The resize kernel is pure numpy (bucket means); output schema is
    (image_id, thumb: binary, w, h)."""

    def __init__(self, size: int = 8):
        self.size = size

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        s = self.size
        ys = (np.arange(h) * s) // h
        xs = (np.arange(w) * s) // w
        out = np.zeros((s, s, 3))
        cnt = np.zeros((s, s, 1))
        np.add.at(out, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), px)
        np.add.at(cnt, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), 1.0)
        return (out / np.maximum(cnt, 1)).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import encode_png

        thumbs = []
        for payload, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            try:
                px = decode_image(payload, fmt)
            except LossyCodecUnavailable:
                thumbs.append(None)
                continue
            thumbs.append(encode_png(self._resize(px)))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "thumb": pa.array(thumbs, pa.binary()),
                "w": pa.array([self.size] * len(batch), pa.int32()),
                "h": pa.array([self.size] * len(batch), pa.int32()),
            }
        )


class VerifyPayload:
    """The per-row invariant stage (BASELINE.json input_hint): decoded
    pixels vs the expected deterministic pattern — PSNR ≥ 40 dB (inf for
    lossless) — plus caption equality and stored-phash equality.

    Emits (image_id, psnr_ok, caption_ok, phash_ok)."""

    def __init__(self, expected_pixels_fn, expected_caption_fn):
        self.pixels_fn = expected_pixels_fn
        self.caption_fn = expected_caption_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import psnr

        ids = batch["image_id"].to_pylist()
        n = len(batch)
        psnr_ok = np.zeros(n, dtype=bool)
        caption_ok = np.zeros(n, dtype=bool)
        phash_ok = np.zeros(n, dtype=bool)
        for i in range(n):
            idx = int(ids[i].split("-")[1])
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            try:
                px = decode_image(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            except LossyCodecUnavailable:
                continue
            expected = self.pixels_fn(idx, w, h)
            psnr_ok[i] = psnr(px, expected) >= 40.0
            caption_ok[i] = batch["caption"][i].as_py() == self.caption_fn(idx)
            phash_ok[i] = batch["phash"][i].as_py() == average_hash(px)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "psnr_ok": pa.array(psnr_ok),
                "caption_ok": pa.array(caption_ok),
                "phash_ok": pa.array(phash_ok),
            }
        )


class FrameSample:
    """Video frame-sampling stage: emit every ``every_n``-th frame of each
    clip as PNG rows (media_id, frame_idx, frame_png).

    The ``rawv`` container (imaging.codec — deterministic seekable raw
    video, the container-permitted stand-in for real codecs) decodes for
    real via O(1) offset seeks: only the SAMPLED frames are ever read,
    never the whole clip — the property a 100-TB video pipeline depends
    on. Compressed formats (mp4/webm…) still raise LossyCodecUnavailable
    (no codec library in this container, task-permitted stub path);
    ``strict=False`` skips them, mirroring DecodeStats."""

    OUTPUT_SCHEMA = pa.schema(
        [
            ("media_id", pa.string()),
            ("frame_idx", pa.int32()),
            ("frame_png", pa.binary()),
        ]
    )

    def __init__(self, every_n_frames: int = 30, strict: bool = False):
        self.every_n = every_n_frames
        self.strict = strict

    def decode_frame(self, payload: bytes, fmt: str, frame_idx: int) -> np.ndarray:
        if fmt == "rawv":
            from ..imaging.codec import decode_rawv_frame

            return decode_rawv_frame(payload, frame_idx)
        raise LossyCodecUnavailable(
            f"video codec for {fmt!r} not available in this environment"
        )

    def _n_frames(self, payload: bytes, fmt: str) -> int:
        if fmt == "rawv":
            from ..imaging.codec import rawv_info

            return rawv_info(payload)[2]
        raise LossyCodecUnavailable(
            f"video codec for {fmt!r} not available in this environment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging.codec import encode_png

        out_ids, out_idx, out_png = [], [], []
        id_col = "media_id" if "media_id" in batch.column_names else "image_id"
        for mid, payload, fmt in zip(
            batch[id_col].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            try:
                n = self._n_frames(payload, fmt)
                for idx in range(0, n, self.every_n):
                    frame = self.decode_frame(payload, fmt, idx)
                    out_ids.append(mid)
                    out_idx.append(idx)
                    out_png.append(encode_png(frame))
            except LossyCodecUnavailable:
                if self.strict:
                    raise
                continue  # codec-less format: no frames emitted
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame_png": pa.array(out_png, pa.binary()),
            }
        )


class RandomCrop:
    """Deterministic training-augmentation crop: decode → take a
    (crop × crop) window at an offset derived from a seeded splitmix64
    hash of ``image_id`` → emit the window's exact integer channel sums.

    "Random" but REPRODUCIBLE: the offset is a pure function of
    (image_id, seed), so re-running the pipeline — or resuming it from a
    checkpoint manifest on a different cluster layout — crops every image
    identically (the same property the deterministic shuffle relies on).
    Images smaller than the crop emit their full extent. Integer sums
    (not float means) keep the oracle comparison exact.
    """

    def __init__(self, crop: int = 16, seed: int = 0, strict: bool = True):
        self.crop = int(crop)
        self.seed = int(seed)
        self.strict = strict

    @staticmethod
    def _splitmix64(x: np.ndarray) -> np.ndarray:
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def offsets(self, image_ids, w: np.ndarray, h: np.ndarray):
        """Vectorized (ox, oy) per image: two lanes of one splitmix64."""
        base = np.array(
            [hash_bytes_u64(s.encode()) for s in image_ids], dtype=np.uint64
        )
        hx = self._splitmix64(base + np.uint64(2 * self.seed))
        hy = self._splitmix64(base + np.uint64(2 * self.seed + 1))
        span_x = np.maximum(w - self.crop, 0).astype(np.uint64) + np.uint64(1)
        span_y = np.maximum(h - self.crop, 0).astype(np.uint64) + np.uint64(1)
        return (hx % span_x).astype(np.int64), (hy % span_y).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        w = batch["w"].to_numpy().astype(np.int64)
        h = batch["h"].to_numpy().astype(np.int64)
        ox, oy = self.offsets(ids, w, h)
        cw = np.minimum(w, self.crop)
        ch = np.minimum(h, self.crop)
        sums = np.zeros((len(ids), 3), np.int64)
        for i, (payload, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            try:
                px = decode_image(payload, fmt)
            except LossyCodecUnavailable:
                if self.strict:
                    raise
                ch[i] = cw[i] = 0
                continue
            win = px[oy[i] : oy[i] + ch[i], ox[i] : ox[i] + cw[i]]
            sums[i] = win.reshape(-1, 3).astype(np.int64).sum(axis=0)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "crop_x": pa.array(ox, pa.int64()),
                "crop_y": pa.array(oy, pa.int64()),
                "crop_w": pa.array(cw, pa.int64()),
                "crop_h": pa.array(ch, pa.int64()),
                "sum_r": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_b": pa.array(sums[:, 2]),
            }
        )


def hash_bytes_u64(b: bytes) -> int:
    """Stable 64-bit FNV-1a over bytes (no PYTHONHASHSEED dependence)."""
    h = 0xCBF29CE484222325
    for byte in b:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# SDXL-style training buckets, sorted by aspect ratio ascending
DEFAULT_ASPECT_BUCKETS = [
    (640, 1536), (768, 1344), (832, 1216), (896, 1152), (1024, 1024),
    (1152, 896), (1216, 832), (1344, 768), (1536, 640),
]


def aspect_buckets(ds, buckets=None, *, w_col: str = "w", h_col: str = "h",
                   id_col: str = "image_id"):
    """Aspect-ratio bucketing (the SDXL/NovelAI training recipe): assign
    every image to the bucket whose target aspect ratio is nearest to
    w/h, so variable-shape images batch into fixed-shape tensors with
    minimal crop/pad waste → (id_col, bucket_id, target_w, target_h).

    The nearest-ratio rule is evaluated with EXACT integer arithmetic:
    the midpoint boundary between consecutive sorted ratios p_k/q_k and
    p_{k+1}/q_{k+1} is crossed iff ``w * 2*q_k*q_{k+1} > h * (p_k*q_{k+1}
    + p_{k+1}*q_k)``, so bucket_id = #boundaries exceeded — no float
    ratio or log ever computed, ties go to the narrower bucket, and the
    SQL twin is a sum of identical integer comparisons (IEEE-proof).

    Shuffle-free: one vectorized (n × K-1) integer comparison per batch;
    read only (id, w, h) — the bytes column never leaves storage.
    """
    bk = [(int(p), int(q)) for p, q in (buckets or DEFAULT_ASPECT_BUCKETS)]
    ratios = [(p / q, i) for i, (p, q) in enumerate(bk)]
    if sorted(ratios) != ratios:
        raise ValueError("buckets must be sorted by aspect ratio ascending")
    # boundary k between bucket k and k+1: crossed iff w*D[k] > h*C[k]
    D = np.array([2 * bk[k][1] * bk[k + 1][1] for k in range(len(bk) - 1)],
                 dtype=np.int64)
    C = np.array(
        [bk[k][0] * bk[k + 1][1] + bk[k + 1][0] * bk[k][1]
         for k in range(len(bk) - 1)],
        dtype=np.int64,
    )
    tw = pa.array([p for p, _ in bk], pa.int32())
    th = pa.array([q for _, q in bk], pa.int32())

    def assign(batch: pa.Table) -> pa.Table:
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch[h_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = (w[:, None] * D[None, :] > h[:, None] * C[None, :]).sum(axis=1)
        ia = pa.array(idx, pa.int64())
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket_id": ia,
                "target_w": tw.take(ia),
                "target_h": th.take(ia),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
