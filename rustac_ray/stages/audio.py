"""Audio payload stages (WAV / PCM16): decode, stats, chunking.

The audio half of the multimodal brief, with a REAL codec: WAV/RIFF is a
pure container format, so decode here is a manual header walk + one
``np.frombuffer`` — no external audio lib needed (the oracle twin decodes
the same bytes with the stdlib ``wave`` module + per-sample struct loops,
a genuinely independent implementation of the same spec).

Same memory discipline as the image stages (stages/multimodal.py): the
``bytes`` column is opaque binary + typed metadata, stages are actor
pools over SMALL batches, and every emitted statistic is INTEGER-exact
(peak, clip counts, sum of squares) so fixtures hash-compare without
float summation hazards. Compressed formats (mp3/opus/...) would slot in
behind the same ``decoded`` flag the image stages use for their
codec-unavailable path.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["decode_wav", "encode_wav", "AudioStats", "chunk_audio",
           "ResampleDownmix", "resample_audio", "DEFAULT_AUDIO_BATCH"]

DEFAULT_AUDIO_BATCH = 256


class WavFormatError(ValueError):
    pass


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """→ (samples int16 (n, channels), sample_rate). Manual RIFF walk:
    accepts standard PCM16 WAVE files with any chunk ordering."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        pos += 8
        body = b[pos : pos + size]
        if cid == b"fmt ":
            if size < 16:
                raise WavFormatError("short fmt chunk")
            audio_fmt, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise WavFormatError(f"unsupported format ({audio_fmt=}, {bits=})")
            fmt = (ch, sr)
        elif cid == b"data":
            data = body
        pos += size + (size & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data is None:
        raise WavFormatError("missing fmt/data chunk")
    ch, sr = fmt
    n = len(data) // (2 * ch)
    samples = np.frombuffer(data[: n * 2 * ch], dtype="<i2").reshape(n, ch)
    return samples, sr


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """PCM16 WAVE writer (inverse of :func:`decode_wav`; roundtrip
    pytest-pinned). ``samples``: (n,) or (n, ch) int16."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * 2 * ch, 2 * ch, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class AudioStats:
    """Actor-pool stage: decode each payload once, emit integer-exact
    per-clip statistics (all channels folded together):

    - ``n_samples`` / ``sample_rate`` / ``channels``
    - ``peak`` — max |sample| (int)
    - ``clip_count`` — samples at full scale (±32767 / −32768)
    - ``sumsq`` — Σ sample² as int64 (RMS = sqrt(sumsq / n) caller-side)
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        n = len(batch)
        ns = np.zeros(n, np.int64)
        sr_ = np.zeros(n, np.int64)
        chs = np.zeros(n, np.int64)
        peak = np.zeros(n, np.int64)
        clip = np.zeros(n, np.int64)
        sumsq = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i in range(n):
            try:
                s, sr = decode_wav(payloads[i])
            except WavFormatError:
                if self.strict:
                    raise
                continue
            v = s.astype(np.int64)
            ns[i] = s.shape[0]
            sr_[i] = sr
            chs[i] = s.shape[1]
            if v.size:
                peak[i] = int(np.abs(v).max())
                clip[i] = int(((v >= 32767) | (v <= -32768)).sum())
                sumsq[i] = int((v * v).sum())
            ok[i] = True
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(sr_, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "clip_count": pa.array(clip, pa.int64()),
                "sumsq": pa.array(sumsq, pa.int64()),
                "decoded": pa.array(ok),
            }
        )


def chunk_audio(
    ds,
    *,
    window: int,
    hop: int | None = None,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = DEFAULT_AUDIO_BATCH,
):
    """→ (audio_id, chunk_idx, start, n_samples, sumsq): fixed-window
    segmentation of each clip (channel 0), the ASR-style pre-chunking
    expansion. Tail windows shorter than ``window`` are emitted (n <
    window) so sample mass is conserved; ``hop`` defaults to ``window``
    (non-overlapping). Per-chunk ``sumsq`` is int64-exact — the energy
    gate for silence trimming downstream."""
    hop = hop or window
    if window < 1 or hop < 1:
        raise ValueError("window and hop must be >= 1")

    class _Chunker:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids_out, idxs, starts, lens, ssq = [], [], [], [], []
            payloads = batch["bytes"].to_pylist()
            aids = batch["audio_id"].to_pylist()
            for i in range(len(batch)):
                try:
                    s, _sr = decode_wav(payloads[i])
                except WavFormatError:
                    continue
                v = s[:, 0].astype(np.int64)
                j = 0
                for st in range(0, max(len(v), 1), hop):
                    w = v[st : st + window]
                    if len(w) == 0:
                        break
                    ids_out.append(aids[i])
                    idxs.append(j)
                    starts.append(st)
                    lens.append(len(w))
                    ssq.append(int((w * w).sum()))
                    j += 1
                    if st + window >= len(v):
                        break
            return pa.table(
                {
                    "audio_id": pa.array(ids_out, pa.string()),
                    "chunk_idx": pa.array(idxs, pa.int64()),
                    "start": pa.array(starts, pa.int64()),
                    "n_samples": pa.array(lens, pa.int64()),
                    "sumsq": pa.array(ssq, pa.int64()),
                }
            )

    return ds.map_batches(
        _Chunker,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResampleDownmix:
    """Actor-pool stage: stereo→mono downmix (per-frame channel sum //
    channels — exact integer floor) + integer-factor decimation by block
    mean (block sum // factor), re-encoded as PCM16 WAV payloads at
    ``sample_rate / factor``. All arithmetic is integer floor division,
    so outputs are byte-deterministic (the md5 oracle compares payloads
    whole). The tail remainder (< factor samples) is dropped —
    n_out = n // factor exactly.
    """

    def __init__(self, factor: int, strict: bool = False):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        n = len(batch)
        out_bytes: list[bytes | None] = [None] * n
        out_sr = np.zeros(n, np.int64)
        out_ns = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        f = self.factor
        for i in range(n):
            try:
                s, sr = decode_wav(payloads[i])
                if sr % f:
                    raise WavFormatError(f"factor {f} does not divide sr {sr}")
            except WavFormatError:
                if self.strict:
                    raise
                continue
            v = s.astype(np.int64)
            mono = v.sum(axis=1) // v.shape[1]
            n_out = len(mono) // f
            pooled = mono[: n_out * f].reshape(n_out, f).sum(axis=1) // f
            out_bytes[i] = encode_wav(pooled.astype(np.int16), sr // f)
            out_sr[i] = sr // f
            out_ns[i] = n_out
            ok[i] = True
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "bytes": pa.array(out_bytes, pa.binary()),
                "sample_rate": pa.array(out_sr, pa.int64()),
                "n_samples": pa.array(out_ns, pa.int64()),
                "decoded": pa.array(ok),
            }
        )


def resample_audio(
    ds,
    factor: int,
    *,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = DEFAULT_AUDIO_BATCH,
):
    """→ (audio_id, bytes, sample_rate, n_samples, decoded): downmixed,
    ``factor``×-decimated PCM16 WAV payloads (see ResampleDownmix)."""
    return ds.map_batches(
        ResampleDownmix,
        fn_constructor_args=(factor,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
