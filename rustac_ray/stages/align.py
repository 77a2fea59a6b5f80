"""Caption↔image alignment scoring (the CLIP-score curation filter).

The container has no vision-language model, so the two ENCODERS are
deterministic stand-ins (the task-permitted stub): a hashed bag-of-words
text tower and a G×G block-sum pixel tower. The Ray side is the real
thing — decode-once actor pool over small payload batches, per-batch
vectorized towers, schema/emit layout identical to what a real CLIP
forward pass would produce. Swapping ``_text_tower`` / ``_image_tower``
for a model changes nothing else in the pipeline.

Everything is INTEGER-exact so the contract oracle can hash-compare:

- text tower t ∈ Z^D: each word hashes (md5, first 8 bytes LE) to one
  dimension with a ±1 sign; t = signed word counts in caption order.
- image tower v ∈ Z^D: G×G per-channel block SUMS of the decoded uint8
  pixels (D = G·G·3), trimmed to multiples of G.
- emitted score pieces: ``dot = <t, v>``, ``t_norm2 = |t|²``,
  ``i_norm2 = |v|²`` (all int64 — no float summation anywhere), plus
  ``kept``: cosine ≥ τ evaluated as ``dot > 0 and dot² ≥ τ²·|t|²·|v|²``
  with both sides computed in the SAME float expression engine- and
  oracle-side (identical inputs ⇒ identical result).

Cosine itself is ``dot / sqrt(t_norm2 · i_norm2)`` — left to the caller
(:func:`alignment_cosine`) precisely because floats don't hash-compare.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..imaging.codec import LossyCodecUnavailable, decode_image

__all__ = ["CaptionAlignment", "caption_alignment", "alignment_cosine",
           "GRID", "DIM"]

GRID = 4
DIM = GRID * GRID * 3


def _word_dim_sign(word: str) -> tuple[int, int]:
    h = int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:8], "little")
    return h % DIM, (1 if h >> 63 else -1)


def _text_tower(caption: str) -> np.ndarray:
    t = np.zeros(DIM, np.int64)
    for w in caption.lower().split():
        d, s = _word_dim_sign(w)
        t[d] += s
    return t


def _image_tower(px: np.ndarray) -> np.ndarray:
    h, w = px.shape[0] - px.shape[0] % GRID, px.shape[1] - px.shape[1] % GRID
    p = px[:h, :w].astype(np.int64)
    blocks = p.reshape(GRID, h // GRID, GRID, w // GRID, 3).sum(axis=(1, 3))
    return blocks.reshape(-1)  # (GRID*GRID*3,) row-major


class CaptionAlignment:
    """Actor-pool stage: decode once per row, run both towers, emit the
    integer score pieces (+ ``kept`` at threshold τ)."""

    def __init__(self, tau: float = 0.0, strict: bool = False):
        self.tau = float(tau)
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        captions = batch["caption"].to_pylist()
        n = len(batch)
        dot = np.zeros(n, np.int64)
        tn = np.zeros(n, np.int64)
        vn = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i in range(n):
            try:
                px = decode_image(payloads[i], fmts[i])
            except LossyCodecUnavailable:
                if self.strict:
                    raise
                continue
            t = _text_tower(captions[i] or "")
            v = _image_tower(px)
            dot[i] = int(np.dot(t, v))
            tn[i] = int(np.dot(t, t))
            vn[i] = int(np.dot(v, v))
            ok[i] = True
        # same float expression the oracle uses: identical int inputs ⇒
        # identical bool, no summation-order hazard
        kept = ok & (dot > 0) & (
            dot.astype(np.float64) ** 2
            >= (self.tau ** 2) * tn.astype(np.float64) * vn.astype(np.float64)
        )
        return pa.table(
            {
                "image_id": batch["image_id"],
                "dot": pa.array(dot, pa.int64()),
                "t_norm2": pa.array(tn, pa.int64()),
                "i_norm2": pa.array(vn, pa.int64()),
                "decoded": pa.array(ok),
                "kept": pa.array(kept),
            }
        )


def caption_alignment(
    ds,
    *,
    tau: float = 0.0,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 256,
    keep_only: bool = False,
):
    """→ (image_id, dot, t_norm2, i_norm2, decoded, kept): caption↔image
    alignment pieces per row; ``keep_only=True`` filters to survivors
    (the curation-filter shape)."""
    import pyarrow.compute as pc

    out = ds.map_batches(
        CaptionAlignment,
        fn_constructor_args=(tau,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if keep_only:
        out = out.map_batches(
            lambda b: b.filter(b["kept"]), batch_format="pyarrow"
        )
    return out


def alignment_cosine(dot, t_norm2, i_norm2) -> np.ndarray:
    """Float cosine from the integer pieces (driver/report-side)."""
    denom = np.sqrt(
        np.asarray(t_norm2, np.float64) * np.asarray(i_norm2, np.float64)
    )
    return np.divide(
        np.asarray(dot, np.float64),
        denom,
        out=np.zeros(len(np.atleast_1d(dot))),
        where=denom > 0,
    )
