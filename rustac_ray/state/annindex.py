"""Persistent ANN index artifacts: train once, reuse across jobs.

At 10^12-vector scale the expensive parts of the ANN stack are the
TRAINED artifacts (IVF coarse centroids, PQ codebooks) and the ENCODED
code table (``pq_encode`` output, m bytes/vector). Training re-runs per
job would re-sample the corpus every time; this module checkpoints the
small artifacts as parquet + a json descriptor so a query job loads them
in milliseconds and goes straight to ``ivf_topk`` / ``pq_topk_from_codes``
/ ``ivfpq_topk``. (The code table itself is already a plain Dataset the
caller writes with ``write_parquet`` / ``state.write_partitioned``.)

Layout (one directory per index)::

    index_meta.json     {"kind": "ivfpq", "dim": .., "n_centroids": ..,
                         "m": .., "k": .., "residual": bool, "version": 1}
    centroids.parquet   (centroid_id:int32, centroid:list<float64>)
    codebooks.parquet   (subspace:int32, code:int32, vec:list<float64>)

Writes are atomic per file (tmp + rename); the descriptor is written
LAST, so a partially-written directory never loads.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["save_ann_index", "load_ann_index"]

_VERSION = 1


def _atomic_write_table(table: pa.Table, path: str) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd")
    os.rename(tmp, path)


def save_ann_index(
    out_dir: str,
    *,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    residual: bool = False,
    extra: dict | None = None,
) -> str:
    """Persist trained ANN artifacts; returns ``out_dir``.

    ``centroids``: (n, d) float array from ``train_ivf_centroids``.
    ``codebooks``: (m, k, d/m) float array from ``train_pq`` /
    ``train_pq_residual`` (set ``residual=True`` for the latter so the
    loader knows which scorer the codes pair with).
    """
    if centroids is None and codebooks is None:
        raise ValueError("nothing to save: pass centroids and/or codebooks")
    os.makedirs(out_dir, exist_ok=True)
    meta: dict = {"version": _VERSION, "residual": bool(residual)}
    if centroids is not None:
        c = np.asarray(centroids, np.float64)
        if c.ndim != 2:
            raise ValueError(f"centroids must be (n, d), got shape {c.shape}")
        meta["n_centroids"], meta["dim"] = int(c.shape[0]), int(c.shape[1])
        _atomic_write_table(
            pa.table(
                {
                    "centroid_id": pa.array(np.arange(len(c), dtype=np.int32)),
                    "centroid": pa.array(list(c), pa.list_(pa.float64())),
                }
            ),
            os.path.join(out_dir, "centroids.parquet"),
        )
    if codebooks is not None:
        cb = np.asarray(codebooks, np.float64)
        if cb.ndim != 3:
            raise ValueError(f"codebooks must be (m, k, sub), got shape {cb.shape}")
        m, k, sub = cb.shape
        meta["m"], meta["k"], meta["subdim"] = int(m), int(k), int(sub)
        flat = cb.reshape(m * k, sub)
        _atomic_write_table(
            pa.table(
                {
                    "subspace": pa.array(np.repeat(np.arange(m, dtype=np.int32), k)),
                    "code": pa.array(np.tile(np.arange(k, dtype=np.int32), m)),
                    "vec": pa.array(list(flat), pa.list_(pa.float64())),
                }
            ),
            os.path.join(out_dir, "codebooks.parquet"),
        )
    meta["kind"] = (
        "ivfpq" if centroids is not None and codebooks is not None
        else ("ivf" if centroids is not None else "pq")
    )
    if extra:
        meta["extra"] = extra
    # descriptor last: its presence marks the directory complete
    tmp = os.path.join(out_dir, f"index_meta.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.rename(tmp, os.path.join(out_dir, "index_meta.json"))
    return out_dir


def load_ann_index(index_dir: str) -> dict:
    """→ {"kind", "centroids": (n,d)|None, "codebooks": (m,k,sub)|None,
    "residual": bool, "meta": dict} — bit-identical float64 arrays."""
    meta_path = os.path.join(index_dir, "index_meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{index_dir}: no index_meta.json (incomplete or missing index)"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(f"unsupported index version {meta.get('version')!r}")
    centroids = codebooks = None
    cpath = os.path.join(index_dir, "centroids.parquet")
    if os.path.exists(cpath):
        t = pq.read_table(cpath)
        order = np.argsort(t["centroid_id"].to_numpy())
        centroids = np.stack(
            t["centroid"].to_numpy(zero_copy_only=False)[order]
        ).astype(np.float64)
    bpath = os.path.join(index_dir, "codebooks.parquet")
    if os.path.exists(bpath):
        t = pq.read_table(bpath)
        m, k, sub = meta["m"], meta["k"], meta["subdim"]
        flat = np.zeros((m * k, sub), np.float64)
        idx = t["subspace"].to_numpy().astype(np.int64) * k + t["code"].to_numpy()
        flat[idx] = np.stack(t["vec"].to_numpy(zero_copy_only=False))
        codebooks = flat.reshape(m, k, sub)
    return {
        "kind": meta["kind"],
        "centroids": centroids,
        "codebooks": codebooks,
        "residual": bool(meta.get("residual", False)),
        "meta": meta,
    }
