"""Distributed trained quality filter: logistic-style regression by
full-corpus gradient descent, bit-exact at ANY parallelism.

The curation stack's learned filter (the fasttext-style quality model of
CCNet/GPT-3 lineage, reduced to its distributed-systems core): featurize
every document, train a linear model by iterative gradient descent where
each epoch is ONE streaming ``map_batches`` pass folding a per-block
gradient partial, driver-reduce, re-broadcast — the same zero-shuffle
iterative shape as the k-means trainer (stages/embed.assign_clusters'
``kmeans_train``).

Everything is DETERMINISTIC and layout-independent, so the trained
weights are bit-identical to a scalar single-threaded twin:

- features are exact rationals of integer counts (no transcendentals);
- the activation is the HARD sigmoid clip(0.5 + z/4, 0, 1) — exact
  float arithmetic, no libm ulp drift between vector and scalar paths;
- per-row gradient contributions are fixed-point-rounded to int64
  BEFORE summation (``rint(g · 2^32)``), so the epoch reduction is an
  exact integer sum — float summation order can never leak into the
  weights no matter how Ray splits the blocks.

Features (per document text, all from integer counts):
  f0 = 1;  f1 = n_chars / 256;  f2 = punct / max(n_chars, 1);
  f3 = stop_words / max(n_words, 1);  f4 = n_chars / max(n_words, 1) / 16;
  f5 = upper_AZ / max(n_chars, 1)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .fold import tree_fold

__all__ = ["featurize", "train_quality_lr", "score_quality_lr",
           "threshold_sweep", "PUNCT", "STOPWORDS", "N_FEATURES"]

PUNCT = ".,;:!?"
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "for", "on", "with", "as", "this")
N_FEATURES = 6
_FIX = float(1 << 32)  # gradient fixed-point scale


def featurize(texts: pd.Series) -> np.ndarray:
    """→ (n, 6) float64 feature matrix; exact rationals of int counts
    (vectorized, but every row value is reproducible by the scalar
    oracle because each is one IEEE division of two ints)."""
    s = texts.fillna("").astype(str)
    n_chars = s.str.len().to_numpy(np.int64)
    punct = s.str.count(f"[{PUNCT}]").to_numpy(np.int64)
    upper = s.str.count(r"[A-Z]").to_numpy(np.int64)
    words = s.str.split()
    n_words = words.str.len().fillna(0).to_numpy(np.int64)
    stops = np.asarray(
        [
            sum(1 for w in ws if w.lower() in STOPWORDS)
            if isinstance(ws, list)
            else 0
            for ws in words
        ],
        np.int64,
    )
    d_c = np.maximum(n_chars, 1).astype(np.float64)
    d_w = np.maximum(n_words, 1).astype(np.float64)
    x = np.empty((len(s), N_FEATURES), np.float64)
    x[:, 0] = 1.0
    x[:, 1] = n_chars / 256.0
    x[:, 2] = punct / d_c
    x[:, 3] = stops / d_w
    x[:, 4] = n_chars / d_w / 16.0
    x[:, 5] = upper / d_c
    return x


def _hard_sigmoid(z: np.ndarray) -> np.ndarray:
    return np.clip(0.5 + z * 0.25, 0.0, 1.0)


def default_label(x: np.ndarray) -> np.ndarray:
    """Weak heuristic label the model distills (1 = quality): prose-like
    stopword density without punctuation soup (thresholds sit at the
    synthetic corpus' f3 median so both classes are populated)."""
    return ((x[:, 3] > 0.06) & (x[:, 2] < 0.05)).astype(np.float64)


def train_quality_lr(
    ds,
    *,
    text_col: str = "text",
    epochs: int = 40,
    lr: float = 2.0,
    label_fn=default_label,
) -> np.ndarray:
    """→ trained weight vector (6,). One streaming pass per epoch:
    per-block int64 gradient partials (fixed-point), driver reduce,
    ``ray.put`` re-broadcast — weights are bit-identical for any block
    layout or worker count."""
    import ray

    n_total = ds.count()
    if n_total == 0:
        raise ValueError("empty dataset")
    w = np.zeros(N_FEATURES, np.float64)
    for _ in range(epochs):
        w_ref = ray.put(w)

        def grad_partial(df: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
            ww = ray.get(_w) if not isinstance(_w, np.ndarray) else _w
            x = featurize(df[text_col])
            y = label_fn(x)
            # explicit per-term dot (fixed expression tree — no BLAS
            # reassociation): z = Σ_j w_j·x_j evaluated left to right
            z = x[:, 0] * ww[0]
            for j in range(1, N_FEATURES):
                z = z + x[:, j] * ww[j]
            err = _hard_sigmoid(z) - y
            g = np.rint(err[:, None] * x * _FIX).astype(np.int64).sum(axis=0)
            return pd.DataFrame([{f"g{j}": g[j] for j in range(N_FEATURES)}])

        parts = ds.map_batches(grad_partial, batch_format="pandas")
        # tree-fold the per-block partials (fold.py discipline — r4
        # VERDICT #9): the driver merges <= fanin rows however many
        # blocks produced gradients; int64 addition is associative, so
        # the fold keeps the bit-identical-at-any-parallelism guarantee
        folded = tree_fold(parts, _sum_grad_block)
        g = np.zeros(N_FEATURES, np.int64)
        for b in folded.iter_batches(batch_format="pandas"):
            for j in range(N_FEATURES):
                g[j] += int(b[f"g{j}"].sum())
        w = w - (lr / n_total) * (g / _FIX)
    return w


def _sum_grad_block(t):
    """tree_fold combiner: one block of int64 gradient partial rows →
    a single summed row (exact, order-free)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pa.table(
        {
            f"g{j}": pa.array(
                [pc.sum(t[f"g{j}"]).as_py() or 0], pa.int64()
            )
            for j in range(N_FEATURES)
        }
    )


def score_quality_lr(
    ds,
    weights: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """→ (id, wx_fixed: int64, kept: bool): score every document with
    the trained weights (broadcast once). ``wx_fixed = rint(z · 2^20)``
    is the hashable integer score; kept = z ≥ 0 (hard-sigmoid ≥ 0.5)."""
    import ray

    w_ref = ray.put(np.asarray(weights, np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ww = ray.get(w_ref) if not isinstance(w_ref, np.ndarray) else w_ref
        x = featurize(df[text_col])
        z = x[:, 0] * ww[0]
        for j in range(1, N_FEATURES):
            z = z + x[:, j] * ww[j]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "wx_fixed": np.rint(z * float(1 << 20)).astype(np.int64),
                "kept": z >= 0.0,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def threshold_sweep(
    ds,
    score_col: str,
    label_col: str,
    thresholds: "list[float]",
):
    """Classifier calibration sweep: per-threshold confusion counts
    (TP/FP/FN/TN at ``score >= t``) in ONE streaming pass — the
    operating-point table a curation pipeline needs before committing a
    quality cutoff at corpus scale. Per-batch partials are a (T, 4)
    int64 matrix (T = #thresholds, constant size), folded with one tiny
    sum — nothing corpus-sized moves. → pandas (threshold, tp, fp, fn,
    tn, precision, recall); counts are exact integers (hash-stable), the
    derived rates are plain double divisions of them.
    """
    thr = np.asarray(list(thresholds), np.float64)
    T = len(thr)
    if T == 0:
        raise ValueError("threshold_sweep: need >= 1 threshold")

    def partial(b: "pa.Table") -> pd.DataFrame:
        s = b[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pred = s[None, :] >= thr[:, None]  # (T, N)
        pos = y[None, :] == 1
        tp = (pred & pos).sum(axis=1)
        fp = (pred & ~pos).sum(axis=1)
        fn = ((~pred) & pos).sum(axis=1)
        tn = ((~pred) & ~pos).sum(axis=1)
        return pd.DataFrame(
            {"_i": np.arange(T, dtype=np.int64),
             "tp": tp.astype(np.int64), "fp": fp.astype(np.int64),
             "fn": fn.astype(np.int64), "tn": tn.astype(np.int64)}
        )

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_i")
        .aggregate(
            Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"), Sum("tn", alias_name="tn"),
        )
        .to_pandas()
        .sort_values("_i")
        .reset_index(drop=True)
    )
    out = pd.DataFrame({"threshold": thr})
    for c in ("tp", "fp", "fn", "tn"):
        out[c] = folded[c].astype("int64")
    denom_p = (out["tp"] + out["fp"]).to_numpy(np.float64)
    denom_r = (out["tp"] + out["fn"]).to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        out["precision"] = np.where(
            denom_p > 0, out["tp"].to_numpy(np.float64) / denom_p, 0.0
        )
        out["recall"] = np.where(
            denom_r > 0, out["tp"].to_numpy(np.float64) / denom_r, 0.0
        )
    return out
