"""Independent naive re-implementations used ONLY as test oracles.

NOT part of the engine. The driver's correctness gate compares every
``queries()`` entry against ``oracle_sql()`` via DuckDB; operators whose
semantics aren't SQL-expressible (exact intersects on concave polygons,
LSH near-dup, stopword language-ID, simhash) are oracled by precomputing
the EXPECTED result here — with deliberately plain, per-row scalar code,
structured nothing like the engine's vectorized/distributed paths — into
fixture parquet that the oracle SQL simply SELECTs from. A bug in the
engine's vectorization, banding, shuffling, or dedup then shows up as a
driver hash mismatch.

Everything is deterministic (pure function of the sf input tables +
seed), so fixture generation races are benign. ``ensure_derived_fixtures``
is called from ``oracle_sql()``; files land next to the synth fixtures
under /tmp/rustac_fixtures/<tag>/.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import synth

DERIVED_VERSION = "31"

_U64 = 1 << 64
_MERSENNE = (1 << 61) - 1


# ----------------------------------------------------- spatial join oracle --


def _point_on_ring_edge(px: float, py: float, ring: list) -> bool:
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (
            min(x1, x2) - 1e-12 <= px <= max(x1, x2) + 1e-12
            and min(y1, y2) - 1e-12 <= py <= max(y1, y2) + 1e-12
            and abs(cross) < 1e-9
        ):
            return True
    return False


def _point_in_ring(px: float, py: float, ring: list) -> bool:
    """Plain scalar crossing-number test (even-odd); edges excluded here."""
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def _point_in_polygon(px, py, geom) -> bool:
    """Even-odd over each polygon's rings (holes subtract); any edge hit
    counts as inside (DE-9IM intersects is inclusive of boundaries)."""
    polys = [geom["coordinates"]] if geom["type"] == "Polygon" else geom["coordinates"]
    for rings in polys:
        if any(_point_on_ring_edge(px, py, r) for r in rings):
            return True
        if sum(_point_in_ring(px, py, r) for r in rings) % 2 == 1:
            return True
    return False


def _segs_intersect(p1, p2, q1, q2) -> bool:
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    d1, d2 = orient(q1, q2, p1), orient(q1, q2, p2)
    d3, d4 = orient(p1, p2, q1), orient(p1, p2, q2)
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and (
        (d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0
    ):
        # conservative inclusive test with bbox guard for collinear cases
        if (
            max(min(p1[0], p2[0]), min(q1[0], q2[0]))
            <= min(max(p1[0], p2[0]), max(q1[0], q2[0])) + 1e-12
            and max(min(p1[1], p2[1]), min(q1[1], q2[1]))
            <= min(max(p1[1], p2[1]), max(q1[1], q2[1])) + 1e-12
        ):
            return True
    return False


def _rect_intersects_geom(xmin, ymin, xmax, ymax, geom) -> bool:
    """Axis-aligned rect vs GeoJSON geometry, plain scalar logic."""
    if geom["type"] == "Point":
        px, py = geom["coordinates"][:2]
        return xmin <= px <= xmax and ymin <= py <= ymax
    rings = (
        geom["coordinates"]
        if geom["type"] == "Polygon"
        else [r for poly in geom["coordinates"] for r in poly]
    )
    # any polygon vertex inside the rect
    for ring in rings:
        for v in ring:
            if xmin <= v[0] <= xmax and ymin <= v[1] <= ymax:
                return True
    # any rect corner inside the polygon
    for cx, cy in ((xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)):
        if _point_in_polygon(cx, cy, geom):
            return True
    # any edge pair crossing
    rect = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
    for ring in rings:
        n = len(ring)
        for i in range(n):
            a = (ring[i][0], ring[i][1])
            b = (ring[(i + 1) % n][0], ring[(i + 1) % n][1])
            for j in range(4):
                if _segs_intersect(rect[j], rect[(j + 1) % 4], a, b):
                    return True
    return False


def _expected_join_pairs(fdir: str) -> pa.Table:
    """Brute-force every (image, query) pair: synth footprints are
    axis-aligned rects (synth.py transform has zero rotation), so the exact
    predicate is rect ∩ geometry."""
    from .geo.wkb import decode_geometry  # shared data-format codec only

    imgs = pq.read_table(
        os.path.join(fdir, "images.parquet"), columns=["image_id", "w", "h", "transform"]
    )
    t = np.asarray(imgs["transform"].to_pylist(), dtype=np.float64)
    w = imgs["w"].to_numpy().astype(np.float64)
    h = imgs["h"].to_numpy().astype(np.float64)
    xmin = t[:, 2]
    xmax = t[:, 2] + t[:, 0] * w
    ymax = t[:, 5]
    ymin = t[:, 5] + t[:, 4] * h
    ids = imgs["image_id"].to_pylist()
    geoms = pq.read_table(os.path.join(fdir, "query_geoms.parquet"))
    out_i, out_q = [], []
    for qi in range(len(geoms)):
        qid = geoms["query_id"][qi].as_py()
        g = decode_geometry(bytes(geoms["geometry"][qi].as_py()))
        for k in range(len(ids)):
            if _rect_intersects_geom(xmin[k], ymin[k], xmax[k], ymax[k], g):
                out_i.append(ids[k])
                out_q.append(qid)
    return pa.table(
        {"image_id": pa.array(out_i, pa.string()), "query_id": pa.array(out_q, pa.string())}
    )


# --------------------------------------------------------- simhash oracle ---


def _naive_simhash(text: str) -> int:
    toks = set(re.findall(r"\w+", str(text).lower()))
    acc = [0] * 64
    for t in toks:
        hv = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        for i in range(64):
            acc[i] += 1 if (hv >> i) & 1 else -1
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - _U64 if v >= (1 << 63) else v


def _expected_simhash(docs: pa.Table) -> pa.Table:
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(ids, docs["doc_id"].type),
            "simhash": pa.array([_naive_simhash(t) for t in texts], pa.int64()),
        }
    )


# --------------------------------------------------------- minhash oracle ---


def _naive_ngram_pairs(
    docs: pa.Table,
    *,
    n: int = 4,
    threshold: float = 0.8,
    est_margin: float = 0.2,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> pa.Table:
    """Oracle twin of ngram_jaccard_near_dup: the SAME LSH banding (16×4)
    and estimate gate, then EXACT shingle-set Jaccard — computed with
    per-doc scalar loops and python sets, nothing shared with the engine's
    explode/groupby/broadcast path. The banding + gate are part of the
    operator's definition (dedup.py ngram_jaccard_near_dup docstring)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    a_i = [int(x) for x in a]
    b_i = [int(x) for x in b]
    weights = [pow(257, j) % _U64 for j in range(n)]
    est_gate = max(0.0, threshold - est_margin)

    def shingles_and_sig(text: str) -> tuple:
        data = str(text).lower().encode("utf-8", "ignore")
        if len(data) < n:
            data = data + b"\x00" * (n - len(data))
        sh = set()
        for i in range(len(data) - n + 1):
            v = 0
            for j in range(n):
                v = (v + data[i + j] * weights[j]) % _U64
            sh.add(v)
        if not sh:
            return frozenset(), tuple([0] * num_perm)
        sig = []
        sh_arr = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        for p in range(num_perm):
            with np.errstate(over="ignore"):
                vals = (np.uint64(a_i[p]) * sh_arr + np.uint64(b_i[p])) % np.uint64(
                    _MERSENNE
                )
            sig.append(int(vals.min()))
        return frozenset(sh), tuple(sig)

    ids = docs["doc_id"].to_pylist()
    both = [shingles_and_sig(t) for t in docs["text"].to_pylist()]
    rows_per_band = num_perm // bands
    out_a, out_b, out_j = [], [], []
    order = np.argsort(np.asarray(ids))
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            (sha, si), (shb, sj) = both[i], both[j]
            shared_band = any(
                si[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                == sj[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                for bnd in range(bands)
            )
            if not shared_band:
                continue
            est = sum(x == y for x, y in zip(si, sj)) / num_perm
            if est < est_gate:
                continue
            union = len(sha | shb)
            jac = len(sha & shb) / union if union else 1.0
            if jac >= threshold:
                out_a.append(ids[i])
                out_b.append(ids[j])
                out_j.append(jac)
    return pa.table(
        {
            "id_a": pa.array(out_a, docs["doc_id"].type),
            "id_b": pa.array(out_b, docs["doc_id"].type),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


def _naive_minhash_pairs(
    docs: pa.Table,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 4,
    seed: int = 42,
    threshold: float = 0.7,
) -> pa.Table:
    """All-pairs LSH semantics, computed directly: candidate iff any band of
    the two signatures is elementwise-equal; keep iff estimated jaccard
    (mean signature agreement) >= threshold. Per-doc scalar/loop structure,
    nothing shared with the engine's explode/groupby path. The hash-family
    parameters (a, b from the seeded rng) are part of the operator's
    definition, reproduced here from the spec."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    a_i = [int(x) for x in a]
    b_i = [int(x) for x in b]
    weights = [pow(257, j) % _U64 for j in range(shingle)]

    def signature(text: str) -> tuple:
        data = str(text).lower().encode("utf-8", "ignore")
        if len(data) < shingle:
            data = data + b"\x00" * (shingle - len(data))
        sh = set()
        for i in range(len(data) - shingle + 1):
            v = 0
            for j in range(shingle):
                v = (v + data[i + j] * weights[j]) % _U64
            sh.add(v)
        if not sh:
            return tuple([0] * num_perm)
        sig = []
        sh_arr = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        for p in range(num_perm):
            with np.errstate(over="ignore"):
                vals = (np.uint64(a_i[p]) * sh_arr + np.uint64(b_i[p])) % np.uint64(
                    _MERSENNE
                )
            sig.append(int(vals.min()))
        return tuple(sig)

    ids = docs["doc_id"].to_pylist()
    sigs = [signature(t) for t in docs["text"].to_pylist()]
    rows_per_band = num_perm // bands
    out_a, out_b = [], []
    order = np.argsort(np.asarray(ids))
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            si, sj = sigs[i], sigs[j]
            shared_band = any(
                si[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                == sj[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                for bnd in range(bands)
            )
            if not shared_band:
                continue
            est = sum(x == y for x, y in zip(si, sj)) / num_perm
            if est >= threshold:
                out_a.append(ids[i])
                out_b.append(ids[j])
    return pa.table(
        {
            "id_a": pa.array(out_a, docs["doc_id"].type),
            "id_b": pa.array(out_b, docs["doc_id"].type),
        }
    )


def _expected_components(pairs: pa.Table) -> pa.Table:
    """Plain union-find over the expected pair set (component = min id)."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ia, ib in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        for v in (ia, ib):
            if v not in parent:
                parent[v] = v
        ra, rb = find(ia), find(ib)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pa.table(
        {
            "node": pa.array(nodes, pairs["id_a"].type),
            "component": pa.array([find(n) for n in nodes], pairs["id_a"].type),
        }
    )


# ---------------------------------------------------------- langid oracle ---


def _expected_langid(docs: pa.Table) -> pa.Table:
    """Plain scalar stopword voting (the spec of stages.text.LangId):
    language with the strictly highest stopword hit count among the first
    200 lowercase word tokens; ties and zero hits → 'und'."""
    from .stages.text import _STOPWORDS  # the table IS the spec constant

    token_re = re.compile(r"[a-zà-ÿ]+")
    preds = []
    for t in docs["text"].to_pylist():
        toks = token_re.findall(str(t).lower())[:200]
        best, best_n = "und", 0
        for lang, table in _STOPWORDS.items():
            n = sum(tok in table for tok in toks)
            if n > best_n:
                best, best_n = lang, n
        preds.append(best)
    return pa.table(
        {
            "doc_id": pa.array(docs["doc_id"].to_pylist(), docs["doc_id"].type),
            "lang_pred": pa.array(preds, pa.string()),
        }
    )


# ----------------------------------------------------- fingerprint oracle ---


def _expected_fingerprints(docs: pa.Table) -> pa.Table:
    """Scalar Horner evaluation of the rolling polynomial fingerprint
    (stages/text.Fingerprint computes the same value via vectorized
    power accumulation: Σ b_i · B^(n-i) mod 2^64)."""
    base = 1099511628211
    out = []
    for t in docs["text"].to_pylist():
        h = 0
        for b in str(t).encode("utf-8", "ignore"):
            h = ((h + b) * base) % _U64
        out.append(h - _U64 if h >= (1 << 63) else h)
    return pa.table(
        {
            "doc_id": pa.array(docs["doc_id"].to_pylist(), docs["doc_id"].type),
            "fingerprint": pa.array(out, pa.int64()),
        }
    )


# -------------------------------------------------- approx-distinct oracle --


def _expected_approx_distinct(sf_dir: str, p: int = 12) -> pa.Table:
    """Plain scalar HyperLogLog over events (the spec of
    stages.sketch.approx_distinct): per event_type, the estimated distinct
    user_id count. Deliberately per-row Python — splitmix64 in plain int
    arithmetic, registers in a list — nothing like the vectorized
    per-batch combiner + register-merge shuffle in the engine."""
    import math

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    m = 1 << p
    regs: dict = {}
    for et, uid in zip(ev["event_type"].to_pylist(), ev["user_id"].to_pylist()):
        z = (uid + 0x9E3779B97F4A7C15) % _U64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % _U64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % _U64
        h = z ^ (z >> 31)
        bucket = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - rest.bit_length() + 1
        r = regs.setdefault(et, [0] * m)
        if rho > r[bucket]:
            r[bucket] = rho
    groups, ests = [], []
    for et in sorted(regs):
        r = regs[et]
        if m == 16:
            alpha = 0.673
        elif m == 32:
            alpha = 0.697
        elif m == 64:
            alpha = 0.709
        else:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / sum(2.0 ** (-x) for x in r)
        zeros = sum(1 for x in r if x == 0)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        groups.append(et)
        ests.append(int(round(est)))
    return pa.table(
        {
            "event_type": pa.array(groups, pa.string()),
            "approx_distinct": pa.array(ests, pa.int64()),
        }
    )


# ------------------------------------------------------- packing oracle ----


def _expected_packing(
    docs: pa.Table, budget: int = 256, num_buckets: int = 16
) -> pa.Table:
    """Plain scalar re-implementation of stages.packing.pack_sequences:
    per-doc Knuth-hash bucket, ascending-id order, next-fit greedy fill."""
    rows = []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        n_tok = len(str(text).split())
        bucket = ((did * 2654435761) % (1 << 32)) % num_buckets
        rows.append((did, n_tok, bucket))
    rows.sort(key=lambda r: (r[2], r[0]))  # by bucket, then id
    out = []
    cur_bucket, cur_seq, cur_fill = None, 0, 0
    for did, n_tok, bucket in rows:
        take = min(n_tok, budget)
        if bucket != cur_bucket:
            cur_bucket, cur_seq, cur_fill = bucket, 0, take
        elif cur_fill + take > budget:
            cur_seq += 1
            cur_fill = take
        else:
            cur_fill += take
        out.append((did, n_tok, bucket, cur_seq, n_tok > budget))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in out], pa.int64()),
            "n_tokens": pa.array([r[1] for r in out], pa.int64()),
            "bucket": pa.array([r[2] for r in out], pa.int64()),
            "seq": pa.array([r[3] for r in out], pa.int64()),
            "clipped": pa.array([r[4] for r in out], pa.bool_()),
        }
    )


# ------------------------------------------------- embeddings near-dup fix --


def _embeddings_with_planted_dups(
    sf_dir: str, n_dups: int = 15, noise: float = 1e-3, seed: int = 7
) -> pa.Table:
    """sf embeddings + near-identical planted copies (cosine ≥ 0.999): the
    near-dup operator's input fixture. Random vectors top out near cosine
    0.5, so the planted pairs are exactly the expected output at any
    realistic threshold."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float32)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    rng = np.random.default_rng(seed)
    src = np.arange(n_dups)
    dup_vecs = vecs[src] + rng.normal(0, noise, vecs[src].shape).astype(np.float32)
    new_ids = ids.max() + 1 + np.arange(n_dups)
    all_vecs = np.concatenate([vecs, dup_vecs])
    dim = all_vecs.shape[1]
    return pa.table(
        {
            "vec_id": pa.array(np.concatenate([ids, new_ids]), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(all_vecs.ravel(), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(
                np.concatenate([labels, labels[src]]).astype(np.int32), pa.int32()
            ),
        }
    )


# --------------------------------------------------------------- IVF oracle --


def _expected_kmeans_train(sf_dir: str, *, k: int = 8, iters: int = 5,
                           seed: int = 42) -> pa.Table:
    """Scalar full-batch spherical Lloyd (same init convention as the
    engine: whole table is the sample at this size, rng.choice(seed)
    rows) → final assignment per vec. The engine's distributed
    partial-sum trainer must land every vector in the same cluster —
    float64 sum reorderings are ~1e-15 against ≥1e-3 margins."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    m = vecs / np.maximum(
        np.sqrt((vecs * vecs).sum(axis=1)), 1e-12
    )[:, None]
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(float(np.sqrt((v * v).sum())), 1e-12)
    final = np.argmax(m @ cent.T, axis=1)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(final.astype(np.int64)),
        }
    )


def _ivf_fixture(
    sf_dir: str, *, n_centroids: int = 8, nprobe: int = 4, k: int = 5, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """(centroids table, expected top-k table). Plainly-coded k-means +
    IVF shortlist; the query-side engine CONSUMES these centroids (the
    offline-trained-quantizer pattern), so the driver comparison verifies
    the whole distributed shortlist/partial-top-k machinery against this
    scalar spec."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    m = vecs / np.maximum(norms, 1e-12)[:, None]
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=n_centroids, replace=False)].copy()
    for _ in range(10):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(float(np.sqrt((v * v).sum())), 1e-12)
    dim = cent.shape[1]
    cent_table = pa.table(
        {
            "centroid_id": pa.array(np.arange(n_centroids), pa.int64()),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(cent.ravel(), pa.float64()), dim
            ).cast(pa.list_(pa.float64())),
        }
    )
    assign = np.argmax(m @ cent.T, axis=1)
    out_q, out_v = [], []
    for qi in range(len(ids)):
        if ids[qi] >= 3:
            continue
        sims_c = cent @ m[qi]
        probes = set(np.argsort(-sims_c)[:nprobe].tolist())
        cand = [j for j in range(len(ids)) if assign[j] in probes]
        sims = sorted(
            ((float(m[j] @ m[qi]), -int(ids[j]), j) for j in cand), reverse=True
        )
        for _, _, j in sims[:k]:
            out_q.append(str(ids[qi]))
            out_v.append(int(ids[j]))
    expected = pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )
    return cent_table, expected


def _expected_ivfpq(
    sf_dir: str, cent_table: pa.Table, books_table: pa.Table, *,
    nprobe: int = 4, rerank: int = 50, k: int = 10
) -> pa.Table:
    """Scalar spec of the composed two-stage ANN: IVF probe lists (stable
    argsort of -centroid sims), ADC over the probed rows (LUT accumulated
    in subspace order), top-``rerank`` by (adc, id), exact cosine rerank
    by (-cos, id), top-``k``. Consumes the SAME centroid/codebook
    fixtures the engine is handed — per-row Python on purpose."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    m = vecs / np.maximum(norms, 1e-12)[:, None]
    cent = np.asarray(cent_table["centroid"].to_pylist(), dtype=np.float64)
    sub = len(books_table["centroid"][0])
    m_sub = int(max(books_table["subspace"].to_pylist())) + 1
    k_codes = int(max(books_table["code"].to_pylist())) + 1
    books = np.asarray(
        books_table["centroid"].to_pylist(), dtype=np.float64
    ).reshape(m_sub, k_codes, sub)
    assign = np.argmax(m @ cent.T, axis=1)
    codes = np.zeros((len(m), m_sub), np.int64)
    for j in range(m_sub):
        xs = m[:, j * sub : (j + 1) * sub]
        d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d, axis=1)
    out_q, out_v = [], []
    for qi in range(len(ids)):
        if ids[qi] >= 3:
            continue
        probes = set(
            np.argsort(-(cent @ m[qi]), kind="stable")[:nprobe].tolist()
        )
        cand = [j for j in range(len(ids)) if int(assign[j]) in probes]
        lut = np.stack([
            ((books[j] - m[qi, j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)
            for j in range(m_sub)
        ])
        adc = {}
        for j2 in cand:
            sc = lut[0, codes[j2, 0]]
            for j in range(1, m_sub):
                sc = sc + lut[j, codes[j2, j]]
            adc[j2] = float(sc)
        short = sorted(cand, key=lambda r: (adc[r], ids[r]))[:rerank]
        best = sorted(short, key=lambda r: (-float(m[r] @ m[qi]), ids[r]))[:k]
        for r in best:
            out_q.append(str(ids[qi]))
            out_v.append(int(ids[r]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )


def _pq_fixture(
    sf_dir: str, *, m_sub: int = 8, k_codes: int = 32, k: int = 10, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """(PQ codebooks table, expected ADC top-k table). Plainly-coded
    per-subspace k-means + scalar ADC scan (LUT terms accumulated in
    subspace order — the exact sequential sum the engine uses); the query
    engine CONSUMES these codebooks (offline-trained-quantizer pattern,
    same as _ivf_fixture)."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    x = vecs / np.maximum(norms, 1e-12)[:, None]
    dim = x.shape[1]
    sub = dim // m_sub
    rng = np.random.default_rng(seed)
    books = np.zeros((m_sub, k_codes, sub))
    for j in range(m_sub):
        xs = x[:, j * sub : (j + 1) * sub]
        cb = xs[rng.choice(len(xs), size=min(k_codes, len(xs)), replace=False)].copy()
        for _ in range(10):
            d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cb)):
                members = xs[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
    books_table = pa.table(
        {
            "subspace": pa.array(
                np.repeat(np.arange(m_sub), k_codes), pa.int64()
            ),
            "code": pa.array(np.tile(np.arange(k_codes), m_sub), pa.int64()),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(books.reshape(-1, sub).ravel(), pa.float64()), sub
            ).cast(pa.list_(pa.float64())),
        }
    )
    # scalar ADC: encode every row, per query build the LUT, sum in order
    codes = np.zeros((len(x), m_sub), np.int64)
    for j in range(m_sub):
        xs = x[:, j * sub : (j + 1) * sub]
        d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d, axis=1)
    out_q, out_v = [], []
    for qi in range(len(ids)):
        if ids[qi] >= 3:
            continue
        lut = np.stack(
            [
                ((books[j] - x[qi, j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)
                for j in range(m_sub)
            ]
        )
        score = lut[0, codes[:, 0]].copy()
        for j in range(1, m_sub):
            score += lut[j, codes[:, j]]
        order = sorted(range(len(ids)), key=lambda r: (score[r], ids[r]))
        for r in order[:k]:
            out_q.append(str(ids[qi]))
            out_v.append(int(ids[r]))
    expected = pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )
    return books_table, expected


# ------------------------------------------------------- validation oracle --


def _validation_fixture(fdir: str) -> pa.Table:
    """stac_items with planted spec violations + expected_valid known BY
    CONSTRUCTION (each planted class is an unambiguous STAC-spec fact, not
    an output of the validator under test):

    - ``type`` ≠ Feature/Catalog/Collection → invalid (core schema const);
    - ``stac_version`` 0.9.0 → invalid (no such core schema);
    - null ``datetime`` with no start/end range → invalid (item-spec
      datetime-null requires start_datetime+end_datetime).
    """
    items = pq.read_table(os.path.join(fdir, "stac_items.parquet"))
    n = items.num_rows
    idx = np.arange(n)
    bad_type = idx % 97 == 3
    bad_version = (idx % 89 == 5) & ~bad_type
    bad_datetime = (idx % 83 == 7) & ~bad_type & ~bad_version
    # planting null datetime only works where no start/end range exists
    has_range = ~np.asarray(
        [v is None for v in items["start_datetime"].to_pylist()]
    )
    bad_datetime &= ~has_range

    type_col = np.asarray(items["type"].to_pylist(), dtype=object)
    type_col[bad_type] = "NotAFeature"
    ver_col = np.asarray(items["stac_version"].to_pylist(), dtype=object)
    ver_col[bad_version] = "0.9.0"
    dt = items["datetime"].to_pylist()
    dt = [None if bad_datetime[i] else dt[i] for i in range(n)]

    out = items.set_column(
        items.schema.get_field_index("type"), "type", pa.array(type_col, pa.string())
    )
    out = out.set_column(
        out.schema.get_field_index("stac_version"),
        "stac_version",
        pa.array(ver_col, pa.string()),
    )
    out = out.set_column(
        out.schema.get_field_index("datetime"),
        "datetime",
        pa.array(dt, items["datetime"].type),
    )
    expected_valid = ~(bad_type | bad_version | bad_datetime)
    return out.append_column("expected_valid", pa.array(expected_valid))


# ------------------------------------------------------------------ ensure --


# ----------------------------------------------------------- zonal oracle --


def _expected_band_math(fdir: str) -> pa.Table:
    """Scalar double-implementation of BandMath: per-image Σ(R−G) and
    Σ(R+G) accumulated with PYTHON ints over decoded pixel lists — an
    independent arithmetic path from the numpy kernel, exact by
    construction."""
    import glob as _glob

    from .imaging.codec import decode_image

    rows = {"image_id": [], "decoded": [], "n_px": [],
            "sum_diff": [], "sum_plus": []}
    for p_ in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet"))):
        t = pq.read_table(p_, columns=["image_id", "bytes", "fmt"])
        for iid, buf, fmt in zip(
            t["image_id"].to_pylist(), t["bytes"].to_pylist(),
            t["fmt"].to_pylist(),
        ):
            px = decode_image(buf, fmt)
            sd = 0
            sp = 0
            n = 0
            for row in px.tolist():
                for r, g, _b in row:
                    sd += r - g
                    sp += r + g
                    n += 1
            rows["image_id"].append(iid)
            rows["decoded"].append(True)
            rows["n_px"].append(n)
            rows["sum_diff"].append(sd)
            rows["sum_plus"].append(sp)
    return pa.table(
        {
            "image_id": pa.array(rows["image_id"], pa.string()),
            "decoded": pa.array(rows["decoded"], pa.bool_()),
            "n_px": pa.array(rows["n_px"], pa.int64()),
            "sum_diff": pa.array(rows["sum_diff"], pa.int64()),
            "sum_plus": pa.array(rows["sum_plus"], pa.int64()),
        }
    )


def _expected_zonal(fdir: str) -> pa.Table:
    """Naive zonal statistics: decode every image, evaluate EVERY pixel
    center against EVERY query box over the full w×h grid (no windowing,
    no candidate prefilter, no decode-dedup — deliberately the dumb
    quadratic twin of stages/zonal.py). Inclusive box edges."""
    from .imaging.codec import decode_image

    import glob as _glob

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"))]
    )
    boxes = pq.read_table(os.path.join(fdir, "query_boxes.parquet")).to_pydict()
    nq = len(boxes["query_id"])
    n_images = [0] * nq
    n_pixels = [0] * nq
    sums = [[0, 0, 0] for _ in range(nq)]
    for i in range(len(imgs)):
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        h, w = px.shape[0], px.shape[1]
        cx = x0 + res * (np.arange(w, dtype=np.float64) + 0.5)
        cy = y0 - res * (np.arange(h, dtype=np.float64) + 0.5)
        gx, gy = np.meshgrid(cx, cy)
        flat = px.reshape(-1, 3).astype(np.int64)
        for q in range(nq):
            m = (
                (gx >= boxes["xmin"][q])
                & (gx <= boxes["xmax"][q])
                & (gy >= boxes["ymin"][q])
                & (gy <= boxes["ymax"][q])
            ).ravel()
            c = int(np.count_nonzero(m))
            if c == 0:
                continue
            s = flat[m].sum(axis=0)
            n_images[q] += 1
            n_pixels[q] += c
            sums[q][0] += int(s[0])
            sums[q][1] += int(s[1])
            sums[q][2] += int(s[2])
    hit = [q for q in range(nq) if n_images[q] > 0]
    return pa.table(
        {
            "query_id": pa.array([boxes["query_id"][q] for q in hit], pa.string()),
            "n_images": pa.array([n_images[q] for q in hit], pa.int64()),
            "n_pixels": pa.array([n_pixels[q] for q in hit], pa.int64()),
            "sum_r": pa.array([sums[q][0] for q in hit], pa.int64()),
            "sum_g": pa.array([sums[q][1] for q in hit], pa.int64()),
            "sum_b": pa.array([sums[q][2] for q in hit], pa.int64()),
            "mean_r": pa.array(
                [sums[q][0] / max(n_pixels[q], 1) for q in hit], pa.float64()
            ),
            "mean_g": pa.array(
                [sums[q][1] / max(n_pixels[q], 1) for q in hit], pa.float64()
            ),
            "mean_b": pa.array(
                [sums[q][2] / max(n_pixels[q], 1) for q in hit], pa.float64()
            ),
        }
    )


def _expected_bpe(docs: pa.Table, num_merges: int = 50,
                  id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Naive scalar BPE twin of stages/tokenize.py: dict-based pair
    counting for training (max count, lexicographically smallest tie) and
    replay-merges-IN-ORDER apply (equivalent to the engine's greedy
    lowest-rank apply for any training-produced merge list, since a
    compound pair can only be learned after its constituents)."""
    eow = "</w>"
    freqs: dict = {}
    texts = docs[text_col].to_pylist()
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: list(w) + [eow] for w in freqs}
    merges = []
    for _ in range(num_merges):
        pc: dict = {}
        for w, f in freqs.items():
            s = seqs[w]
            for j in range(len(s) - 1):
                pc[(s[j], s[j + 1])] = pc.get((s[j], s[j + 1]), 0) + f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        for w in seqs:
            s, out, j = seqs[w], [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[w] = out

    def apply(word: str) -> list:
        s = list(word) + [eow]
        for l, r in merges:
            out, j = [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == l and s[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s = out
        return s

    n_out, first, last = [], [], []
    for t in texts:
        ws = t.split()
        toks_n = 0
        f = l = ""
        for k, w in enumerate(ws):
            enc = apply(w)
            toks_n += len(enc)
            if k == 0:
                f = enc[0]
            l = enc[-1]
        n_out.append(toks_n)
        first.append(f)
        last.append(l)
    id_arr = docs[id_col]
    if isinstance(id_arr, pa.ChunkedArray):
        id_arr = id_arr.combine_chunks()
    return pa.table(
        {
            id_col: id_arr,
            "n_bpe_tokens": pa.array(n_out, pa.int64()),
            "first_token": pa.array(first, pa.string()),
            "last_token": pa.array(last, pa.string()),
        }
    )


def _expected_lm_scores(docs: pa.Table) -> pa.Table:
    """Naive scalar twin of stages/lm.py: dict bigram counting, math.log
    per-cell cost, char-by-char integer accumulation. Integer micro-nat
    costs make the per-doc sums order-independent exact."""
    import math

    texts = docs["text"].to_pylist()
    ids = docs["doc_id"].to_pylist()
    counts: dict = {}
    rowsum = [0] * 256
    for t in texts:
        b = t.encode("utf-8", "ignore")
        for j in range(len(b) - 1):
            counts[(b[j], b[j + 1])] = counts.get((b[j], b[j + 1]), 0) + 1
            rowsum[b[j]] += 1
    # np.round is half-to-even; Python round matches for floats
    cost = {
        (a, c): round(-(math.log(n + 1) - math.log(rowsum[a] + 256)) * 1e6)
        for (a, c), n in counts.items()
    }

    def cell(a, c):
        got = cost.get((a, c))
        if got is None:
            got = round(-(math.log(1) - math.log(rowsum[a] + 256)) * 1e6)
        return got

    n_pairs, nll = [], []
    for t in texts:
        b = t.encode("utf-8", "ignore")
        s = 0
        for j in range(len(b) - 1):
            s += cell(b[j], b[j + 1])
        n_pairs.append(max(len(b) - 1, 0))
        nll.append(s)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
            "nll_micro": pa.array(nll, pa.int64()),
        }
    )


def _expected_coverage(fdir: str, quantum: float = 1e-6) -> pa.Table:
    """Naive per-collection union area: x-strip sweep with scalar interval
    merging (a different algorithm from the engine's 2-D difference-array
    cumsum — the double-implementation point). Integer cell coords via
    floor(x/quantum), exactly as the engine quantizes."""
    import glob as _glob
    import math

    imgs = pa.concat_tables(
        [pq.read_table(p, columns=["collection", "w", "h", "transform"])
         for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"),
                          columns=["collection", "w", "h", "transform"])]
    )
    groups: dict = {}
    for i in range(len(imgs)):
        t = imgs["transform"][i].as_py()
        res, x0d, y0d = t[0], t[2], t[5]
        w, h = imgs["w"][i].as_py(), imgs["h"][i].as_py()
        box = (
            math.floor(x0d / quantum),
            math.floor((y0d - res * h) / quantum),
            math.floor((x0d + res * w) / quantum),
            math.floor(y0d / quantum),
        )
        groups.setdefault(imgs["collection"][i].as_py(), []).append(box)
    rows = []
    for coll in sorted(groups):
        boxes = groups[coll]
        live = [b for b in boxes if b[2] > b[0] and b[3] > b[1]]
        sum_cells = sum((b[2] - b[0]) * (b[3] - b[1]) for b in live)
        xs = sorted({v for b in live for v in (b[0], b[2])})
        union = 0
        for j in range(len(xs) - 1):
            lo, hi = xs[j], xs[j + 1]
            ivals = sorted(
                (b[1], b[3]) for b in live if b[0] <= lo and b[2] >= hi
            )
            merged_end, strip = None, 0
            for a, b_ in ivals:
                if merged_end is None or a > merged_end:
                    strip += b_ - a
                    merged_end = b_
                elif b_ > merged_end:
                    strip += b_ - merged_end
                    merged_end = b_
            union += strip * (hi - lo)
        rows.append((coll, len(boxes), union, sum_cells))
    return pa.table(
        {
            "collection": pa.array([r[0] for r in rows], pa.string()),
            "n_images": pa.array([r[1] for r in rows], pa.int64()),
            "union_cells": pa.array([r[2] for r in rows], pa.int64()),
            "sum_box_cells": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _expected_random_crop(fdir: str, crop: int = 16, seed: int = 0) -> pa.Table:
    """Naive scalar twin of multimodal.RandomCrop: pure-Python FNV-1a +
    splitmix64 (int masks instead of numpy uint64 wraparound), scalar
    per-pixel accumulation over the crop window."""
    import glob as _glob

    from .imaging.codec import decode_image

    mask = (1 << 64) - 1

    def fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for byte in b:
            h = ((h ^ byte) * 0x100000001B3) & mask
        return h

    def mix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & mask
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
        return x ^ (x >> 31)

    imgs = pa.concat_tables(
        [pq.read_table(p, columns=["image_id", "bytes", "w", "h", "fmt"])
         for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
    )
    rows = []
    for i in range(len(imgs)):
        iid = imgs["image_id"][i].as_py()
        w, h = imgs["w"][i].as_py(), imgs["h"][i].as_py()
        base = fnv(iid.encode())
        ox = mix((base + 2 * seed) & mask) % (max(w - crop, 0) + 1)
        oy = mix((base + 2 * seed + 1) & mask) % (max(h - crop, 0) + 1)
        cw, ch = min(w, crop), min(h, crop)
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        s = [0, 0, 0]
        for yy in range(oy, oy + ch):
            for xx in range(ox, ox + cw):
                s[0] += int(px[yy, xx, 0])
                s[1] += int(px[yy, xx, 1])
                s[2] += int(px[yy, xx, 2])
        rows.append((iid, ox, oy, cw, ch, s[0], s[1], s[2]))
    names = ["image_id", "crop_x", "crop_y", "crop_w", "crop_h",
             "sum_r", "sum_g", "sum_b"]
    cols = list(zip(*rows))
    return pa.table(
        {
            "image_id": pa.array(cols[0], pa.string()),
            **{n: pa.array(cols[j], pa.int64()) for j, n in enumerate(names) if j > 0},
        }
    )


def _expected_hex_counts(fdir: str, size: float = 0.5) -> pa.Table:
    """Naive scalar hex binning: math-module axial + cube rounding per
    footprint center (Python round is half-even like np.round; identical
    IEEE arithmetic to geo/hex.py's vectorized kernels)."""
    import glob as _glob
    import math

    imgs = pa.concat_tables(
        [pq.read_table(p, columns=["w", "h", "transform"])
         for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"),
                          columns=["w", "h", "transform"])]
    )
    sqrt3 = math.sqrt(3.0)
    off = 1 << 30
    counts: dict = {}
    for i in range(len(imgs)):
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        w, h = imgs["w"][i].as_py(), imgs["h"][i].as_py()
        cx = (x0 + (x0 + res * w)) * 0.5
        cy = ((y0 - res * h) + y0) * 0.5
        qf = (sqrt3 / 3.0 * cx - (1.0 / 3.0) * cy) / size
        rf = ((2.0 / 3.0) * cy) / size
        xf, zf = qf, rf
        yf = -xf - zf
        rx, ry, rz = round(xf), round(yf), round(zf)
        dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
        if dx > dy and dx > dz:
            rx = -ry - rz
        elif dz > dy:
            rz = -rx - ry
        key = ((int(rx) + off) << 32) | (int(rz) + off)
        counts[key] = counts.get(key, 0) + 1
    keys = sorted(counts)
    return pa.table(
        {
            "hex_cell": pa.array(keys, pa.int64()),
            "n_images": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )


def _expected_point_samples(fdir: str) -> pa.Table:
    """Naive raster point sampling: scalar math.floor affine inversion per
    (point, image) pair over EVERY pair, one decode per hit image — the
    dumb quadratic twin of stages/zonal._PointSampler."""
    import glob as _glob
    import math

    from .imaging.codec import decode_image

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"))]
    )
    pts = pq.read_table(os.path.join(fdir, "query_points.parquet")).to_pydict()
    out = {"query_id": [], "image_id": [], "px_r": [], "px_g": [], "px_b": []}
    for i in range(len(imgs)):
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        w, h = imgs["w"][i].as_py(), imgs["h"][i].as_py()
        px = None
        for q in range(len(pts["query_id"])):
            col = math.floor((pts["x"][q] - x0) / res)
            row = math.floor((y0 - pts["y"][q]) / res)
            if not (0 <= col < w and 0 <= row < h):
                continue
            if px is None:
                px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
            out["query_id"].append(pts["query_id"][q])
            out["image_id"].append(imgs["image_id"][i].as_py())
            out["px_r"].append(int(px[row, col, 0]))
            out["px_g"].append(int(px[row, col, 1]))
            out["px_b"].append(int(px[row, col, 2]))
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.string()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "px_r": pa.array(out["px_r"], pa.int64()),
            "px_g": pa.array(out["px_g"], pa.int64()),
            "px_b": pa.array(out["px_b"], pa.int64()),
        }
    )


def _expected_tile_mosaic(fdir: str, z: int = 8) -> pa.Table:
    """Naive tile mosaic: pure-Python per-pixel slippy-map math (math.tan
    scalar formula + bitwise scalar Morton interleave — written
    independently of geo/tiles' vectorized fraction/_part1by1 kernels)
    over the image_id %% 20 == 0 subset."""
    import math

    from .imaging.codec import decode_image

    import glob as _glob

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"))]
    )

    def scalar_tile(lon: float, lat: float) -> tuple:
        n = 1 << z
        x = int((lon + 180.0) / 360.0 * n)
        lat = max(min(lat, 85.05112877980659), -85.05112877980659)
        rad = math.radians(lat)
        y = int((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n)
        return min(max(x, 0), n - 1), min(max(y, 0), n - 1)

    def scalar_key(x: int, y: int) -> int:
        m = 0
        for b in range(29):
            m |= ((x >> b) & 1) << (2 * b)
            m |= ((y >> b) & 1) << (2 * b + 1)
        return (z << 58) | m

    acc = {}
    for i in range(len(imgs)):
        iid = imgs["image_id"][i].as_py()
        if int(iid.split("-")[1]) % 20 != 0:
            continue
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        seen = set()
        for r in range(px.shape[0]):
            lat = y0 - res * (r + 0.5)
            for c in range(px.shape[1]):
                lon = x0 + res * (c + 0.5)
                k = scalar_key(*scalar_tile(lon, lat))
                if k not in acc:
                    acc[k] = [0, 0, 0, 0, 0]  # n_img, n_pix, r, g, b
                a = acc[k]
                a[1] += 1
                a[2] += int(px[r, c, 0])
                a[3] += int(px[r, c, 1])
                a[4] += int(px[r, c, 2])
                seen.add(k)
        for k in seen:
            acc[k][0] += 1
    keys = sorted(acc)
    from .geo.tiles import tile_unkey

    zz, xx, yy = tile_unkey(np.asarray(keys, np.uint64))
    return pa.table(
        {
            "tile_key": pa.array(keys, pa.int64()),
            "n_images": pa.array([acc[k][0] for k in keys], pa.int64()),
            "n_pixels": pa.array([acc[k][1] for k in keys], pa.int64()),
            "sum_r": pa.array([acc[k][2] for k in keys], pa.int64()),
            "sum_g": pa.array([acc[k][3] for k in keys], pa.int64()),
            "sum_b": pa.array([acc[k][4] for k in keys], pa.int64()),
            "z": pa.array(zz.astype(np.int64)),
            "x": pa.array(xx.astype(np.int64)),
            "y": pa.array(yy.astype(np.int64)),
            "mean_r": pa.array(
                [acc[k][2] / max(acc[k][1], 1) for k in keys], pa.float64()
            ),
            "mean_g": pa.array(
                [acc[k][3] / max(acc[k][1], 1) for k in keys], pa.float64()
            ),
            "mean_b": pa.array(
                [acc[k][4] / max(acc[k][1], 1) for k in keys], pa.float64()
            ),
        }
    )


# ----------------------------------------------------------- video oracle --


def _expected_mosaic_delta(fdir: str, split: str = "2024-01-15", z: int = 8) -> pa.Table:
    """Naive scalar twin of zonal.mosaic_delta: the _expected_tile_mosaic
    per-pixel slippy accumulation, run once per time window over the
    image_id % 20 == 0 subset, then dict-joined on tiles present in both."""
    import math

    import glob as _glob

    from .imaging.codec import decode_image

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
    )
    split_ms = np.datetime64(split, "ms").astype(np.int64)

    def scalar_tile(lon: float, lat: float) -> tuple:
        n = 1 << z
        x = int((lon + 180.0) / 360.0 * n)
        lat = max(min(lat, 85.05112877980659), -85.05112877980659)
        rad = math.radians(lat)
        y = int((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n)
        return min(max(x, 0), n - 1), min(max(y, 0), n - 1)

    def scalar_key(x: int, y: int) -> int:
        m = 0
        for b in range(29):
            m |= ((x >> b) & 1) << (2 * b)
            m |= ((y >> b) & 1) << (2 * b + 1)
        return (z << 58) | m

    accs = [{}, {}]
    dts = imgs["datetime"].to_numpy().astype("datetime64[ms]").astype(np.int64)
    for i in range(len(imgs)):
        iid = imgs["image_id"][i].as_py()
        if int(iid.split("-")[1]) % 20 != 0:
            continue
        acc = accs[1] if dts[i] >= split_ms else accs[0]
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        seen = set()
        for r in range(px.shape[0]):
            lat = y0 - res * (r + 0.5)
            for c in range(px.shape[1]):
                lon = x0 + res * (c + 0.5)
                k = scalar_key(*scalar_tile(lon, lat))
                if k not in acc:
                    acc[k] = [0, 0, 0, 0, 0]
                a = acc[k]
                a[1] += 1
                a[2] += int(px[r, c, 0])
                a[3] += int(px[r, c, 1])
                a[4] += int(px[r, c, 2])
                seen.add(k)
        for k in seen:
            acc[k][0] += 1
    keys = sorted(set(accs[0]) & set(accs[1]))
    from .geo.tiles import tile_unkey

    zz, xx, yy = tile_unkey(np.asarray(keys, np.uint64))
    out = {
        "tile_key": pa.array(keys, pa.int64()),
        "z": pa.array(zz.astype(np.int64)),
        "x": pa.array(xx.astype(np.int64)),
        "y": pa.array(yy.astype(np.int64)),
    }
    names = ["n_images", "n_pixels", "sum_r", "sum_g", "sum_b"]
    for suf, acc in (("a", accs[0]), ("b", accs[1])):
        for j, n in enumerate(names):
            out[f"{n}_{suf}"] = pa.array([acc[k][j] for k in keys], pa.int64())
    for j, c in ((2, "r"), (3, "g"), (4, "b")):
        out[f"delta_{c}_num"] = pa.array(
            [accs[1][k][j] * accs[0][k][1] - accs[0][k][j] * accs[1][k][1]
             for k in keys],
            pa.int64(),
        )
    return pa.table(out)


def _videos_table(n_videos: int, seed: int = 4242) -> pa.Table:
    """Deterministic rawv clips: per-frame drifting gradient + seeded noise
    so consecutive frames differ predictably."""
    from .imaging.codec import encode_rawv

    rng = np.random.default_rng(seed)
    ids, payloads, fmts, nfr, ws, hs = [], [], [], [], [], []
    for v in range(n_videos):
        w = int(rng.choice([8, 12, 16]))
        h = int(rng.choice([8, 12, 16]))
        n = int(rng.integers(10, 41))
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.empty((n, h, w, 3), np.uint8)
        for f in range(n):
            base = (xx * 7 + yy * 11 + f * 5 + v) % 256
            noise = rng.integers(0, 32, (h, w, 3))
            frames[f] = np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)
        fmt = "mp4" if v % 25 == 24 else "rawv"  # planted codec-less rows
        payload = encode_rawv(frames, fps=10) if fmt == "rawv" else b"\x00garbage"
        ids.append(f"vid-{v:06d}")
        payloads.append(payload)
        fmts.append(fmt)
        nfr.append(n if fmt == "rawv" else 0)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
            "n_frames": pa.array(nfr, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        }
    )


def _expected_frame_stats(videos: pa.Table, every_n: int = 7) -> pa.Table:
    """Independent scalar re-implementation: parse the RAWV container with
    struct directly (no imaging.codec reader), slice every_n-th frame,
    exact int sums → means."""
    import struct

    rows = []
    for i in range(len(videos)):
        if videos["fmt"][i].as_py() != "rawv":
            continue
        data = videos["bytes"][i].as_py()
        w, h, n, _fps = struct.unpack("<HHHH", data[4:12])
        sz = w * h * 3
        for idx in range(0, n, every_n):
            buf = np.frombuffer(data, np.uint8, count=sz, offset=12 + idx * sz)
            px = buf.reshape(-1, 3).astype(np.int64)
            s = px.sum(axis=0)
            npx = px.shape[0]
            rows.append(
                (
                    videos["media_id"][i].as_py(),
                    idx,
                    npx,
                    s[0] / npx,
                    s[1] / npx,
                    s[2] / npx,
                )
            )
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.string()),
            "frame_idx": pa.array([r[1] for r in rows], pa.int64()),
            "n_px": pa.array([r[2] for r in rows], pa.int64()),
            "mean_r": pa.array([r[3] for r in rows], pa.float64()),
            "mean_g": pa.array([r[4] for r in rows], pa.float64()),
            "mean_b": pa.array([r[5] for r in rows], pa.float64()),
        }
    )

def _expected_composite(fdir: str, z: int = 8, tile_px: int = 32) -> pa.Table:
    """Naive composite-mosaic twin: per image, per touched tile, a dense
    (tile_px, tile_px) accumulator held in a python dict updated with
    np.add.at — no packed ordinals, no bincount (double-implementation
    vs stages/zonal._CompositePartial). Same one-floor-per-axis cell
    assignment; render = per-cell integer floor mean, hex-encoded."""
    import glob as _glob

    from .geo import tiles as T
    from .imaging.codec import decode_image

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"))]
    )
    # same deterministic id-mod subset the query wrapper applies
    keep = [i for i in range(len(imgs))
            if int(imgs["image_id"][i].as_py()[4:]) % 10 == 0]
    imgs = imgs.take(pa.array(keep))
    n = 1 << z
    gmax = n * tile_px - 1
    acc: dict[int, list] = {}
    n_imgs: dict[int, int] = {}
    for i in range(len(imgs)):
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        h, w = px.shape[0], px.shape[1]
        cx = x0 + res * (np.arange(w, dtype=np.float64) + 0.5)
        cy = y0 - res * (np.arange(h, dtype=np.float64) + 0.5)
        gx, gy = np.meshgrid(cx, cy)
        sx = np.clip((T._xfrac(gx.ravel()) * (n * tile_px)).astype(np.int64), 0, gmax)
        sy = np.clip((T._yfrac(gy.ravel()) * (n * tile_px)).astype(np.int64), 0, gmax)
        keys = T.tile_key(z, sx // tile_px, sy // tile_px).astype(np.int64)
        flat = px.reshape(-1, 3).astype(np.int64)
        for key in np.unique(keys):
            m = keys == key
            e = acc.setdefault(
                int(key),
                [np.zeros((tile_px, tile_px), np.int64),
                 np.zeros((tile_px, tile_px, 3), np.int64)],
            )
            rr, cc = sy[m] % tile_px, sx[m] % tile_px
            np.add.at(e[0], (rr, cc), 1)
            np.add.at(e[1], (rr, cc), flat[m])
            n_imgs[int(key)] = n_imgs.get(int(key), 0) + 1
    out = {"tile_key": [], "z": [], "x": [], "y": [], "n_images": [],
           "n_px_filled": [], "img_hex": []}
    for key in sorted(acc):
        cnt, sums = acc[key]
        img = np.zeros((tile_px, tile_px, 3), np.uint8)
        filled = cnt > 0
        img[filled] = (sums[filled] // cnt[filled][:, None]).astype(np.uint8)
        zz, x, y = T.tile_unkey(np.array([key], np.uint64))
        out["tile_key"].append(key)
        out["z"].append(int(zz[0]))
        out["x"].append(int(x[0]))
        out["y"].append(int(y[0]))
        out["n_images"].append(n_imgs[key])
        out["n_px_filled"].append(int(filled.sum()))
        out["img_hex"].append(img.tobytes().hex())
    return pa.table(
        {
            "tile_key": pa.array(out["tile_key"], pa.int64()),
            "z": pa.array(out["z"], pa.int64()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "n_images": pa.array(out["n_images"], pa.int64()),
            "n_px_filled": pa.array(out["n_px_filled"], pa.int64()),
            "img_hex": pa.array(out["img_hex"], pa.string()),
        }
    )


def _expected_composite_latest(fdir: str, z: int = 8, tile_px: int = 32) -> pa.Table:
    """Naive latest-pixel composite twin: python dict keyed by
    (tile, cell) holding the current (ts, image_id, rgb) winner, updated
    pixel-by-pixel with explicit comparisons (newer ts wins; equal ts →
    lexicographically smaller id wins; within an image the FIRST
    row-major pixel per cell counts). Same one-floor-per-axis cell math
    as the engine; completely different accumulation structure."""
    import glob as _glob

    from .geo import tiles as T
    from .imaging.codec import decode_image

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
        or [pq.read_table(os.path.join(fdir, "images.parquet"))]
    )
    keep = [i for i in range(len(imgs))
            if int(imgs["image_id"][i].as_py()[4:]) % 10 == 0]
    imgs = imgs.take(pa.array(keep))
    n = 1 << z
    gmax = n * tile_px - 1
    best: dict = {}
    for i in range(len(imgs)):
        t = imgs["transform"][i].as_py()
        res, x0, y0 = t[0], t[2], t[5]
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        h, w = px.shape[0], px.shape[1]
        iid = imgs["image_id"][i].as_py()
        its = int(np.datetime64(imgs["datetime"][i].as_py(), "ms").astype(np.int64))
        cx = x0 + res * (np.arange(w, dtype=np.float64) + 0.5)
        cy = y0 - res * (np.arange(h, dtype=np.float64) + 0.5)
        gx, gy = np.meshgrid(cx, cy)
        sx = np.clip((T._xfrac(gx.ravel()) * (n * tile_px)).astype(np.int64), 0, gmax)
        sy = np.clip((T._yfrac(gy.ravel()) * (n * tile_px)).astype(np.int64), 0, gmax)
        keys = T.tile_key(z, sx // tile_px, sy // tile_px).astype(np.int64)
        cells = (sy % tile_px) * tile_px + (sx % tile_px)
        flat = px.reshape(-1, 3)
        seen = set()
        for j in range(len(keys)):
            kc = (int(keys[j]), int(cells[j]))
            if kc in seen:
                continue
            seen.add(kc)
            cur = best.get(kc)
            if cur is None or its > cur[0] or (its == cur[0] and iid < cur[1]):
                best[kc] = (its, iid, tuple(int(v) for v in flat[j]))
    per_tile: dict = {}
    for (key, cell), (_, _, rgb) in best.items():
        per_tile.setdefault(key, {})[cell] = rgb
    out = {"tile_key": [], "z": [], "x": [], "y": [], "n_px_filled": [],
           "img_hex": []}
    for key in sorted(per_tile):
        raster = np.zeros((tile_px * tile_px, 3), np.uint8)
        for cell, rgb in per_tile[key].items():
            raster[cell] = rgb
        zz, x, y = T.tile_unkey(np.array([key], np.uint64))
        out["tile_key"].append(key)
        out["z"].append(int(zz[0]))
        out["x"].append(int(x[0]))
        out["y"].append(int(y[0]))
        out["n_px_filled"].append(len(per_tile[key]))
        out["img_hex"].append(raster.tobytes().hex())
    return pa.table(
        {
            "tile_key": pa.array(out["tile_key"], pa.int64()),
            "z": pa.array(out["z"], pa.int64()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "n_px_filled": pa.array(out["n_px_filled"], pa.int64()),
            "img_hex": pa.array(out["img_hex"], pa.string()),
        }
    )


def _residual_pq_fixture(
    sf_dir: str, cent_table: pa.Table, *, m_sub: int = 8, k_codes: int = 32,
    seed: int = 42
) -> pa.Table:
    """Offline-trained RESIDUAL PQ codebooks (x_norm − nearest centroid),
    plainly-coded per-subspace L2 k-means — consumed by the engine's
    ivfpq_residual_topk, same offline-quantizer pattern as _pq_fixture."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    m = vecs / np.maximum(norms, 1e-12)[:, None]
    cent = np.asarray(cent_table["centroid"].to_pylist(), dtype=np.float64)
    resid = m - cent[np.argmax(m @ cent.T, axis=1)]
    dim = resid.shape[1]
    sub = dim // m_sub
    rng = np.random.default_rng(seed)
    books = np.zeros((m_sub, k_codes, sub))
    for j in range(m_sub):
        xs = resid[:, j * sub : (j + 1) * sub]
        cb = xs[rng.choice(len(xs), size=min(k_codes, len(xs)), replace=False)].copy()
        for _ in range(10):
            d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cb)):
                members = xs[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
    return pa.table(
        {
            "subspace": pa.array(np.repeat(np.arange(m_sub), k_codes), pa.int64()),
            "code": pa.array(np.tile(np.arange(k_codes), m_sub), pa.int64()),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(books.reshape(-1, sub).ravel(), pa.float64()), sub
            ).cast(pa.list_(pa.float64())),
        }
    )


def _expected_ivfpq_residual(
    sf_dir: str, cent_table: pa.Table, books_table: pa.Table, *,
    nprobe: int = 4, rerank: int = 50, k: int = 10
) -> pa.Table:
    """Scalar spec of residual IVFADC + exact rerank: per query, per
    probed list c, ADC LUT from (q − centroid_c); rows coded from their
    OWN list's residual; (adc, id) shortlist; (-cos, id) rerank."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    m = vecs / np.maximum(norms, 1e-12)[:, None]
    cent = np.asarray(cent_table["centroid"].to_pylist(), dtype=np.float64)
    sub = len(books_table["centroid"][0])
    m_sub = int(max(books_table["subspace"].to_pylist())) + 1
    k_codes = int(max(books_table["code"].to_pylist())) + 1
    books = np.asarray(
        books_table["centroid"].to_pylist(), dtype=np.float64
    ).reshape(m_sub, k_codes, sub)
    assign = np.argmax(m @ cent.T, axis=1)
    resid = m - cent[assign]
    codes = np.zeros((len(m), m_sub), np.int64)
    for j in range(m_sub):
        xs = resid[:, j * sub : (j + 1) * sub]
        d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d, axis=1)
    out_q, out_v = [], []
    for qi in range(len(ids)):
        if ids[qi] >= 3:
            continue
        probes = np.argsort(-(cent @ m[qi]), kind="stable")[:nprobe]
        adc = {}
        for c in probes:
            t = m[qi] - cent[c]
            lut = np.stack([
                ((books[j] - t[j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)
                for j in range(m_sub)
            ])
            for j2 in np.flatnonzero(assign == c):
                sc = lut[0, codes[j2, 0]]
                for j in range(1, m_sub):
                    sc = sc + lut[j, codes[j2, j]]
                adc[int(j2)] = float(sc)
        short = sorted(adc, key=lambda r: (adc[r], ids[r]))[:rerank]
        best = sorted(short, key=lambda r: (-float(m[r] @ m[qi]), ids[r]))[:k]
        for r in best:
            out_q.append(str(ids[qi]))
            out_v.append(int(ids[r]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.string()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )



ALIGN_TAU = 0.05  # curation threshold the alignment fixture is built at


def _expected_alignment(fdir: str, tau: float = ALIGN_TAU) -> pa.Table:
    """Naive scalar twin of stages.align.CaptionAlignment: pure-Python md5
    word hashing, per-pixel block-sum loops, int arithmetic throughout;
    kept uses the identical float expression on identical ints."""
    import glob as _glob
    import hashlib as _hashlib

    from .imaging.codec import decode_image

    G = 4
    D = G * G * 3
    imgs = pa.concat_tables(
        [pq.read_table(p, columns=["image_id", "bytes", "w", "h", "fmt", "caption"])
         for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
    )
    rows = []
    for i in range(len(imgs)):
        iid = imgs["image_id"][i].as_py()
        caption = imgs["caption"][i].as_py() or ""
        t = [0] * D
        for word in caption.lower().split():
            hv = int.from_bytes(
                _hashlib.md5(word.encode("utf-8")).digest()[:8], "little"
            )
            t[hv % D] += 1 if hv >> 63 else -1
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        hh = px.shape[0] - px.shape[0] % G
        ww = px.shape[1] - px.shape[1] % G
        v = [0] * D
        for yy in range(hh):
            for xx in range(ww):
                by = yy * G // hh
                bx = xx * G // ww
                for c in range(3):
                    v[(by * G + bx) * 3 + c] += int(px[yy, xx, c])
        dot = sum(a * b for a, b in zip(t, v))
        tn = sum(a * a for a in t)
        vn = sum(b * b for b in v)
        kept = bool(
            dot > 0 and float(dot) ** 2 >= (tau ** 2) * float(tn) * float(vn)
        )
        rows.append((iid, dot, tn, vn, True, kept))
    cols = list(zip(*rows))
    return pa.table(
        {
            "image_id": pa.array(cols[0], pa.string()),
            "dot": pa.array(cols[1], pa.int64()),
            "t_norm2": pa.array(cols[2], pa.int64()),
            "i_norm2": pa.array(cols[3], pa.int64()),
            "decoded": pa.array(cols[4], pa.bool_()),
            "kept": pa.array(cols[5], pa.bool_()),
        }
    )



def _audio_table(n_clips: int, seed: int = 777) -> pa.Table:
    """Deterministic PCM16 WAV clips via the stdlib ``wave`` writer
    (independent of stages.audio.encode_wav): sine carriers with seeded
    noise, planted clipped rows (i%7==0), stereo rows (i%5==0), and
    planted undecodable payloads (i%23==22)."""
    import io as _io
    import wave as _wave

    rng = np.random.default_rng(seed)
    ids, payloads, srs, nss, caps = [], [], [], [], []
    for i in range(n_clips):
        sr = 8000 if i % 2 else 16000
        n = 2000 + (i * 997) % 6000
        f0 = 100.0 + (i % 37) * 13.0
        amp = 36000.0 if i % 7 == 0 else 9000.0 + (i % 5) * 4000.0
        t = np.arange(n)
        sig = amp * np.sin(2 * np.pi * f0 * t / sr) + rng.integers(-200, 201, n)
        mono = np.clip(np.round(sig), -32768, 32767).astype(np.int16)
        if i % 23 == 22:
            payload = b"\x00not-a-wav" + bytes(rng.integers(0, 256, 64).tolist())
        else:
            bio = _io.BytesIO()
            with _wave.open(bio, "wb") as wf:
                ch = 2 if i % 5 == 0 else 1
                wf.setnchannels(ch)
                wf.setsampwidth(2)
                wf.setframerate(sr)
                if ch == 2:
                    inter = np.empty(n * 2, np.int16)
                    inter[0::2] = mono
                    inter[1::2] = np.roll(mono, 7)
                    wf.writeframes(inter.tobytes())
                else:
                    wf.writeframes(mono.tobytes())
            payload = bio.getvalue()
        ids.append(f"aud-{i:06d}")
        payloads.append(payload)
        srs.append(sr)
        nss.append(n)
        caps.append(f"clip {i} tone {int(f0)} hz")
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(nss, pa.int32()),
            "fmt": pa.array(["wav"] * n_clips, pa.string()),
            "caption": pa.array(caps, pa.string()),
        }
    )


def _expected_audio_stats(aud: pa.Table) -> pa.Table:
    """Naive scalar twin of stages.audio.AudioStats: stdlib ``wave``
    reader + per-sample struct loops, int accumulation."""
    import io as _io
    import struct as _struct
    import wave as _wave

    rows = []
    for i in range(len(aud)):
        aid = aud["audio_id"][i].as_py()
        raw = aud["bytes"][i].as_py()
        try:
            with _wave.open(_io.BytesIO(raw), "rb") as wf:
                ch = wf.getnchannels()
                sr = wf.getframerate()
                nfr = wf.getnframes()
                data = wf.readframes(nfr)
        except (_wave.Error, EOFError):
            rows.append((aid, 0, 0, 0, 0, 0, 0, False))
            continue
        peak = 0
        clip = 0
        sumsq = 0
        for (v,) in _struct.iter_unpack("<h", data):
            a = -v if v < 0 else v
            if a > peak:
                peak = a
            if v >= 32767 or v <= -32768:
                clip += 1
            sumsq += v * v
        rows.append((aid, nfr, sr, ch, peak, clip, sumsq, True))
    cols = list(zip(*rows))
    names = ["audio_id", "n_samples", "sample_rate", "channels", "peak",
             "clip_count", "sumsq", "decoded"]
    return pa.table(
        {
            "audio_id": pa.array(cols[0], pa.string()),
            **{n: pa.array(cols[j], pa.int64()) for j, n in enumerate(names) if 0 < j < 7},
            "decoded": pa.array(cols[7], pa.bool_()),
        }
    )



def _expected_audio_chunks(aud: pa.Table, window: int = 1024) -> pa.Table:
    """Naive scalar twin of stages.audio.chunk_audio (non-overlapping
    windows, channel 0): stdlib wave + struct loops."""
    import io as _io
    import struct as _struct
    import wave as _wave

    rows = []
    for i in range(len(aud)):
        aid = aud["audio_id"][i].as_py()
        raw = aud["bytes"][i].as_py()
        try:
            with _wave.open(_io.BytesIO(raw), "rb") as wf:
                ch = wf.getnchannels()
                data = wf.readframes(wf.getnframes())
        except (_wave.Error, EOFError):
            continue
        samples = [v for (v,) in _struct.iter_unpack("<h", data)][0::ch]
        j = 0
        for st in range(0, max(len(samples), 1), window):
            w = samples[st : st + window]
            if not w:
                break
            rows.append((aid, j, st, len(w), sum(v * v for v in w)))
            j += 1
    cols = list(zip(*rows))
    return pa.table(
        {
            "audio_id": pa.array(cols[0], pa.string()),
            "chunk_idx": pa.array(cols[1], pa.int64()),
            "start": pa.array(cols[2], pa.int64()),
            "n_samples": pa.array(cols[3], pa.int64()),
            "sumsq": pa.array(cols[4], pa.int64()),
        }
    )



def _expected_quality_lr(docs: pa.Table, epochs: int = 40, lr: float = 2.0) -> pa.Table:
    """Naive scalar twin of stages.quality_lr: pure-Python per-row loops
    (counts, hard sigmoid, per-row fixed-point gradient rounding,
    sequential integer sums) — bit-identical weights by construction."""
    PUNCT = set(".,;:!?")
    STOP = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
            "that", "for", "on", "with", "as", "this"}
    FIX = float(1 << 32)
    texts = [t if t is not None else "" for t in docs["text"].to_pylist()]
    ids = docs["doc_id"].to_pylist()

    feats = []
    for t in texts:
        t = str(t)
        n_chars = len(t)
        punct = sum(1 for c in t if c in PUNCT)
        upper = sum(1 for c in t if "A" <= c <= "Z")
        words = t.split()
        n_words = len(words)
        stops = sum(1 for w in words if w.lower() in STOP)
        d_c = float(max(n_chars, 1))
        d_w = float(max(n_words, 1))
        feats.append(
            (1.0, n_chars / 256.0, punct / d_c, stops / d_w,
             n_chars / d_w / 16.0, upper / d_c)
        )
    labels = [1.0 if (x[3] > 0.06 and x[2] < 0.05) else 0.0 for x in feats]

    n_total = len(texts)
    w = [0.0] * 6
    for _ in range(epochs):
        g = [0] * 6
        for x, y in zip(feats, labels):
            z = x[0] * w[0]
            for j in range(1, 6):
                z = z + x[j] * w[j]
            s = 0.5 + z * 0.25
            s = 0.0 if s < 0.0 else (1.0 if s > 1.0 else s)
            err = s - y
            for j in range(6):
                g[j] += int(np.rint((err * x[j]) * FIX))
        for j in range(6):
            w[j] = w[j] - (lr / n_total) * (g[j] / FIX)

    rows = []
    for i, x in enumerate(feats):
        z = x[0] * w[0]
        for j in range(1, 6):
            z = z + x[j] * w[j]
        rows.append((ids[i], int(np.rint(z * float(1 << 20))), z >= 0.0))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "wx_fixed": pa.array([r[1] for r in rows], pa.int64()),
            "kept": pa.array([r[2] for r in rows], pa.bool_()),
        }
    )



def _expected_audio_resample(aud: pa.Table, factor: int = 4) -> pa.Table:
    """Naive scalar twin of stages.audio.ResampleDownmix: wave-module
    decode, per-frame python loops (channel sum // ch, block sum //
    factor), wave-module re-encode, hashlib md5 of the payload."""
    import hashlib as _hashlib
    import io as _io
    import struct as _struct
    import wave as _wave

    rows = []
    for i in range(len(aud)):
        aid = aud["audio_id"][i].as_py()
        raw = aud["bytes"][i].as_py()
        try:
            with _wave.open(_io.BytesIO(raw), "rb") as wf:
                ch = wf.getnchannels()
                sr = wf.getframerate()
                data = wf.readframes(wf.getnframes())
            if sr % factor:
                raise _wave.Error("factor mismatch")
        except (_wave.Error, EOFError):
            rows.append((aid, 0, 0, None, False))
            continue
        flat = [v for (v,) in _struct.iter_unpack("<h", data)]
        mono = []
        for f0 in range(0, len(flat), ch):
            s = 0
            for c in range(ch):
                s += flat[f0 + c]
            mono.append(s // ch)
        n_out = len(mono) // factor
        pooled = []
        for j in range(n_out):
            s = 0
            for k in range(factor):
                s += mono[j * factor + k]
            pooled.append(s // factor)
        bio = _io.BytesIO()
        with _wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr // factor)
            wf.writeframes(b"".join(_struct.pack("<h", v) for v in pooled))
        payload = bio.getvalue()
        rows.append(
            (aid, sr // factor, n_out, _hashlib.md5(payload).hexdigest(), True)
        )
    return pa.table(
        {
            "audio_id": pa.array([r[0] for r in rows], pa.string()),
            "sample_rate": pa.array([r[1] for r in rows], pa.int64()),
            "n_samples": pa.array([r[2] for r in rows], pa.int64()),
            "payload_md5": pa.array([r[3] for r in rows], pa.string()),
            "decoded": pa.array([r[4] for r in rows], pa.bool_()),
        }
    )



def _expected_simplified(fdir: str, tol: float = 0.05) -> pa.Table:
    """Naive scalar twin of stages.simplify: pure-Python recursive
    Douglas-Peucker (same cross-product strict-> test, first-max tie
    rule, closed-ring far-anchor split), md5 of the re-encoded WKB."""
    import hashlib as _hashlib

    from .geo import wkb as _w

    def dp(pts, a, b, keep, t2):
        if b - a < 2:
            return
        ax, ay = pts[a]
        bx, by = pts[b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best_j = -1
        best_s = -1.0
        for j in range(a + 1, b):
            px, py = pts[j]
            if seg2 == 0.0:
                s = (px - ax) ** 2 + (py - ay) ** 2
                bound = t2
            else:
                cr = dx * (py - ay) - dy * (px - ax)
                s = cr * cr
                bound = t2 * seg2
            if s > best_s:
                best_s = s
                best_j = j
        if best_s > (t2 if seg2 == 0.0 else t2 * seg2):
            keep.add(best_j)
            dp(pts, a, best_j, keep, t2)
            dp(pts, best_j, b, keep, t2)

    def simp_ring(ring, closed):
        pts = [(float(x), float(y)) for x, y in (ring[:-1] if closed else ring)]
        n = len(pts)
        if n <= 2:
            return list(range(n))
        t2 = tol * tol
        if not closed:
            keep = {0, n - 1}
            dp(pts, 0, n - 1, keep, t2)
            return sorted(keep)
        # ring: 0/far anchors, two WRAPPED chains (matches the engine)
        far = 0
        fd = -1.0
        for j in range(n):
            d = (pts[j][0] - pts[0][0]) ** 2 + (pts[j][1] - pts[0][1]) ** 2
            if d > fd:
                fd = d
                far = j
        if far == 0:
            return [0]
        ka = {0, far}
        dp(pts, 0, far, ka, t2)
        wrapped = pts[far:] + [pts[0]]
        kb = {0, len(wrapped) - 1}
        dp(wrapped, 0, len(wrapped) - 1, kb, t2)
        keep = set(k for k in ka) | set(
            far + j for j in kb if far + j < n
        )
        return sorted(keep)

    geoms = pq.read_table(os.path.join(fdir, "query_geoms.parquet"))
    rows = []
    for i in range(len(geoms)):
        qid = geoms["query_id"][i].as_py()
        g = _w.decode_geometry(geoms["geometry"][i].as_py())
        t = g["type"]

        def npts(gg):
            if gg is None:
                return 0
            c = gg.get("coordinates", [])
            tt = gg["type"]
            if tt == "Point":
                return 1
            if tt in ("LineString", "MultiPoint"):
                return len(c)
            if tt == "Polygon":
                return sum(len(r) for r in c)
            return sum(len(r) for p in c for r in p)

        if t in ("Point", "MultiPoint"):
            s = g
        elif t == "LineString":
            idx = simp_ring(g["coordinates"], False)
            s = {"type": "LineString",
                 "coordinates": [g["coordinates"][j] for j in idx]}
        elif t == "Polygon":
            out_rings = []
            collapsed = False
            for ri, ring in enumerate(g["coordinates"]):
                idx = simp_ring(ring, True)
                if len(idx) < 3:
                    if ri == 0:
                        collapsed = True
                        break
                    continue
                kept = [list(ring[j]) for j in idx]
                out_rings.append(kept + [list(kept[0])])
            s = None if collapsed or not out_rings else {
                "type": "Polygon", "coordinates": out_rings}
        else:
            raise ValueError(t)
        md5 = None if s is None else _hashlib.md5(_w.encode_geometry(s)).hexdigest()
        rows.append((qid, npts(g), npts(s), md5))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.string()),
            "pts_before": pa.array([r[1] for r in rows], pa.int64()),
            "pts_after": pa.array([r[2] for r in rows], pa.int64()),
            "wkb_md5": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def ensure_derived_fixtures(sf_dir: str) -> str:
    """Write (once, version-stamped) the expected-result fixtures derived
    from the sf tables; returns the fixture dir."""
    fdir = synth.ensure_fixtures(sf_dir)
    done = os.path.join(fdir, "_DERIVED_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == DERIVED_VERSION:
                return fdir
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def write(name: str, table: pa.Table):
        tmp = os.path.join(fdir, f".{name}.tmp.{os.getpid()}")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(fdir, name))

    write("expected_join_pairs.parquet", _expected_join_pairs(fdir))
    write("expected_simhash.parquet", _expected_simhash(docs))
    mh = _naive_minhash_pairs(docs, threshold=0.7)
    write("expected_minhash_pairs.parquet", mh)
    write("expected_ngram_pairs.parquet", _naive_ngram_pairs(docs))
    write("expected_components.parquet", _expected_components(mh))
    write("expected_langid.parquet", _expected_langid(docs))
    write("expected_fingerprints.parquet", _expected_fingerprints(docs))
    write("embeddings_neardup.parquet", _embeddings_with_planted_dups(sf_dir))
    cent, ivf_expected = _ivf_fixture(sf_dir)
    write("ivf_centroids.parquet", cent)
    write("expected_ivf_topk.parquet", ivf_expected)
    pq_books, pq_expected = _pq_fixture(sf_dir)
    write("pq_codebooks.parquet", pq_books)
    write("expected_pq_topk.parquet", pq_expected)
    write("expected_ivfpq_topk.parquet", _expected_ivfpq(sf_dir, cent, pq_books))
    res_books = _residual_pq_fixture(sf_dir, cent)
    write("pq_residual_codebooks.parquet", res_books)
    write("expected_ivfpq_residual.parquet",
          _expected_ivfpq_residual(sf_dir, cent, res_books))
    write("stac_items_validate.parquet", _validation_fixture(fdir))
    write("expected_approx_distinct.parquet", _expected_approx_distinct(sf_dir))
    write("expected_kmeans_train.parquet", _expected_kmeans_train(sf_dir))
    write("expected_packing.parquet", _expected_packing(docs))
    write("expected_zonal.parquet", _expected_zonal(fdir))
    write("expected_band_math.parquet", _expected_band_math(fdir))
    write("expected_point_samples.parquet", _expected_point_samples(fdir))
    write("expected_bpe.parquet", _expected_bpe(docs))
    write("expected_lm_scores.parquet", _expected_lm_scores(docs))
    write("expected_coverage.parquet", _expected_coverage(fdir))
    write("expected_composite.parquet", _expected_composite(fdir))
    write("expected_composite_latest.parquet", _expected_composite_latest(fdir))
    write("expected_hex_counts.parquet", _expected_hex_counts(fdir))
    import glob as _glob

    caps = pa.concat_tables(
        [pq.read_table(p, columns=["image_id", "caption"])
         for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
    )
    write(
        "expected_caption_bpe.parquet",
        _expected_bpe(caps, id_col="image_id", text_col="caption"),
    )
    write(
        "expected_caption_simhash.parquet",
        _expected_simhash(
            pa.table({"doc_id": caps["image_id"], "text": caps["caption"]})
        ),
    )
    write("expected_random_crop.parquet", _expected_random_crop(fdir))
    write("expected_alignment.parquet", _expected_alignment(fdir))
    write("expected_mosaic_delta.parquet", _expected_mosaic_delta(fdir))
    write("expected_tile_mosaic.parquet", _expected_tile_mosaic(fdir))
    aud = _audio_table(max(synth.tier_for(sf_dir)["images"] // 10, 50))
    write("audio.parquet", aud)
    write("expected_audio_stats.parquet", _expected_audio_stats(aud))
    write("expected_audio_chunks.parquet", _expected_audio_chunks(aud))
    write("expected_quality_lr.parquet", _expected_quality_lr(docs))
    write("expected_audio_resample.parquet", _expected_audio_resample(aud))
    write("expected_simplified.parquet", _expected_simplified(fdir))
    vids = _videos_table(max(synth.tier_for(sf_dir)["images"] // 10, 50))
    write("videos.parquet", vids)
    write("expected_frame_stats.parquet", _expected_frame_stats(vids))

    # expected payload digests (scalar hashlib — DuckDB's md5() hashes
    # BLOB→VARCHAR *escaped* text, not raw bytes, so the twin reads this)
    import hashlib as _hashlib

    pay = pa.concat_tables(
        [pq.read_table(p, columns=["image_id", "bytes"])
         for p in sorted(_glob.glob(os.path.join(fdir, "images.parquet", "*.parquet")))]
    )
    write(
        "expected_payload_md5.parquet",
        pa.table(
            {
                "image_id": pay["image_id"],
                "payload_md5": pa.array(
                    [_hashlib.md5(x).hexdigest()
                     for x in pay["bytes"].to_pylist()],
                    pa.string(),
                ),
            }
        ),
    )
    with open(done, "w") as f:
        f.write(DERIVED_VERSION + "\n")
    return fdir
