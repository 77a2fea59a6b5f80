"""kNN item search (SURVEY.md J4): k nearest image footprints to each probe
point.

Distributed top-k without an all-to-all: every batch computes its LOCAL
top-k per probe (vectorized partial argpartition — the combiner), emitting
at most Q×k tiny rows per batch; a final ``groupby(query_id)`` over those
partials (a small shuffle over partial winners, never the data) keeps the
global k. This is the streaming-friendly formulation of the reference's
"nearest = sort by distance" (SURVEY.md O3) — a full ``ds.sort`` per query
would be Q full shuffles.

Distance: great-circle-free planar degrees to the footprint center
(deterministic, matches the DuckDB oracle's expression); the probe side is
broadcast once via ``ray.put``.

A cell-ring index variant for point lookups (``CellKNNIndex``) serves the
interactive path: an actor pool holding a cell→rows index for repeated
low-latency probes, with ring expansion at the cell resolution until the
kth distance is below the ring lower bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geo import cells
from .footprint import derive_footprints

__all__ = ["knn_join", "nearest_neighbor_join", "CellKNNIndex", "ShardedKNNIndex"]


_EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


class _PartialTopK:
    def __init__(self, probes_ref, k: int, derive: bool = False,
                 metric: str = "planar"):
        probes = ray.get(probes_ref)  # dict: query_id → (x, y)
        self.qids = list(probes.keys())
        pts = np.asarray(list(probes.values()), dtype=np.float64)
        self.px = pts[:, 0]
        self.py = pts[:, 1]
        self.k = k
        self.derive = derive
        if metric not in ("planar", "haversine"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        if metric == "haversine":
            # probe-side trig once per actor, not per batch
            self.plat = np.radians(self.py)
            self.plon = np.radians(self.px)
            self.pcos = np.cos(self.plat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.derive:
            # fused footprint derivation: no intermediate corner columns
            # through the object store (same design as _BroadcastJoiner)
            batch = derive_footprints(batch)
        cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
        cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
        n = len(cx)
        if n == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "image_id": pa.array([], pa.string()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        k = min(self.k, n)
        nq = len(self.qids)
        if self.metric == "haversine":
            # corpus-side trig once per batch (N-length, reused per chunk)
            lat = np.radians(cy)
            lon = np.radians(cx)
            ccos = np.cos(lat)
        rows_parts, qidx_parts, dist_parts = [], [], []
        # probe-chunked so the (chunk, N) distance matrix stays L3-resident
        # (same lesson as the join's exact kernel — see BENCH/BASELINE.md);
        # 1M-element target measured 3.1× faster per batch than 4M (the
        # 4M-element d2 temporary spills L3: 32MB vs 8MB at batch 8192)
        chunk = max(1, 1_000_000 // max(n, 1))
        for s in range(0, nq, chunk):
            e = min(s + chunk, nq)
            if self.metric == "haversine":
                # hav term h = sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2):
                # monotonic in great-circle distance, so top-k selects on h
                # and only the ≤ q×k winners pay the asin
                sdlat = np.sin((lat[None, :] - self.plat[s:e, None]) * 0.5)
                sdlon = np.sin((lon[None, :] - self.plon[s:e, None]) * 0.5)
                d2 = sdlat * sdlat + (
                    self.pcos[s:e, None] * ccos[None, :]
                ) * (sdlon * sdlon)
            else:
                d2 = (cx[None, :] - self.px[s:e, None]) ** 2 + (
                    cy[None, :] - self.py[s:e, None]
                ) ** 2
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]  # (q,k) local winners
            rows = part.ravel()
            qidx = np.repeat(np.arange(s, e), k)
            rows_parts.append(rows)
            qidx_parts.append(qidx)
            sel = d2[np.repeat(np.arange(e - s), k), rows]
            if self.metric == "haversine":
                dist_parts.append(
                    2.0 * _EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(sel, 1.0)))
                )
            else:
                dist_parts.append(np.sqrt(sel))
        rows = np.concatenate(rows_parts)
        qidx = np.concatenate(qidx_parts)
        dist = np.concatenate(dist_parts)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(self.qids, dtype=object)[qidx], pa.string()),
                "image_id": batch["image_id"].take(pa.array(rows)),
                "dist": pa.array(dist, pa.float64()),
            }
        )


def knn_join(
    images_ds: "ray.data.Dataset",
    probes: dict[str, tuple[float, float]],
    k: int | dict[str, int],
    *,
    batch_size: int = 8192,
    concurrency: int | tuple[int, int] = 4,
    footprints_derived: bool = False,
    combine: str = "driver",
    metric: str = "planar",
) -> "ray.data.Dataset":
    """→ (query_id, image_id, dist): global k nearest per probe point.

    ``k`` may be a single int or a per-query dict {query_id: k}; the
    per-batch partial keeps max(k) per probe, the final per-query group
    trims to that probe's own k.

    ``metric="planar"`` (default) is Euclidean degrees on footprint
    centers (matches the reference's planar search semantics);
    ``metric="haversine"`` is great-circle km on the sphere — the
    partial top-k selects on the monotonic hav term so the trig stays
    one vectorized pass per batch and only winners pay the asin.
    """
    per_query_k = k if isinstance(k, dict) else {q: k for q in probes}
    kmax = max(per_query_k.values()) if per_query_k else 0
    probes_ref = ray.put(probes)
    k_ref = ray.put(per_query_k)
    partials = images_ds.map_batches(
        _PartialTopK,
        fn_constructor_args=(probes_ref, kmax, not footprints_derived, metric),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    if combine == "shuffle":
        # distributed merge for probe sets beyond driver memory

        def final_topk(g: pd.DataFrame) -> pd.DataFrame:
            kk = ray.get(k_ref)[g["query_id"].iloc[0]]
            return g.nsmallest(kk, "dist")

        return partials.groupby("query_id").map_groups(
            final_topk, batch_format="pandas"
        )

    # default: the partial stream is ≤ probes × kmax × blocks tiny rows —
    # bounded by the BROADCAST side, not the corpus — so the final merge
    # is one streamed pandas pass instead of a sort shuffle (the measured
    # driver-merge rule, BENCH/BASELINE.md)
    import ray.data as rd

    parts = [
        b.to_pandas()
        for b in partials.iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "image_id": pa.array([], pa.string()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        )
    df = pd.concat(parts, ignore_index=True).sort_values(
        ["query_id", "dist"], kind="mergesort"
    )
    rank = df.groupby("query_id", sort=False).cumcount()
    keep = rank < df["query_id"].map(per_query_k).fillna(0).astype(int)
    return rd.from_pandas(df.loc[keep].reset_index(drop=True))


class CellKNNIndex:
    """In-memory cell-ring kNN index for repeated point probes.

    Built from a (small enough to hold per actor) footprint-center table:
    centers bucketed by grid cell at ``res``. ``query(x, y, k)`` expands
    neighbor rings r=0,1,2,… collecting candidates until the kth best
    distance is ≤ the lower bound of the next unexplored ring (ring r's
    cells are ≥ (r-1)·cell_size away), the classic grid-file kNN search.

    At 10^12 scale this index is sharded: one actor per coarse cell range,
    with the driver routing probes by cell — the structure here is the
    per-shard piece.
    """

    def __init__(self, image_ids: np.ndarray, cx: np.ndarray, cy: np.ndarray, res: int = 6):
        self.res = res
        self.ids = np.asarray(image_ids)
        self.cx = np.asarray(cx, dtype=np.float64)
        self.cy = np.asarray(cy, dtype=np.float64)
        cell = cells.cell_encode(self.cx, self.cy, res)
        order = np.argsort(cell, kind="stable")
        self._cells_sorted = cell[order]
        self._order = order
        self._uniq, self._starts = np.unique(self._cells_sorted, return_index=True)

    def _rows_in_cell(self, cell: int) -> np.ndarray:
        i = np.searchsorted(self._uniq, cell)
        if i >= len(self._uniq) or self._uniq[i] != cell:
            return np.empty(0, dtype=np.int64)
        lo = self._starts[i]
        hi = self._starts[i + 1] if i + 1 < len(self._starts) else len(self._cells_sorted)
        return self._order[lo:hi]

    def query(self, x: float, y: float, k: int, max_ring: int = 64):
        dlon, dlat = cells.cell_size_deg(self.res)
        min_cell = min(dlon, dlat)
        home = int(cells.cell_encode(np.array([x]), np.array([y]), self.res)[0])
        cand_rows: list[np.ndarray] = []
        best_kth = np.inf
        for r in range(max_ring + 1):
            lower_bound = (r - 1) * min_cell if r > 0 else 0.0
            if lower_bound > best_kth:
                break
            ring = cells.cell_ring(home, r)
            got = [self._rows_in_cell(int(c)) for c in ring]
            got = [g for g in got if len(g)]
            if got:
                cand_rows.extend(got)
                rows = np.concatenate(cand_rows)
                d = np.hypot(self.cx[rows] - x, self.cy[rows] - y)
                if len(d) >= k:
                    best_kth = np.partition(d, k - 1)[k - 1]
        if not cand_rows:
            return np.empty(0, dtype=self.ids.dtype), np.empty(0)
        rows = np.concatenate(cand_rows)
        d = np.hypot(self.cx[rows] - x, self.cy[rows] - y)
        kk = min(k, len(d))
        top = np.argsort(d, kind="stable")[:kk]
        return self.ids[rows[top]], d[top]


@ray.remote
class _KNNShard:
    """One index shard: a CellKNNIndex over the rows whose cell hashes to
    this shard. The 'raw actor' case of SURVEY.md §2.4 — a shared queryable
    index the Dataset API can't express."""

    def __init__(self, res: int):
        self._parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._index: CellKNNIndex | None = None
        self._res = res

    def add(self, ids, cx, cy) -> int:
        self._parts.append((np.asarray(ids), np.asarray(cx), np.asarray(cy)))
        self._index = None
        return sum(len(p[0]) for p in self._parts)

    def _built(self) -> CellKNNIndex:
        if self._index is None:
            ids = np.concatenate([p[0] for p in self._parts])
            cx = np.concatenate([p[1] for p in self._parts])
            cy = np.concatenate([p[2] for p in self._parts])
            self._index = CellKNNIndex(ids, cx, cy, res=self._res)
        return self._index

    def query(self, x: float, y: float, k: int):
        ids, d = self._built().query(x, y, k)
        return list(ids), list(d)


class ShardedKNNIndex:
    """Scatter-gather kNN over cell-sharded index actors.

    Build: one streaming pass over the footprint Dataset routes each row's
    (id, center) to the shard owning its cell (``cell % num_shards``) — the
    per-shard slice is what a node would hold at cluster scale. Query:
    probe all shards (k results each) and merge the global top-k on the
    driver. With range-sharding the probe set narrows to the shards whose
    cell ranges intersect the probe ring; modulo-sharding (here) trades
    that for perfect balance.
    """

    def __init__(self, images_ds, *, num_shards: int = 4, res: int = 6,
                 footprints_derived: bool = False):
        from .footprint import derive_footprints as _derive

        ds = images_ds
        if not footprints_derived:
            ds = ds.map_batches(_derive, batch_format="pyarrow")
        self.res = res
        self.shards = [_KNNShard.remote(res) for _ in range(num_shards)]
        shards = self.shards

        def route(batch: pa.Table) -> pa.Table:
            """Build stage: each map task pushes its rows straight to the
            owning shard actors — the dataset never streams through the
            driver (r01 verdict: the driver-side iter_batches loop was the
            build-path bottleneck). The in-task ray.get acks the push so
            backpressure applies before the task completes."""
            cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
            cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
            ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
            cell = cells.cell_encode(cx, cy, res)
            shard_of = (cell % num_shards).astype(np.int64)
            refs = []
            for s in range(num_shards):
                m = shard_of == s
                if m.any():
                    refs.append(shards[s].add.remote(ids[m], cx[m], cy[m]))
            ray.get(refs)
            return pa.table({"n": pa.array([len(batch)], pa.int64())})

        total = ds.map_batches(
            route, batch_format="pyarrow", batch_size=32768
        ).sum("n")
        self.num_rows = int(total or 0)

    def query(self, x: float, y: float, k: int):
        results = ray.get([s.query.remote(x, y, k) for s in self.shards])
        ids = np.concatenate([np.asarray(r[0], dtype=object) for r in results])
        d = np.concatenate([np.asarray(r[1], dtype=np.float64) for r in results])
        top = np.argsort(d, kind="stable")[: min(k, len(d))]
        return ids[top], d[top]


_TAIL_PARTIAL_SCHEMA = pa.schema(
    [("pi", pa.int64()), ("nn_id", pa.string()), ("dist2", pa.float64())]
)


def _resolve_tail_broadcast(
    images_ds: "ray.data.Dataset",
    probe_ids: np.ndarray,
    probe_x: np.ndarray,
    probe_y: np.ndarray,
    *,
    footprints_derived: bool = False,
    max_elems: int = 8_000_000,
    chunk: int = 500_000,
):
    """Exact NN for the (rare) unresolved probes WITHOUT gathering the
    corpus to the driver: the probe set is broadcast once (``ray.put``,
    read per task) and one streaming pass over the corpus metadata emits
    each batch's best candidate per probe — only P × num_blocks tiny
    partial rows return, never the centers. Tie-break matches the cell
    kernel: candidates pre-sorted by id inside each batch (argmin's
    first-minimum = smallest tied id), and the driver merge re-sorts by
    (dist2, nn_id). Probe sets beyond ``chunk`` run in multiple passes so
    the broadcast object and the (P, N) distance tiles stay bounded.

    Returns a pandas DataFrame (image_id, nn_id, dist2), one row/probe.
    """
    import pandas as pd_

    out_frames = []
    for s0 in range(0, len(probe_ids), chunk):
        pid = np.asarray(probe_ids[s0 : s0 + chunk], dtype=object)
        px = np.asarray(probe_x[s0 : s0 + chunk], dtype=np.float64)
        py = np.asarray(probe_y[s0 : s0 + chunk], dtype=np.float64)
        probes_ref = ray.put((pid, px, py))

        def partial(batch: pa.Table, _ref=probes_ref) -> pa.Table:
            qid, qx, qy = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            if not footprints_derived:
                batch = derive_footprints(batch)
            n = len(batch)
            if n == 0:
                return _TAIL_PARTIAL_SCHEMA.empty_table()
            cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
            cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
            ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
            order = np.argsort(ids, kind="mergesort")
            ids, cx, cy = ids[order], cx[order], cy[order]
            P = len(qid)
            # self-exclusion: each probe id occurs at most once per batch
            pos = np.searchsorted(ids, qid)
            has_self = (pos < n) & (ids[np.minimum(pos, n - 1)] == qid)
            best = np.zeros(P, np.int64)
            bd2 = np.zeros(P)
            step = max(1, max_elems // max(n, 1))
            for a in range(0, P, step):
                b = min(a + step, P)
                dx = qx[a:b, None] - cx[None, :]
                dy = qy[a:b, None] - cy[None, :]
                d2 = dx * dx + dy * dy
                selfs = np.flatnonzero(has_self[a:b])
                d2[selfs, pos[a:b][selfs]] = np.inf
                loc = np.argmin(d2, axis=1)
                best[a:b] = loc
                bd2[a:b] = d2[np.arange(b - a), loc]
            return pa.table(
                {
                    "pi": pa.array(np.arange(P, dtype=np.int64), pa.int64()),
                    "nn_id": pa.array(ids[best].astype(object), pa.string()),
                    "dist2": pa.array(bd2, pa.float64()),
                }
            )

        parts = [
            b.to_pandas()
            for b in images_ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        pp = pd_.concat(parts, ignore_index=True)
        pp = pp.sort_values(["pi", "dist2", "nn_id"], kind="mergesort")
        top = pp.drop_duplicates("pi", keep="first")
        out_frames.append(
            pd_.DataFrame(
                {
                    "image_id": pid[top["pi"].to_numpy()],
                    "nn_id": top["nn_id"].to_numpy(object),
                    "dist2": top["dist2"].to_numpy(np.float64),
                }
            )
        )
    return pd_.concat(out_frames, ignore_index=True)


def _auto_res(images_ds) -> int:
    """Grid resolution from the input size (metadata-cheap count):
    +1 level per 4x rows keeps rows-per-cell CONSTANT, so the per-cell
    dense kernel stays O(n) total instead of O(n^2/cells). Anchored at
    1M rows -> res 10 (measured best); the r5 10M probe measured res=10
    at 137s vs res=12 at 16s — the quadratic cell population was the
    whole regression. Clamped to [6, 14]."""
    import math

    n = max(int(images_ds.count() or 1), 1)
    return int(np.clip(10 + math.ceil(math.log(n / 1e6, 4)), 6, 14))


def nearest_neighbor_join(
    images_ds: "ray.data.Dataset",
    *,
    res: "int | None" = None,
    footprints_derived: bool = False,
    concurrency: int | tuple[int, int] = 4,
):
    """→ (image_id, nn_id, dist2): each image's nearest OTHER image
    (footprint centers, planar squared degrees, ties to the smallest id)
    — the distributed SELF-join the broadcast machinery can't do (both
    sides are the corpus).

    Shape: every row ghosts into its 3×3 cell neighborhood (9 metadata
    rows/image — id + 2 floats, never payloads); one ``groupby(cell)``
    co-locates each cell's HOME rows with every point that can matter,
    and the per-group kernel is one (H, A) distance matrix. A candidate
    is provably global iff its distance ≤ the row's distance to the
    ring boundary (rectangular cells: per-side check, domain edges count
    as +inf); the rare unresolved rows — points whose neighborhood is
    locally empty, vanishing as density grows — are broadcast as probes
    into one exact streaming partial-NN pass over the corpus metadata
    (``_resolve_tail_broadcast``): only tiny per-block partials return to
    the driver, never the centers themselves.
    """
    import pandas as pd_

    from ..geo.cells import _LAT_SPAN, _LON_SPAN  # type: ignore

    if res is None:
        res = _auto_res(images_ds)
    n_cells = 1 << res
    dlon = _LON_SPAN / n_cells
    dlat = _LAT_SPAN / n_cells

    def explode(batch: pa.Table) -> pa.Table:
        if not footprints_derived:
            batch = derive_footprints(batch)
        cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
        cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
        ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        x = np.clip(((cx + 180.0) / _LON_SPAN * n_cells).astype(np.int64), 0, n_cells - 1)
        y = np.clip(((cy + 90.0) / _LAT_SPAN * n_cells).astype(np.int64), 0, n_cells - 1)
        out_id, out_cx, out_cy, out_cell, out_home = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = x + dx, y + dy
                ok = (gx >= 0) & (gx < n_cells) & (gy >= 0) & (gy < n_cells)
                out_id.append(ids[ok])
                out_cx.append(cx[ok])
                out_cy.append(cy[ok])
                out_cell.append(gy[ok] * n_cells + gx[ok])
                out_home.append(np.full(int(ok.sum()), dx == 0 and dy == 0))
        return pa.table(
            {
                "cell": pa.array(np.concatenate(out_cell), pa.int64()),
                "image_id": pa.array(np.concatenate(out_id), pa.string()),
                "cx": pa.array(np.concatenate(out_cx), pa.float64()),
                "cy": pa.array(np.concatenate(out_cy), pa.float64()),
                "home": pa.array(np.concatenate(out_home), pa.bool_()),
            }
        )

    def _direct(ax, ay, hsel, cand, max_elems: int = 8_000_000):
        """Chunked (H, C) nearest among ``cand`` rows for home rows
        ``hsel`` (both index arrays into the cell arrays); self excluded.
        Returns (best_global_idx, best_d2)."""
        cx_ = ax[cand]
        cy_ = ay[cand]
        best = np.zeros(len(hsel), np.int64)
        bd2 = np.zeros(len(hsel))
        step = max(1, max_elems // max(len(cand), 1))
        for s in range(0, len(hsel), step):
            e = min(s + step, len(hsel))
            hs = hsel[s:e]
            dx = ax[hs][:, None] - cx_[None, :]
            dy = ay[hs][:, None] - cy_[None, :]
            d2 = dx * dx + dy * dy
            d2[hs[:, None] == cand[None, :]] = np.inf  # self
            bloc = np.argmin(d2, axis=1)
            best[s:e] = cand[bloc]
            bd2[s:e] = d2[np.arange(e - s), bloc]
        return best, bd2

    HOT = 4096  # rows per cell beyond which the local-grid path kicks in

    def kernel(aid, ax, ay, hm, cell: int):
        """One cell's NN candidates; input sorted by id so argmin's
        first-minimum rule == smallest tied id. Returns result arrays.

        Hot cells (planted dense scenes) would make the (H, A) matrix
        quadratic in the cell population, so above ``HOT`` rows the cell
        regrids LOCALLY (the same ghost-ring + certificate construction
        one level down, 16×16 subcells); rows whose local certificate
        fails re-run against the whole cell (chunked), and only rows the
        CELL-level certificate can't prove escalate to the driver."""
        hidx = np.flatnonzero(hm)
        if len(hidx) == 0:
            return (aid[hidx], aid[hidx], np.zeros(0), np.zeros(0, bool),
                    np.zeros(0), np.zeros(0))
        if len(aid) < 2:
            return (
                aid[hidx],
                np.full(len(hidx), "", object),
                np.full(len(hidx), np.inf),
                np.zeros(len(hidx), bool),
                ax[hidx],
                ay[hidx],
            )
        ex = cell % (1 << res)
        ey = cell // (1 << res)
        cx0 = -180.0 + ex * dlon
        cy0 = -90.0 + ey * dlat
        hx, hy = ax[hidx], ay[hidx]
        # cell-level certificate radius (domain edges count as +inf)
        left = np.where(ex == 0, np.inf, hx - (cx0 - dlon))
        right = np.where(ex == (1 << res) - 1, np.inf, (cx0 + 2 * dlon) - hx)
        bot = np.where(ey == 0, np.inf, hy - (cy0 - dlat))
        top = np.where(ey == (1 << res) - 1, np.inf, (cy0 + 2 * dlat) - hy)
        bdist = np.minimum(np.minimum(left, right), np.minimum(bot, top))

        if len(aid) <= HOT:
            best, bd2 = _direct(ax, ay, hidx, np.arange(len(aid)))
        else:
            # local 16×16 regrid: bucket by CLIPPED coords (out-of-cell
            # ghosts collapse into edge buckets, which over-includes
            # candidates — safe) and solve each subcell against its ring
            g = 16
            bx = np.clip(((ax - cx0) / dlon * g).astype(np.int64), 0, g - 1)
            by = np.clip(((ay - cy0) / dlat * g).astype(np.int64), 0, g - 1)
            bucket = by * g + bx
            order_b = np.argsort(bucket, kind="mergesort")
            sb = bucket[order_b]
            starts = np.searchsorted(sb, np.arange(g * g))
            ends = np.searchsorted(sb, np.arange(g * g), side="right")
            best = np.full(len(hidx), -1, np.int64)
            bd2 = np.full(len(hidx), np.inf)
            ok_local = np.zeros(len(hidx), bool)
            hpos_of = np.full(len(aid), -1, np.int64)
            hpos_of[hidx] = np.arange(len(hidx))
            sdx, sdy = dlon / g, dlat / g
            for byy in range(g):
                for bxx in range(g):
                    b = byy * g + bxx
                    rows_b = order_b[starts[b]:ends[b]]
                    hsel = rows_b[hm[rows_b]]
                    if len(hsel) == 0:
                        continue
                    ring = []
                    for dy2 in (-1, 0, 1):
                        for dx2 in (-1, 0, 1):
                            nx, ny = bxx + dx2, byy + dy2
                            if 0 <= nx < g and 0 <= ny < g:
                                nb = ny * g + nx
                                ring.append(order_b[starts[nb]:ends[nb]])
                    cand = np.concatenate(ring)
                    if len(cand) < 2:
                        continue
                    bb, bb2 = _direct(ax, ay, hsel, np.sort(cand))
                    hp = hpos_of[hsel]
                    best[hp] = bb
                    bd2[hp] = bb2
                    # sub-certificate: distance to the subring boundary
                    sx0 = cx0 + bxx * sdx
                    sy0 = cy0 + byy * sdy
                    sl = ax[hsel] - (sx0 - sdx)
                    sr = (sx0 + 2 * sdx) - ax[hsel]
                    sbm = ay[hsel] - (sy0 - sdy)
                    st = (sy0 + 2 * sdy) - ay[hsel]
                    sd = np.minimum(np.minimum(sl, sr), np.minimum(sbm, st))
                    ok_local[hp] = np.isfinite(bb2) & (bb2 <= sd * sd)
            # local-certificate failures: chunked pass vs the WHOLE cell
            redo = np.flatnonzero(~ok_local)
            if len(redo):
                bb, bb2 = _direct(ax, ay, hidx[redo], np.arange(len(aid)))
                best[redo] = bb
                bd2[redo] = bb2
        return (
            aid[hidx],
            aid[best],
            bd2,
            np.isfinite(bd2) & (bd2 <= bdist * bdist),
            hx,
            hy,
        )

    _RESULT_COLS = ("image_id", "nn_id", "dist2", "resolved",
                    "raw_cell", "cx", "cy", "home")

    def batch_proc(batch: pa.Table) -> pa.Table:
        """Process whole cells found inside this SORTED batch; the batch's
        first/last cell may continue in neighboring batches, so their raw
        rows pass through (raw_cell >= 0) for the driver's boundary pass.
        This replaces groupby().map_groups, whose fixed ~10ms/group cost
        dominated at 30k cells (396s → ~20s at 1M rows)."""
        out = {c: [] for c in _RESULT_COLS}
        cells_np = batch["cell"].to_numpy()
        n = len(cells_np)
        if n == 0:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "nn_id": pa.array([], pa.string()),
                    "dist2": pa.array([], pa.float64()),
                    "resolved": pa.array([], pa.bool_()),
                    "raw_cell": pa.array([], pa.int64()),
                    "cx": pa.array([], pa.float64()),
                    "cy": pa.array([], pa.float64()),
                    "home": pa.array([], pa.bool_()),
                }
            )
        aid = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        ax = batch["cx"].to_numpy()
        ay = batch["cy"].to_numpy()
        hm = batch["home"].to_numpy()
        if np.any(cells_np[1:] < cells_np[:-1]):
            # Backstop: the executor handed us non-adjacent sorted blocks
            # (shouldn't happen with preserve_order=True set below, but
            # out-of-order bundling would silently break the interior-cell
            # completeness assumption). Route the WHOLE batch to the
            # driver boundary pass, which groups by raw_cell across
            # batches — correct, just slower.
            passthrough = np.ones(n, bool)
        else:
            lo, hi = cells_np[0], cells_np[-1]
            passthrough = (cells_np == lo) | (cells_np == hi)
        out["image_id"].append(aid[passthrough])
        out["nn_id"].append(np.full(int(passthrough.sum()), "", object))
        out["dist2"].append(np.full(int(passthrough.sum()), np.inf))
        out["resolved"].append(np.zeros(int(passthrough.sum()), bool))
        out["raw_cell"].append(cells_np[passthrough])
        out["cx"].append(ax[passthrough])
        out["cy"].append(ay[passthrough])
        out["home"].append(hm[passthrough])
        inner = np.flatnonzero(~passthrough)
        if len(inner):
            ic = cells_np[inner]
            starts = np.flatnonzero(np.concatenate([[True], ic[1:] != ic[:-1]]))
            bounds = np.append(starts, len(ic))
            for s, e in zip(bounds[:-1], bounds[1:]):
                rows = inner[s:e]
                order = rows[np.argsort(aid[rows], kind="mergesort")]
                rid, rnn, rd2, rok, rhx, rhy = kernel(
                    aid[order], ax[order], ay[order], hm[order], int(ic[s])
                )
                out["image_id"].append(rid)
                out["nn_id"].append(rnn)
                out["dist2"].append(rd2)
                out["resolved"].append(rok)
                out["raw_cell"].append(np.full(len(rid), -1, np.int64))
                # real home coords: the unresolved tail re-probes with
                # these — the driver never needs the corpus centers
                out["cx"].append(rhx)
                out["cy"].append(rhy)
                out["home"].append(np.zeros(len(rid), bool))
        return pa.table(
            {
                "image_id": pa.array(np.concatenate(out["image_id"]).astype(object), pa.string()),
                "nn_id": pa.array(np.concatenate(out["nn_id"]).astype(object), pa.string()),
                "dist2": pa.array(np.concatenate(out["dist2"]), pa.float64()),
                "resolved": pa.array(np.concatenate(out["resolved"]), pa.bool_()),
                "raw_cell": pa.array(np.concatenate(out["raw_cell"]), pa.int64()),
                "cx": pa.array(np.concatenate(out["cx"]), pa.float64()),
                "cy": pa.array(np.concatenate(out["cy"]), pa.float64()),
                "home": pa.array(np.concatenate(out["home"]), pa.bool_()),
            }
        )

    candidates = (
        images_ds.map_batches(explode, batch_format="pyarrow")
        .sort("cell")
        # large explicit batches: boundary (passthrough) cells are 2 per
        # BATCH, so small default batches would send most rows to the
        # driver pass (lesson 15 in NOTES.md)
        .map_batches(batch_proc, batch_format="pyarrow", batch_size=262_144)
    )
    import os as _os
    import time as _time

    import pyarrow.compute as pc

    _dbg = _os.environ.get("GRAFT_NN_DEBUG") == "1"
    _t0 = _time.perf_counter()
    import ray.data as rd

    # materialize ONCE (result-sized, ~1.1 rows/input): two consumers
    # follow — the distributed resolved stream, and the tiny driver-side
    # boundary/unresolved gather — and must not re-run the pipeline.
    # preserve_order is REQUIRED here: batch_proc's interior-cell
    # completeness proof assumes each map task bundles ADJACENT blocks of
    # the sorted stream (same pattern as shuffle.py / export.py).
    _ctx = rd.DataContext.get_current()
    _prev_po = _ctx.execution_options.preserve_order
    _ctx.execution_options.preserve_order = True
    try:
        cand_mat = candidates.materialize()
    finally:
        _ctx.execution_options.preserve_order = _prev_po
    if _dbg:
        print(f"[nn] pipeline {_time.perf_counter()-_t0:.2f}s")
        _t0 = _time.perf_counter()

    def keep_final(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["raw_cell"], -1), t["resolved"])
        return t.filter(m).select(["image_id", "nn_id", "dist2"])

    resolved_ds = cand_mat.map_batches(keep_final, batch_format="pyarrow")

    def keep_driver(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.or_(pc.greater_equal(t["raw_cell"], 0), pc.invert(t["resolved"]))
        )

    parts = [
        b.to_pandas()
        for b in cand_mat.map_batches(keep_driver, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if not parts:
        return resolved_ds
    df = pd_.concat(parts, ignore_index=True)
    # boundary cells: straddle block edges, finished locally on the driver
    # (≤ 2 cells per block — a tiny fraction of the corpus)
    raw = df.loc[df["raw_cell"] >= 0]
    done = [
        df.loc[df["raw_cell"] < 0, ["image_id", "nn_id", "dist2", "resolved", "cx", "cy"]]
    ]
    if len(raw):
        for cell_v, g in raw.groupby("raw_cell", sort=False):
            g = g.sort_values("image_id", kind="mergesort")
            rid, rnn, rd2, rok, rhx, rhy = kernel(
                g["image_id"].to_numpy(),
                g["cx"].to_numpy(),
                g["cy"].to_numpy(),
                g["home"].to_numpy(),
                int(cell_v),
            )
            done.append(
                pd_.DataFrame(
                    {"image_id": rid, "nn_id": rnn, "dist2": rd2, "resolved": rok,
                     "cx": rhx, "cy": rhy}
                )
            )
    df = pd_.concat(done, ignore_index=True)
    need = df.loc[~df["resolved"]]
    if _dbg:
        print(f"[nn] boundary cells={raw['raw_cell'].nunique() if len(raw) else 0} "
              f"raw_rows={len(raw)} unresolved={len(need)} "
              f"gather+boundary {_time.perf_counter()-_t0:.2f}s")
        _t0 = _time.perf_counter()
    if len(need):
        # exact NN for the provably-unresolved tail: broadcast the probes
        # and stream ONE partial-NN pass over the corpus — the corpus
        # centers never reach the driver (r02 verdict: the old gather was
        # the one scale-killer branch in this join)
        fixed = _resolve_tail_broadcast(
            images_ds,
            need["image_id"].to_numpy(),
            need["cx"].to_numpy(),
            need["cy"].to_numpy(),
            footprints_derived=footprints_derived,
        )
        df = pd_.concat(
            [df.loc[df["resolved"], ["image_id", "nn_id", "dist2"]], fixed],
            ignore_index=True,
        )
    else:
        df = df[["image_id", "nn_id", "dist2"]]
    if _dbg:
        print(f"[nn] fallback {_time.perf_counter()-_t0:.2f}s")
    # output order is unspecified (a distributed stream union'd with the
    # driver-fixed boundary slice); sort downstream if you need one
    if len(df) == 0:
        return resolved_ds
    tail = pa.table(
        {
            "image_id": pa.array(df["image_id"].to_numpy(object), pa.string()),
            "nn_id": pa.array(df["nn_id"].to_numpy(object), pa.string()),
            "dist2": pa.array(df["dist2"].to_numpy(np.float64), pa.float64()),
        }
    )
    return resolved_ds.union(rd.from_arrow(tail))
