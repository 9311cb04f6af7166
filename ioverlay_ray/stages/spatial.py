"""Spatial predicate stages: point-in-polygon (winding number), kNN.

PIP uses the same convention as the kernel's fill sweep: a point is
inside when the winding number of polygon edges strictly below/above it
is non-zero, computed with exact integer crossing tests (half-open x
rule, matching ioverlay_ray.geometry.kernel.compute_fills). Broadcast
the small polygon side via ray.put; the big point table streams through
map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tile import cell_id as _cell_id
from .tile import cell_size as _cell_size
from .tile import ring_cells as _ring_cells


def winding_numbers(px: np.ndarray, py: np.ndarray, contour: list) -> np.ndarray:
    """Winding number of each point w.r.t. one closed contour.

    Crossing rule: edge (a, b) normalized to ax < bx contributes its
    direction sign when ax <= px < bx and the point is strictly above
    the edge line (i.e. edge passes strictly below the point).
    Points exactly on an edge get an unspecified count — callers wanting
    boundary semantics must test separately.
    """
    px = np.asarray(px, np.int64)
    py = np.asarray(py, np.int64)
    wn = np.zeros(len(px), dtype=np.int64)
    n = len(contour)
    for i in range(n):
        x0, y0 = contour[i - 1]
        x1, y1 = contour[i]
        if x0 == x1:
            continue
        if x0 < x1:
            ax, ay, bx, by, sgn = x0, y0, x1, y1, 1
        else:
            ax, ay, bx, by, sgn = x1, y1, x0, y0, -1
        cover = (ax <= px) & (px < bx)
        # edge strictly below point: cross((b-a),(p-a)) > 0
        cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        wn += np.where(cover & (cr > 0), sgn, 0)
    return wn


def points_in_polygon(px, py, shape: list, fill_rule: str = "nonzero") -> np.ndarray:
    """Boolean inside-mask for a polygon-with-holes (list of contours)."""
    wn = np.zeros(len(px), dtype=np.int64)
    for contour in shape:
        wn += winding_numbers(px, py, contour)
    if fill_rule == "evenodd":
        return (wn & 1) != 0
    if fill_rule == "positive":
        return wn > 0
    if fill_rule == "negative":
        return wn < 0
    return wn != 0


class PIPCountStage:
    """Count points (streamed batches) inside each broadcast polygon.

    polys: list of (poly_id, shape) — small side, passed by ObjectRef.
    Emits partial counts; sum by poly_id downstream.
    """

    def __init__(self, polys, x_col: str = "px", y_col: str = "py"):
        import ray
        if isinstance(polys, ray.ObjectRef):
            polys = ray.get(polys)
        self.polys = polys
        self.x_col = x_col
        self.y_col = y_col
        # detect the all-axis-aligned-rect case once per actor: winding
        # for a rect reduces to x in [x0, x1) and y in (y0, y1], so a
        # sort + per-rect searchsorted replaces the per-edge sweep
        self.rects = None
        rects = []
        for poly_id, shape in polys:
            if len(shape) != 1 or len(shape[0]) != 4:
                break
            xs = [p[0] for p in shape[0]]
            ys = [p[1] for p in shape[0]]
            ok = all((shape[0][i - 1][0] == shape[0][i][0]) !=
                     (shape[0][i - 1][1] == shape[0][i][1])
                     for i in range(4))
            if not ok:
                break
            rects.append((poly_id, min(xs), max(xs), min(ys), max(ys)))
        else:
            if rects:
                self.rects = rects

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column(self.x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        py = batch.column(self.y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids, counts = [], []
        if self.rects is not None:
            order = np.argsort(px, kind="stable")
            pxs = px[order]
            pys = py[order]
            for poly_id, x0, x1, y0, y1 in self.rects:
                lo = int(np.searchsorted(pxs, x0, side="left"))
                hi = int(np.searchsorted(pxs, x1, side="left"))
                ys = pys[lo:hi]
                ids.append(poly_id)
                counts.append(int(((ys > y0) & (ys <= y1)).sum()))
        else:
            for poly_id, shape in self.polys:
                ids.append(poly_id)
                counts.append(int(points_in_polygon(px, py, shape).sum()))
        return pa.table({
            "poly_id": pa.array(ids, pa.int64()),
            "n_points": pa.array(counts, pa.int64()),
        })


class KnnStage:
    """Partial k-nearest centers per broadcast query point.

    Streams the big center table; per batch computes integer squared
    distances from every query to the batch's centers and keeps the
    per-batch top-k (ties broken by center id). Final merge is a tiny
    sort over n_queries * k * n_batches rows.
    """

    def __init__(self, queries, k: int = 5):
        import ray
        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        self.qid = np.asarray([q[0] for q in queries], np.int64)
        self.qx = np.asarray([q[1] for q in queries], np.int64)
        self.qy = np.asarray([q[2] for q in queries], np.int64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = np.asarray(batch.column("center_id").to_pylist(), np.int64)
        cx = np.asarray(batch.column("cx").to_pylist(), np.int64)
        cy = np.asarray(batch.column("cy").to_pylist(), np.int64)
        out_q, out_c, out_d = [], [], []
        k = min(self.k, len(cid))
        # order centers by id for deterministic tie handling
        order = np.argsort(cid, kind="stable")
        cid, cx, cy = cid[order], cx[order], cy[order]
        for qi in range(len(self.qid)):
            d = (cx - self.qx[qi]) ** 2 + (cy - self.qy[qi]) ** 2
            top = np.argsort(d, kind="stable")[:k]
            out_q.extend([int(self.qid[qi])] * len(top))
            out_c.extend(cid[top].tolist())
            out_d.extend(d[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "center_id": pa.array(out_c, pa.int64()),
            "dist2": pa.array(out_d, pa.int64()),
        })


def merge_knn(partials: pa.Table, k: int = 5) -> pa.Table:
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "dist2", "center_id"])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", "center_id", "rank"]]
    return pa.Table.from_pandas(
        df.reset_index(drop=True),
        preserve_index=False).replace_schema_metadata(None)


class RingKnnStage:
    """kNN via cell-index ring expansion (the H3 ring pattern from the
    north star): centers are bucketed per grid cell once per actor
    (broadcast ObjectRef); query points stream through in batches. Each
    query expands Chebyshev rings from its home cell until the ring's
    distance lower bound exceeds the current k-th best — exact results,
    touching only nearby buckets instead of every center.

    centers: (ids, xs, ys) arrays or an ObjectRef to them.
    """

    def __init__(self, centers, k: int = 5, resolution: int = 8):
        import ray
        if isinstance(centers, ray.ObjectRef):
            centers = ray.get(centers)
        ids, xs, ys = (np.asarray(a, np.int64) for a in centers)
        order = np.argsort(ids, kind="stable")
        ids, xs, ys = ids[order], xs[order], ys[order]
        self.k = k
        self.resolution = resolution
        self.size = _cell_size(resolution)
        cells = _cell_id(xs, ys, resolution)
        self.index: dict = {}
        for c in np.unique(cells):
            m = cells == c
            self.index[int(c)] = (ids[m], xs[m], ys[m])
        self._cell_id = _cell_id

    def _query(self, qid: int, qx: int, qy: int):
        ring_cells = _ring_cells
        home = int(self._cell_id(np.array([qx]), np.array([qy]),
                                 self.resolution)[0])
        cand_i: list = []
        cand_x: list = []
        cand_y: list = []
        seen_rings = 0
        r = 0
        kth = None
        while True:
            ring = ring_cells(home, r)
            new = ring if r == 0 else [c for c in ring
                                       if c not in set(ring_cells(home, r - 1))]
            for c in new:
                b = self.index.get(int(c))
                if b is not None:
                    cand_i.append(b[0]); cand_x.append(b[1]); cand_y.append(b[2])
            seen_rings = r
            n_cand = sum(len(a) for a in cand_i)
            if n_cand >= self.k:
                ci = np.concatenate(cand_i)
                cx = np.concatenate(cand_x)
                cy = np.concatenate(cand_y)
                d2 = (cx - qx) ** 2 + (cy - qy) ** 2
                top = np.lexsort((ci, d2))[:self.k]
                kth = int(d2[top[-1]])
                # a center in ring r+1 is at least r*size away
                if (seen_rings * self.size) ** 2 > kth:
                    return ci[top], d2[top]
            r += 1
            if r > 1 + (1 << 24) // max(1, self.size):
                # degenerate safeguard: fall back to whatever was found
                if cand_i:
                    ci = np.concatenate(cand_i)
                    cx = np.concatenate(cand_x)
                    cy = np.concatenate(cand_y)
                    d2 = (cx - qx) ** 2 + (cy - qy) ** 2
                    top = np.lexsort((ci, d2))[:self.k]
                    return ci[top], d2[top]
                return np.zeros(0, np.int64), np.zeros(0, np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qid = np.asarray(batch.column("query_id").to_pylist(), np.int64)
        qx = np.asarray(batch.column("qx").to_pylist(), np.int64)
        qy = np.asarray(batch.column("qy").to_pylist(), np.int64)
        out_q, out_c, out_r = [], [], []
        for i in range(len(qid)):
            ids, d2 = self._query(int(qid[i]), int(qx[i]), int(qy[i]))
            out_q.extend([int(qid[i])] * len(ids))
            out_c.extend(ids.tolist())
            out_r.extend(range(1, len(ids) + 1))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "center_id": pa.array(out_c, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
        })


_WORKER_CACHE: dict = {}


def pip_count_fn(polys_ref, x_col: str = "px", y_col: str = "py"):
    """Task-pool form of PIPCountStage: runs on Ray's prestarted
    workers (no actor-pool spin-up per query); the stage (and its rect
    detection) is cached per worker process keyed by the ObjectRef."""
    def fn(batch: pa.Table) -> pa.Table:
        key = ("pip", polys_ref, x_col, y_col)
        st = _WORKER_CACHE.get(key)
        if st is None:
            st = PIPCountStage(polys_ref, x_col, y_col)
            _WORKER_CACHE[key] = st
        return st(batch)
    return fn


def ring_knn_fn(centers_ref, k: int = 5, resolution: int = 8):
    """Task-pool form of RingKnnStage: runs on Ray's prestarted workers
    (no actor-pool spin-up per query); the cell index is built once per
    worker process and cached keyed by the centers ObjectRef."""
    def fn(batch: pa.Table) -> pa.Table:
        key = ("ring_knn", centers_ref, k, resolution)
        st = _WORKER_CACHE.get(key)
        if st is None:
            st = RingKnnStage(centers_ref, k, resolution)
            _WORKER_CACHE[key] = st
        return st(batch)
    return fn
