"""Tile-distributed point-in-polygon for a GIANT polygon.

The distributed regime from SURVEY.md §7 step 4 in its cleanest form:
a polygon too big to broadcast is FRAGMENTED at x-strip borders (the
GridLayout analog — horizontal edges split at strip boundaries, so every
edge lives wholly inside one strip), points are co-partitioned by the
same strip key, and one shuffle brings each point together with exactly
the edges whose x-span can cover it. The per-strip winding sum is then
local and vectorized — no broadcast, no carry-in (strips partition x
completely), no all-pairs work.

The test polygon is a comb: a base strip plus one tooth per 8 world
units with deterministic heights, so DuckDB reproduces inside-ness with
modular interval arithmetic while the Ray side runs the real fragmented
winding pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

STRIP = 512           # x-strip width (the partition key unit)
TOOTH_PITCH = 8
BASE_H = 2


def comb_contour(n_teeth: int) -> list:
    """One closed orthogonal ring: base [0, 8n]x[0,2] + tooth k at
    [8k+2, 8k+6] x [2, 2 + 3 + k % 5] (CCW)."""
    w = TOOTH_PITCH * n_teeth
    pts = [(0, 0), (w, 0), (w, BASE_H)]
    for k in range(n_teeth - 1, -1, -1):
        x0 = TOOTH_PITCH * k + 2
        x1 = TOOTH_PITCH * k + 6
        h = BASE_H + 3 + (k % 5)
        pts += [(x1, BASE_H), (x1, h), (x0, h), (x0, BASE_H)]
    pts.append((0, BASE_H))
    return pts


def fragment_edges(contour: list) -> pa.Table:
    """Directed edges, normalized a<b with winding sign, split at strip
    borders; one row per fragment with its strip id."""
    ax, ay, bx, by, sg, strip = [], [], [], [], [], []
    n = len(contour)
    for i in range(n):
        p = contour[i - 1]
        q = contour[i]
        if p == q:
            continue
        if p < q:
            a, b, w = p, q, 1
        else:
            a, b, w = q, p, -1
        if a[0] == b[0]:
            continue  # vertical edges never cover a px (half-open rule)
        # split [a.x, b.x) at strip borders
        s0 = a[0] // STRIP
        s1 = (b[0] - 1) // STRIP
        prev = a
        for s in range(s0, s1 + 1):
            border = (s + 1) * STRIP
            if border >= b[0]:
                cut = b
            else:
                # edges are axis-parallel or monotone; interpolate y
                t_num = border - a[0]
                t_den = b[0] - a[0]
                cut = (border, a[1] + (b[1] - a[1]) * t_num // t_den)
            ax.append(prev[0]); ay.append(prev[1])
            bx.append(cut[0]); by.append(cut[1])
            sg.append(w); strip.append(s)
            prev = cut
    return pa.table({
        "strip": pa.array(strip, pa.int64()),
        "eax": pa.array(ax, pa.int64()), "eay": pa.array(ay, pa.int64()),
        "ebx": pa.array(bx, pa.int64()), "eby": pa.array(by, pa.int64()),
        "sign": pa.array(sg, pa.int64()),
    })


def giant_pip_count(points: "ray.data.Dataset", contour: list) -> int:
    """Count points strictly inside the polygon (non-zero winding,
    half-open [ax, bx) coverage, edge-below test) via a single
    co-partitioned shuffle."""
    edges = fragment_edges(contour)
    edges_ds = ray.data.from_arrow(edges.append_column(
        "row_kind", pa.array([0] * len(edges), pa.int64())))

    def key_points(batch: pa.Table) -> pa.Table:
        px = batch.column("px").to_numpy(zero_copy_only=False)
        z = pa.array(np.zeros(len(batch), np.int64), pa.int64())
        return pa.table({
            "strip": pa.array(px // STRIP, pa.int64()),
            "eax": batch.column("px"), "eay": batch.column("py"),
            "ebx": z, "eby": z,
            "sign": z,
            "row_kind": pa.array(np.ones(len(batch), np.int64), pa.int64()),
        })

    both = edges_ds.union(points.map_batches(key_points,
                                             batch_format="pyarrow"))

    def strip_winding(group: pa.Table) -> pa.Table:
        kind = group.column("row_kind").to_numpy(zero_copy_only=False)
        e = group.filter(pa.compute.equal(group.column("row_kind"), 0))
        p = group.filter(pa.compute.equal(group.column("row_kind"), 1))
        if len(p) == 0 or len(e) == 0:
            return pa.table({"inside": pa.array([0], pa.int64())})
        eax = e.column("eax").to_numpy(zero_copy_only=False)
        eay = e.column("eay").to_numpy(zero_copy_only=False)
        ebx = e.column("ebx").to_numpy(zero_copy_only=False)
        eby = e.column("eby").to_numpy(zero_copy_only=False)
        sg = e.column("sign").to_numpy(zero_copy_only=False)
        px = p.column("eax").to_numpy(zero_copy_only=False)
        py = p.column("eay").to_numpy(zero_copy_only=False)
        wn = np.zeros(len(px), np.int64)
        block = 4096
        for q0 in range(0, len(px), block):
            q1 = min(len(px), q0 + block)
            qx = px[q0:q1, None]
            qy = py[q0:q1, None]
            cover = (eax[None, :] <= qx) & (qx < ebx[None, :])
            below = (ebx[None, :] - eax[None, :]) * (qy - eay[None, :]) - \
                    (eby[None, :] - eay[None, :]) * (qx - eax[None, :]) > 0
            wn[q0:q1] = (cover & below) @ sg
        return pa.table({"inside": pa.array([int((wn != 0).sum())],
                                            pa.int64())})

    parts = both.groupby("strip").map_groups(strip_winding,
                                             batch_format="pyarrow")
    return int(parts.to_pandas()["inside"].sum())


def q_giant_pip(sf_dir: str, n_teeth: int = 2000) -> pd.DataFrame:
    """Event-derived points vs the 2000-tooth comb (8000+ edges);
    fragmented-edge co-partitioned winding count, SQL-checked."""
    import os
    contour = comb_contour(n_teeth)
    w = TOOTH_PITCH * n_teeth

    def to_points(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch.column("event_id").to_pylist(), np.int64)
        return pa.table({
            "px": pa.array((eid * 131) % w, pa.int64()),
            "py": pa.array((eid * 17) % 12, pa.int64()),
        })

    nb = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    pts = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id"],
                                override_num_blocks=nb) \
        .map_batches(to_points, batch_format="pyarrow")
    inside = giant_pip_count(pts, contour)
    return pd.DataFrame({"n_inside": np.array([inside], np.int64)})
