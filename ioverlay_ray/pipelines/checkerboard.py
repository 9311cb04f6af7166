"""The reference's headline checkerboard-XOR workload, distributed.

Reference (performance/rust_app/src/test/test_0_checkerboard.rs:100-144):
subject = n x n squares of side 20 spaced 30 from (0,0); clip =
(n-1) x (n-1) squares from (15,15); XOR under NonZero; result =
n^2 + (n-1)^2 polygons. Published: 2.610 s for n=1024 (2,095,105
polygons, ~0.80 M polygons/s, single machine, rayon MT).

Distributed decomposition (exact for this geometry): squares within one
family are pairwise disjoint, so every XOR output polygon is one input
square minus its (<= 4) corner overlaps with the other family:

    XOR = U_s (s \\ clips_touching(s))  U  U_c (c \\ subjects_touching(c))

The partner set comes from grid arithmetic (no shuffle at all — the
join is implicit in the index math), one difference overlay per row in
``map_batches``. Result pieces have disjoint interiors, so counting and
area-summing per row is the whole reduction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geometry.overlay import overlay_pack_stats_flat

SIDE = 20
PITCH = 30
OFFSET = 15


def _square(x0: int, y0: int) -> list:
    return [(x0, y0), (x0 + SIDE, y0), (x0 + SIDE, y0 + SIDE),
            (x0, y0 + SIDE)]


class XorSquareStage:
    """(family, i, j) rows -> per-square XOR piece counts + area2.

    Fully flat-columnar: contours are built as numpy coordinate
    arrays (no Python point lists) and run through the packed stats
    kernel (overlay_pack_stats_flat)."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        fam = batch.column("family").to_numpy(zero_copy_only=False)
        ii = batch.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        jj = batch.column("j").to_numpy(zero_copy_only=False).astype(np.int64)
        n = self.n
        rows = len(fam)
        f1 = fam != 0
        base = np.where(f1, OFFSET, 0)
        sx0 = base + PITCH * ii
        sy0 = base + PITCH * jj
        pbase = np.where(f1, 0, OFFSET)
        plim = np.where(f1, n, n - 1)
        di = np.where(f1, 0, -1)
        # contour records: (job, is_subj, x0, y0)
        job_parts = [np.arange(rows, dtype=np.int64)]
        subj_parts = [np.ones(rows, dtype=bool)]
        x0_parts = [sx0]
        y0_parts = [sy0]
        for a in (0, 1):
            for b in (0, 1):
                pi = ii + di + a
                pj = jj + di + b
                ok = (pi >= 0) & (pi < plim) & (pj >= 0) & (pj < plim)
                r = np.flatnonzero(ok)
                if len(r):
                    job_parts.append(r)
                    subj_parts.append(np.zeros(len(r), dtype=bool))
                    x0_parts.append(pbase[r] + PITCH * pi[r])
                    y0_parts.append(pbase[r] + PITCH * pj[r])
        job = np.concatenate(job_parts)
        is_subj = np.concatenate(subj_parts)
        x0 = np.concatenate(x0_parts)
        y0 = np.concatenate(y0_parts)
        o = np.argsort(job, kind="stable")
        job = job[o]
        is_subj = is_subj[o]
        x0 = x0[o]
        y0 = y0[o]
        nc = len(job)
        # square vertices in _square order
        xs = np.empty((nc, 4), dtype=np.int64)
        ys = np.empty((nc, 4), dtype=np.int64)
        xs[:, 0] = x0
        xs[:, 1] = x0 + SIDE
        xs[:, 2] = x0 + SIDE
        xs[:, 3] = x0
        ys[:, 0] = y0
        ys[:, 1] = y0
        ys[:, 2] = y0 + SIDE
        ys[:, 3] = y0 + SIDE
        offsets = np.arange(nc + 1, dtype=np.int64) * 4
        n_polys, area2 = overlay_pack_stats_flat(
            xs.reshape(-1), ys.reshape(-1), offsets, job, is_subj,
            "difference", "nonzero", n_jobs=rows)
        return pa.table({
            "n_polys": pa.array(n_polys, pa.int64()),
            "area2": pa.array(area2, pa.int64()),
        })


def checkerboard_xor(n: int, batch_size: int = 1024) -> dict:
    """Run the distributed checkerboard XOR; returns polygon count,
    total area2 and throughput."""
    import time
    gi, gj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    hi, hj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    t = pa.table({
        "family": pa.array(np.concatenate([np.zeros(n * n, np.int64),
                                           np.ones((n - 1) ** 2, np.int64)])),
        "i": pa.array(np.concatenate([gi.ravel(), hi.ravel()]).astype(np.int64)),
        "j": pa.array(np.concatenate([gj.ravel(), hj.ravel()]).astype(np.int64)),
    })
    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = ray.data.from_arrow(t).repartition(cpus * 2)
    # the stage's only state is ``n`` — a task pool beats an actor pool
    # here (no per-actor startup; tasks autoscale with the cluster)
    stage = XorSquareStage(n)
    t0 = time.time()
    out = ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                         batch_size=batch_size).to_pandas()
    dt = time.time() - t0
    total = int(out["n_polys"].sum())
    return {
        "n": n,
        "polygons": total,
        "area2": int(out["area2"].sum()),
        "sec": round(dt, 3),
        "polygons_per_sec": int(total / dt),
    }
