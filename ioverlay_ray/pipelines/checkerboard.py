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

from ..geometry.overlay import overlay_pack
from ..stages.geo_arrow import shapes_area2

SIDE = 20
PITCH = 30
OFFSET = 15


def _square(x0: int, y0: int) -> list:
    return [(x0, y0), (x0 + SIDE, y0), (x0 + SIDE, y0 + SIDE),
            (x0, y0 + SIDE)]


class XorSquareStage:
    """(family, i, j) rows -> per-square XOR piece counts + area2."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        fam = batch.column("family").to_numpy(zero_copy_only=False)
        ii = batch.column("i").to_numpy(zero_copy_only=False)
        jj = batch.column("j").to_numpy(zero_copy_only=False)
        n = self.n
        jobs = []
        for r in range(len(fam)):
            i = int(ii[r]); j = int(jj[r])
            if fam[r] == 0:
                subj = [_square(PITCH * i, PITCH * j)]
                partners = [
                    _square(OFFSET + PITCH * pi, OFFSET + PITCH * pj)
                    for pi in (i - 1, i) for pj in (j - 1, j)
                    if 0 <= pi < n - 1 and 0 <= pj < n - 1]
            else:
                subj = [_square(OFFSET + PITCH * i, OFFSET + PITCH * j)]
                partners = [
                    _square(PITCH * pi, PITCH * pj)
                    for pi in (i, i + 1) for pj in (j, j + 1)
                    if 0 <= pi < n and 0 <= pj < n]
            jobs.append((subj, partners))
        packed = overlay_pack(jobs, "difference", "nonzero")
        n_polys = np.array([len(p) for p in packed], np.int64)
        area2 = np.array([shapes_area2(p) for p in packed], np.int64)
        return pa.table({
            "n_polys": pa.array(n_polys, pa.int64()),
            "area2": pa.array(area2, pa.int64()),
        })


def checkerboard_xor(n: int, batch_size: int = 512) -> dict:
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
