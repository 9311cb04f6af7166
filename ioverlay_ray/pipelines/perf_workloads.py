"""Reference perf workloads: LinesNet and Spiral.

Generators mirror the reference's published benchmark geometry
(performance/rust_app/src/test/util.rs:143-226) so BENCH numbers are
comparable row-for-row with BASELINE.md:

- LinesNet (test_2_lines_net.rs): n vertical x n horizontal strips of
  width a/2 on pitch a=20, INTERSECT under NonZero -> n^2 disjoint
  squares.  Label in the reference's table is 2n (input polygon count).
- Spiral (test_3_spiral.rs): one zigzag spiral band with 2*count legs
  (4*count points), subject-only overlay (rule=Subject, NonZero); the
  zigzag self-intersections pinch off ~count output polygons.  Label
  is count.

Distributed form: LinesNet runs through the bit-exact tile pipeline
(`pipelines/tiled_overlay.py`); Spiral through a fan-out of independent
angular sectors overlapped by one ring (each pocket is local to a
sector; sector results are deduplicated by pocket anchor, which is
exact because every output pocket lies strictly inside some sector's
owned angular range).
"""

from __future__ import annotations

import math
import time
from typing import List, Tuple

import numpy as np


def many_lines_x(a: int, n: int) -> List[list]:
    """Vertical strips (util.rs:143-160)."""
    w = a // 2
    s = a * n // 2
    x = -s + w // 2
    out = []
    for _ in range(n):
        out.append([(x, -s), (x, s), (x + w, s), (x + w, -s)])
        x += a
    return out


def many_lines_y(a: int, n: int) -> List[list]:
    """Horizontal strips (util.rs:162-179)."""
    h = a // 2
    s = a * n // 2
    y = -s + h // 2
    out = []
    for _ in range(n):
        out.append([(-s, y), (s, y), (s, y - h), (-s, y - h)])
        y += a
    return out


def spiral(count: int, radius: float = 100.0) -> List[Tuple[float, float]]:
    """Zigzag spiral band contour (util.rs:181-226), float points."""
    a = 0.0
    r = radius
    w = 0.1 * radius
    p0 = (0.0, 0.0)
    a_path: List[Tuple[float, float]] = []
    b_path: List[Tuple[float, float]] = []
    for i in range(count):
        sy = math.sin(a)
        sx = math.cos(a)
        rr = r + 0.2 * radius if i % 2 == 0 else r - 0.2 * radius
        p = (rr * sx, rr * sy)
        dx = p[0] - p0[0]
        dy = p[1] - p0[1]
        ln = math.hypot(dx, dy) or 1.0
        nx = dx / ln
        ny = dy / ln
        tx = -w * ny
        ty = w * nx
        a_path.append((p0[0] + tx, p0[1] + ty))
        a_path.append((p[0] + tx, p[1] + ty))
        b_path.append((p0[0] - tx, p0[1] - ty))
        b_path.append((p[0] - tx, p[1] - ty))
        a += radius / r
        r = radius * (1.0 + a / (2.0 * math.pi))
        p0 = p
    b_path.reverse()
    return a_path + b_path


def lines_net_single(n: int) -> dict:
    """Single-kernel LinesNet intersect (correctness anchor / 1-core)."""
    from ..geometry.overlay import overlay
    subj = many_lines_x(20, n)
    clip = many_lines_y(20, n)
    t0 = time.perf_counter()
    shapes = overlay(subj, clip, "intersect")
    sec = time.perf_counter() - t0
    return {"sec": sec, "polygons": len(shapes),
            "polygons_per_sec": int(len(shapes) / sec)}


def spiral_single(count: int) -> dict:
    """Single-kernel Spiral subject-only overlay (float API).

    ``out_arrays=True``: contours come back as float64 (n, 2) arrays —
    the columnar equivalent of the reference's Vec<P> output — instead
    of per-point Python tuples (which cost ~1 s alone at n=524k)."""
    from ..geometry.float_api import float_overlay
    path = np.asarray(spiral(count))
    t0 = time.perf_counter()
    shapes = float_overlay([path], [], "subject", "nonzero",
                           out_arrays=True)
    sec = time.perf_counter() - t0
    return {"sec": sec, "polygons": len(shapes),
            "polygons_per_sec": int(len(shapes) / sec)}


# ---------------------------------------------------------------------------
# Distributed LinesNet (the checkerboard decomposition pattern applied
# to the reference's densest workload)
# ---------------------------------------------------------------------------

class LinesNetStage:
    """Rows of vertical-strip indices -> per-strip INTERSECT piece
    counts + area2 through the packed flat kernel.

    Decomposition (exact): the vertical strips are pairwise disjoint,
    so INTERSECT(U Vi, U Hj) = disjoint-U_i INTERSECT(Vi, U Hj); each
    job is one vertical strip against the WHOLE horizontal family (the
    clip family is identical across jobs and rebuilt from index math —
    no shuffle, no broadcast payload). Mirrors the checkerboard
    pipeline's index-math join (test_2_lines_net.rs geometry)."""

    def __init__(self, n: int, block: int = 16, a: int = 20):
        self.n = n
        self.block = block
        self.a = a

    def __call__(self, batch):
        import pyarrow as pa
        from ..geometry.overlay import overlay_pack_stats_flat
        bb = batch.column("b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rows = len(bb)
        n = self.n
        K = self.block
        a = self.a
        w = a // 2
        s = a * n // 2
        y_top = -s + a // 4 + a * np.arange(n, dtype=np.int64)
        y_bot = y_top - w
        nc = K + n                       # contours per job
        xs = np.empty((rows, nc, 4), dtype=np.int64)
        ys = np.empty((rows, nc, 4), dtype=np.int64)
        # K subject quads (many_lines_x vertex order) per block
        kk = np.arange(K, dtype=np.int64)
        x0 = -s + w // 2 + a * (bb[:, None] * K + kk[None, :])
        xs[:, :K, 0] = x0
        xs[:, :K, 1] = x0
        xs[:, :K, 2] = x0 + w
        xs[:, :K, 3] = x0 + w
        ys[:, :K, 0] = -s
        ys[:, :K, 1] = s
        ys[:, :K, 2] = s
        ys[:, :K, 3] = -s
        # clip quads (many_lines_y vertex order), same for every job
        xs[:, K:, 0] = -s
        xs[:, K:, 1] = s
        xs[:, K:, 2] = s
        xs[:, K:, 3] = -s
        ys[:, K:, 0] = y_top[None, :]
        ys[:, K:, 1] = y_top[None, :]
        ys[:, K:, 2] = y_bot[None, :]
        ys[:, K:, 3] = y_bot[None, :]
        job = np.repeat(np.arange(rows, dtype=np.int64), nc)
        subj = np.tile(np.concatenate((np.ones(K, dtype=bool),
                                       np.zeros(n, dtype=bool))), rows)
        offsets = np.arange(rows * nc + 1, dtype=np.int64) * 4
        n_polys, area2 = overlay_pack_stats_flat(
            xs.reshape(-1), ys.reshape(-1), offsets, job, subj,
            "intersect", "nonzero", n_jobs=rows)
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def lines_net_grid(n: int, batch_size: int = 1, block: int = 16) -> dict:
    """Distributed LinesNet intersect over Ray Data; asserts the
    closed form (n^2 squares; the bottom row's are half-height)."""
    import pyarrow as pa
    import ray
    import ray.data

    block = min(block, n)
    nb = n // block
    assert nb * block == n, (n, block)
    t = pa.table({"b": pa.array(np.arange(nb, dtype=np.int64))})
    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = ray.data.from_arrow(t).repartition(min(nb, cpus * 2))
    stage = LinesNetStage(n, block)
    t0 = time.perf_counter()
    out = ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                         batch_size=batch_size).to_pandas()
    sec = time.perf_counter() - t0
    polys = int(out["n_polys"].sum())
    area2 = int(out["area2"].sum())
    assert polys == n * n, (polys, n)
    assert area2 == 200 * n * n - 100 * n, (area2, n)
    return {"sec": sec, "label": 2 * n, "polygons": polys,
            "polygons_per_sec": int(polys / sec)}
