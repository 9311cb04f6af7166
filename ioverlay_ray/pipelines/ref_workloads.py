"""The reference's remaining six perf workloads, distributed.

Reference (performance/rust_app/src/test/):

- test_1_not_overlap.rs — grid of NON-overlapping squares, Union.
  polygons = n^2 + (n-1)^2.  i64 MT log: 2,095,105 -> 0.920 s (n=1024).
- test_4_windows.rs — grid of square frames (outer minus centered
  cutout), Difference.  i64 MT: 2,097,152 -> 1.176 s (n=1024).
- test_5_nested_squares.rs — n concentric square frames built from 2n
  vertical + 2n horizontal strips, Union.  Stresses deep nesting +
  hole binding.  i64 MT: 131,072 -> 3.823 s (n=65536).
- test_6_corrosion.rs — float 3..7-gons minus a denser grid of small
  3..7-gons, Difference (stresses rounding/snap).  i64 MT: n=512 ->
  3.102 s.
- test_7_concentric.rs — n polygonal rings with small polygons strung
  on each ring's circumference, Difference.  i64 MT: n=512 -> 3.116 s.
- test_8_wind_mill.rs — per-cell windmills (4 triangles minus 4
  squares), Difference.  i64 MT: n=512 -> 1.509 s.

Each workload decomposes exactly: every output polygon is local to one
job's geometry (disjoint grids / disjoint concentric bands / clip
shapes index-assignable to their unique subject window), so the
distributed form is job-id tables -> ``map_batches`` -> the packed flat
kernel (``overlay_pack_stats_flat``) -> a count/area reduction, with NO
shuffle: the join between families is implicit in the index math, like
the checkerboard/LinesNet pipelines.  The float workloads (corrosion,
concentric) quantize on ONE global lattice (driver-computed analytic
bounds) so the distributed run is bit-identical to a single-kernel run
of the whole scene on the same lattice (pinned by tests).
"""

from __future__ import annotations

import math
import time

import numpy as np
import pyarrow as pa

from ..geometry.overlay import overlay_pack_stats_flat

TWO_PI = 2.0 * math.pi


def _run(table: pa.Table, stage, batch_size: int) -> tuple:
    import ray
    import ray.data
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nrows = table.num_rows
    ds = ray.data.from_arrow(table).repartition(
        min(max(1, nrows), cpus * 2))
    t0 = time.perf_counter()
    out = ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                         batch_size=batch_size).to_pandas()
    sec = time.perf_counter() - t0
    return int(out["n_polys"].sum()), int(out["area2"].sum()), sec


def _ids_table(n_jobs: int) -> pa.Table:
    return pa.table({"job": pa.array(np.arange(n_jobs, dtype=np.int64))})


def _quads(x0, y0, x1, y1, order: str) -> tuple:
    """(nc, 4) vertex arrays for axis-aligned quads.

    order='xyyx': (x0,y0),(x0,y1),(x1,y1),(x1,y0)  — many_squares
    order='yxxy': (x0,y0),(x1,y0),(x1,y1),(x0,y1)
    """
    nc = len(x0)
    xs = np.empty((nc, 4), dtype=np.int64)
    ys = np.empty((nc, 4), dtype=np.int64)
    if order == "xyyx":
        xs[:, 0] = x0; xs[:, 1] = x0; xs[:, 2] = x1; xs[:, 3] = x1
        ys[:, 0] = y0; ys[:, 1] = y1; ys[:, 2] = y1; ys[:, 3] = y0
    else:
        xs[:, 0] = x0; xs[:, 1] = x1; xs[:, 2] = x1; xs[:, 3] = x0
        ys[:, 0] = y0; ys[:, 1] = y0; ys[:, 2] = y1; ys[:, 3] = y1
    return xs, ys


# ---------------------------------------------------------------------------
# test_1: not-overlapping squares (Union)
# ---------------------------------------------------------------------------

class NotOverlapStage:
    """Job = BLOCK consecutive squares from the combined family list
    (subject n^2 at (30i,30j), clip (n-1)^2 at (15+30i,15+30j), side
    10; test_1_not_overlap.rs:106-124 geometry). Squares never touch,
    so Union leaves each unchanged: n_polys = squares, area2 = 200 each."""

    BLOCK = 4096

    def __init__(self, n: int, block: int | None = None):
        self.n = n
        self.block = int(block) if block else self.BLOCK

    def __call__(self, batch: pa.Table) -> pa.Table:
        jobs = np.asarray(batch.column("job"), dtype=np.int64)
        n = self.n
        total = n * n + (n - 1) * (n - 1)
        B = self.block
        parts_q = []
        parts_job = []
        for row, j in enumerate(jobs):
            q0 = int(j) * B
            q1 = min(total, q0 + B)
            parts_q.append(np.arange(q0, q1, dtype=np.int64))
            parts_job.append(np.full(q1 - q0, row, dtype=np.int64))
        q = np.concatenate(parts_q)
        job = np.concatenate(parts_job)
        subj = q < n * n
        m = n - 1
        gi = np.where(subj, q % n, (q - n * n) % m)
        gj = np.where(subj, q // n, (q - n * n) // m)
        base = np.where(subj, 0, 15)
        x0 = base + 30 * gi
        y0 = base + 30 * gj
        xs, ys = _quads(x0, y0, x0 + 10, y0 + 10, "xyyx")
        offsets = np.arange(len(q) + 1, dtype=np.int64) * 4
        n_polys, area2 = overlay_pack_stats_flat(
            xs.reshape(-1), ys.reshape(-1), offsets, job, subj,
            "union", "nonzero", n_jobs=len(jobs))
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def not_overlap(n: int, batch_size: int = 1,
                block: int | None = None) -> dict:
    total = n * n + (n - 1) * (n - 1)
    stage = NotOverlapStage(n, block)
    n_jobs = (total + stage.block - 1) // stage.block
    polys, area2, sec = _run(_ids_table(n_jobs), stage, batch_size)
    assert polys == total, (polys, total)
    assert area2 == 200 * total, area2
    return {"sec": sec, "label": total, "polygons": polys,
            "polygons_per_sec": int(polys / sec)}


# ---------------------------------------------------------------------------
# test_4: windows (Difference)
# ---------------------------------------------------------------------------

class WindowsStage:
    """Job = BLOCK grid cells; each cell = outer 20-square minus the
    centered 10-square (test_4_windows.rs:96-107, util.rs many_windows).
    Result per cell: one frame (hull + hole), net area2 = 600."""

    BLOCK = 2048

    def __init__(self, n: int, block: int | None = None):
        self.n = n
        self.block = int(block) if block else self.BLOCK

    def __call__(self, batch: pa.Table) -> pa.Table:
        jobs = np.asarray(batch.column("job"), dtype=np.int64)
        n = self.n
        total = n * n
        B = self.block
        parts_c = []
        parts_job = []
        for row, j in enumerate(jobs):
            c0 = int(j) * B
            c1 = min(total, c0 + B)
            parts_c.append(np.arange(c0, c1, dtype=np.int64))
            parts_job.append(np.full(c1 - c0, row, dtype=np.int64))
        c = np.concatenate(parts_c)
        jobc = np.concatenate(parts_job)
        origin = -(n * 30) // 2
        x = origin + 30 * (c % n)
        y = origin + 30 * (c // n)
        xo, yo = _quads(x, y, x + 20, y + 20, "xyyx")
        xi, yi = _quads(x + 5, y + 5, x + 15, y + 15, "xyyx")
        nc = len(c)
        xs = np.concatenate((xo, xi)).reshape(-1)
        ys = np.concatenate((yo, yi)).reshape(-1)
        job = np.concatenate((jobc, jobc))
        subj = np.concatenate((np.ones(nc, bool), np.zeros(nc, bool)))
        order = np.argsort(job, kind="stable")
        # rebuild flat arrays in job order (contours are 4-point quads)
        vid = (order[:, None] * 4 + np.arange(4)[None, :]).reshape(-1)
        xs = xs[vid]
        ys = ys[vid]
        job = job[order]
        subj = subj[order]
        offsets = np.arange(2 * nc + 1, dtype=np.int64) * 4
        n_polys, area2 = overlay_pack_stats_flat(
            xs, ys, offsets, job, subj, "difference", "nonzero",
            n_jobs=len(jobs))
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def windows(n: int, batch_size: int = 1,
            block: int | None = None) -> dict:
    total = n * n
    stage = WindowsStage(n, block)
    n_jobs = (total + stage.block - 1) // stage.block
    polys, area2, sec = _run(_ids_table(n_jobs), stage, batch_size)
    assert polys == total, (polys, total)
    assert area2 == 600 * total, area2
    return {"sec": sec, "label": 2 * total, "polygons": polys,
            "polygons_per_sec": int(2 * total / sec)}


# ---------------------------------------------------------------------------
# test_5: nested squares (Union) — deep nesting / hole binding
# ---------------------------------------------------------------------------

class NestedSquaresStage:
    """Job = BLOCK consecutive rings; ring i = 2 vertical strips
    (subject) + 2 horizontal strips (clip), r = 4(i+1), thickness 2
    (util.rs concentric_squares with a=2).  Union per ring = one frame:
    1 hull + 1 hole, area2 = 2*(8r*2 - 16) = 32r - 32."""

    BLOCK = 64

    def __init__(self, n: int, block: int | None = None):
        self.n = n
        self.block = int(block) if block else self.BLOCK

    def __call__(self, batch: pa.Table) -> pa.Table:
        jobs = np.asarray(batch.column("job"), dtype=np.int64)
        n = self.n
        B = self.block
        parts_i = []
        parts_job = []
        for row, j in enumerate(jobs):
            i0 = int(j) * B
            i1 = min(n, i0 + B)
            parts_i.append(np.arange(i0, i1, dtype=np.int64))
            parts_job.append(np.full(i1 - i0, row, dtype=np.int64))
        ring = np.concatenate(parts_i)
        jobr = np.concatenate(parts_job)
        r = 4 * (ring + 1)
        a = 2
        # vert left/right (subject), horz top/bottom (clip) —
        # concentric_squares vertex orders (util.rs:98-141)
        nrr = len(ring)
        vx_l = np.empty((nrr, 4), np.int64); vy_l = np.empty_like(vx_l)
        vx_l[:, 0] = -r; vy_l[:, 0] = -r
        vx_l[:, 1] = -r; vy_l[:, 1] = r
        vx_l[:, 2] = -r + a; vy_l[:, 2] = r
        vx_l[:, 3] = -r + a; vy_l[:, 3] = -r
        vx_r = np.empty_like(vx_l); vy_r = np.empty_like(vy_l)
        vx_r[:, 0] = r - a; vy_r[:, 0] = -r
        vx_r[:, 1] = r - a; vy_r[:, 1] = r
        vx_r[:, 2] = r; vy_r[:, 2] = r
        vx_r[:, 3] = r; vy_r[:, 3] = -r
        hx_t = np.empty_like(vx_l); hy_t = np.empty_like(vy_l)
        hx_t[:, 0] = -r; hy_t[:, 0] = r - a
        hx_t[:, 1] = -r; hy_t[:, 1] = r
        hx_t[:, 2] = r; hy_t[:, 2] = r
        hx_t[:, 3] = r; hy_t[:, 3] = r - a
        hx_b = np.empty_like(vx_l); hy_b = np.empty_like(vy_l)
        hx_b[:, 0] = -r; hy_b[:, 0] = -r
        hx_b[:, 1] = -r; hy_b[:, 1] = -r + a
        hx_b[:, 2] = r; hy_b[:, 2] = -r + a
        hx_b[:, 3] = r; hy_b[:, 3] = -r
        nr = len(ring)
        xs = np.stack((vx_l, vx_r, hx_t, hx_b), axis=1).reshape(-1)
        ys = np.stack((vy_l, vy_r, hy_t, hy_b), axis=1).reshape(-1)
        job = np.repeat(jobr, 4)
        subj = np.tile(np.array([True, True, False, False]), nr)
        offsets = np.arange(4 * nr + 1, dtype=np.int64) * 4
        n_polys, area2 = overlay_pack_stats_flat(
            xs, ys, offsets, job, subj, "union", "nonzero",
            n_jobs=len(jobs))
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def nested_squares(n: int, batch_size: int = 1,
                   block: int | None = None) -> dict:
    stage = NestedSquaresStage(n, block)
    n_jobs = (n + stage.block - 1) // stage.block
    polys, area2, sec = _run(_ids_table(n_jobs), stage, batch_size)
    assert polys == n, (polys, n)            # one hull per ring
    assert area2 == 64 * n * n + 32 * n, area2
    return {"sec": sec, "label": 2 * n, "polygons": polys,
            "polygons_per_sec": int(2 * n / sec)}


def nested_squares_single(n: int) -> dict:
    """Whole-scene single-kernel form — exercises the extract walk +
    join_holes with n concentric frames (deep hole binding)."""
    from ..geometry.overlay import overlay
    subj, clip = [], []
    a = 2
    for i in range(n):
        r = 4 * (i + 1)
        subj.append([(-r, -r), (-r, r), (-r + a, r), (-r + a, -r)])
        subj.append([(r - a, -r), (r - a, r), (r, r), (r, -r)])
        clip.append([(-r, r - a), (-r, r), (r, r), (r, r - a)])
        clip.append([(-r, -r), (-r, -r + a), (r, -r + a), (r, -r)])
    t0 = time.perf_counter()
    shapes = overlay(subj, clip, "union", "nonzero")
    sec = time.perf_counter() - t0
    return {"sec": sec, "shapes": len(shapes),
            "contours": sum(len(s) for s in shapes)}


# ---------------------------------------------------------------------------
# test_8: windmill (Difference)
# ---------------------------------------------------------------------------

class WindMillStage:
    """Job = BLOCK grid cells; per cell 4 triangles (subject) minus 4
    squares (clip), a = 10, pitch 80 (test_8_wind_mill.rs:132-213).
    Result: one connected windmill polygon per cell."""

    BLOCK = 1024

    def __init__(self, n: int, block: int | None = None):
        self.n = n
        self.block = int(block) if block else self.BLOCK

    def __call__(self, batch: pa.Table) -> pa.Table:
        jobs = np.asarray(batch.column("job"), dtype=np.int64)
        n = self.n
        total = n * n
        B = self.block
        parts_c = []
        parts_job = []
        for row, j in enumerate(jobs):
            c0 = int(j) * B
            c1 = min(total, c0 + B)
            parts_c.append(np.arange(c0, c1, dtype=np.int64))
            parts_job.append(np.full(c1 - c0, row, dtype=np.int64))
        c = np.concatenate(parts_c)
        jobc = np.concatenate(parts_job)
        a = 10
        cx = 40 + 80 * (c // n)
        cy = 40 + 80 * (c % n)
        nc = len(c)
        # 4 clip squares then 4 subject triangles, relative template
        # (test_8_wind_mill.rs:162-210); padded to 4 vertices with a
        # repeat of the last vertex for triangles is NOT allowed by the
        # kernel (degenerate edges are dropped at build, which is fine)
        sq = np.array([
            [(-3, 1), (-3, 3), (-1, 3), (-1, 1)],
            [(1, 2), (1, 4), (3, 4), (3, 2)],
            [(-2, -3), (-2, -1), (0, -1), (0, -3)],
            [(2, -2), (2, 0), (4, 0), (4, -2)],
        ], dtype=np.int64) * a
        tr = np.array([
            [(0, 0), (-3, 0), (0, 3)],
            [(0, 1), (0, 4), (3, 1)],
            [(1, 0), (1, -3), (-2, 0)],
            [(1, 1), (4, 1), (1, -2)],
        ], dtype=np.int64) * a
        xs_parts = []
        ys_parts = []
        lens = []
        subj_flags = []
        for t in range(4):
            xs_parts.append(cx[:, None] + tr[t, :, 0][None, :])
            ys_parts.append(cy[:, None] + tr[t, :, 1][None, :])
            lens.append(3)
            subj_flags.append(True)
        for s in range(4):
            xs_parts.append(cx[:, None] + sq[s, :, 0][None, :])
            ys_parts.append(cy[:, None] + sq[s, :, 1][None, :])
            lens.append(4)
            subj_flags.append(False)
        # interleave per cell: contours grouped by cell (job-ascending)
        total_v = nc * (4 * 3 + 4 * 4)
        xs = np.empty(total_v, dtype=np.int64)
        ys = np.empty(total_v, dtype=np.int64)
        offsets = np.empty(8 * nc + 1, dtype=np.int64)
        offsets[0] = 0
        per_cell = np.array(lens, dtype=np.int64)
        offs_cell = np.concatenate(([0], np.cumsum(per_cell)))
        cell_v = int(offs_cell[-1])
        for k in range(8):
            block = xs_parts[k]
            lo = offs_cell[k]
            hi = offs_cell[k + 1]
            idx = (np.arange(nc)[:, None] * cell_v
                   + np.arange(lo, hi)[None, :])
            xs[idx.reshape(-1)] = block.reshape(-1)
            ys[idx.reshape(-1)] = ys_parts[k].reshape(-1)
        offsets[1:] = (np.tile(offs_cell[1:], nc)
                       + np.repeat(np.arange(nc, dtype=np.int64) * cell_v,
                                   8))
        job = np.repeat(jobc, 8)
        subj = np.tile(np.array(subj_flags, dtype=bool), nc)
        n_polys, area2 = overlay_pack_stats_flat(
            xs, ys, offsets, job, subj, "difference", "nonzero",
            n_jobs=len(jobs))
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def wind_mill(n: int, batch_size: int = 1,
              block: int | None = None) -> dict:
    total = n * n
    stage = WindMillStage(n, block)
    n_jobs = (total + stage.block - 1) // stage.block
    polys, area2, sec = _run(_ids_table(n_jobs), stage, batch_size)
    assert polys == total, (polys, total)    # one windmill per cell
    return {"sec": sec, "label": n, "polygons": polys,
            "polygons_per_sec": int(polys / sec), "area2": area2}


# ---------------------------------------------------------------------------
# Float workloads: corrosion (test_6) and concentric (test_7)
# ---------------------------------------------------------------------------

def _ngon_flat(cx, cy, radius, counts, base_angle, direction):
    """Flat (xs, ys, offsets) float vertices for per-contour regular
    n-gons: counts[i] vertices starting at base_angle[i], step
    direction[i] * 2*pi / counts[i] (test_6/test_7 ``shape``)."""
    counts = np.asarray(counts, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    total = int(offs[-1])
    rep = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    k = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)
    da = np.asarray(direction, np.float64) * (TWO_PI / counts)
    ang = np.asarray(base_angle, np.float64)[rep] + k * da[rep]
    xs = np.cos(ang) * np.asarray(radius, np.float64)[rep] \
        + np.asarray(cx, np.float64)[rep]
    ys = np.sin(ang) * np.asarray(radius, np.float64)[rep] \
        + np.asarray(cy, np.float64)[rep]
    return xs, ys, offs


def corrosion_adapter(n: int):
    """Global quantization lattice for the corrosion scene: analytic
    bounds over subject (radius 40, step 100) and clip (radius 16,
    step 40, offset -40, count round(2.5n)) families."""
    from ..geometry.float_api import FloatPointAdapter
    nc = int(round(2.5 * n))
    lo = min(-40.0, -40.0 - 16.0)
    hi = max(100.0 * (n - 1) + 40.0, -40.0 + 40.0 * (nc - 1) + 16.0)
    return FloatPointAdapter(lo, lo, hi, hi)


def _corrosion_clip_range(coord, nc):
    """Clip grid indices whose shapes can reach the subject at
    ``coord`` (centers 40*l - 40, radius 16 vs subject radius 40:
    interaction iff center distance <= 56; +2 units rounding margin)."""
    lo = np.ceil((coord - 58.0 + 40.0) / 40.0).astype(np.int64)
    hi = np.floor((coord + 58.0 + 40.0) / 40.0).astype(np.int64)
    return np.clip(lo, 0, nc - 1), np.clip(hi, -1, nc - 1)


class CorrosionStage:
    """Job = BLOCK subject cells.  Subject (i-row, c-col): center
    (100c, 100i), radius 40, (i+c)%5+3 vertices.  Clips within
    interaction range come from index math (no shuffle, no broadcast);
    each clip shape belongs to at most one subject cell (grid pitch
    40 < the 112-wide window never spans two subjects). Quantized on
    the shared global lattice => bit-identical to the whole-scene
    single kernel (test_6_corrosion.rs:121-168 geometry)."""

    BLOCK = 512

    def __init__(self, n: int, block: int | None = None):
        self.n = n
        self.block = int(block) if block else self.BLOCK
        self.nc = int(round(2.5 * n))
        self._adapter = None

    def _quantize(self, xs, ys):
        if self._adapter is None:
            self._adapter = corrosion_adapter(self.n)
        ad = self._adapter
        qx = np.rint((xs - ad.offset_x) * ad.scale).astype(np.int64)
        qy = np.rint((ys - ad.offset_y) * ad.scale).astype(np.int64)
        return qx, qy

    def __call__(self, batch: pa.Table) -> pa.Table:
        jobs = np.asarray(batch.column("job"), dtype=np.int64)
        n = self.n
        nc = self.nc
        total = n * n
        B = self.block
        cells = []
        jobc = []
        for row, j in enumerate(jobs):
            c0 = int(j) * B
            c1 = min(total, c0 + B)
            cells.append(np.arange(c0, c1, dtype=np.int64))
            jobc.append(np.full(c1 - c0, row, dtype=np.int64))
        cell = np.concatenate(cells)
        jobc = np.concatenate(jobc)
        si = cell // n                  # subject row (y)
        sc = cell % n                   # subject col (x)
        # subject contours
        s_cx = 100.0 * sc
        s_cy = 100.0 * si
        s_cnt = ((si + sc) % 5) + 3
        # clip windows per subject cell
        lx, hx = _corrosion_clip_range(100.0 * sc, nc)
        ly, hy = _corrosion_clip_range(100.0 * si, nc)
        wx = np.maximum(hx - lx + 1, 0)
        wy = np.maximum(hy - ly + 1, 0)
        cnt = wx * wy
        rep = np.repeat(np.arange(len(cell), dtype=np.int64), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        t = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(offs, cnt)
        cl = lx[rep] + t % np.maximum(wx[rep], 1)
        cm = ly[rep] + t // np.maximum(wx[rep], 1)
        c_cx = 40.0 * cl - 40.0
        c_cy = 40.0 * cm - 40.0
        c_cnt = ((cm + cl) % 5) + 3
        # pack: per cell, subject contour then its clips (job order holds)
        all_job = np.concatenate((jobc, jobc[rep]))
        all_subj = np.concatenate((np.ones(len(cell), bool),
                                   np.zeros(len(rep), bool)))
        all_cx = np.concatenate((s_cx, c_cx))
        all_cy = np.concatenate((s_cy, c_cy))
        all_r = np.concatenate((np.full(len(cell), 40.0),
                                np.full(len(rep), 16.0)))
        all_cnt = np.concatenate((s_cnt, c_cnt))
        order = np.argsort(all_job, kind="stable")
        xs, ys, offsets = _ngon_flat(
            all_cx[order], all_cy[order], all_r[order], all_cnt[order],
            np.zeros(len(order)), np.ones(len(order)))
        qx, qy = self._quantize(xs, ys)
        n_polys, area2 = overlay_pack_stats_flat(
            qx, qy, offsets, all_job[order], all_subj[order],
            "difference", "nonzero", n_jobs=len(jobs))
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def corrosion(n: int, batch_size: int = 1,
              block: int | None = None) -> dict:
    total = n * n
    stage = CorrosionStage(n, block)
    n_jobs = (total + stage.block - 1) // stage.block
    polys, area2, sec = _run(_ids_table(n_jobs), stage, batch_size)
    assert polys >= total, (polys, total)   # every subject survives
    return {"sec": sec, "label": n, "polygons": polys,
            "polygons_per_sec": int(polys / sec), "area2": area2}


def concentric_adapter(n: int):
    from ..geometry.float_api import FloatPointAdapter
    r_max = 100.0 + 200.0 * (n - 1) + 100.0
    return FloatPointAdapter(-r_max, -r_max, r_max, r_max)


def _concentric_ring(i: int):
    """(centers_x, centers_y, radii, counts, base_angles, dirs,
    is_subject) for ring i (test_7_concentric.rs:122-155)."""
    r = 100.0 + 200.0 * i
    angle = 0.05 * i
    k = i + 3
    cx = [0.0, 0.0]
    cy = [0.0, 0.0]
    rad = [r, r + 100.0]
    cnt = [k, k]
    base = [angle, angle]
    dirs = [-1.0, 1.0]
    subj = [True, True]
    nf = TWO_PI * r * (0.8 / 100.0)
    clip_count = int(nf)
    da = TWO_PI / nf
    jj = np.arange(clip_count, dtype=np.float64)
    a = angle + jj * da
    cx.extend(np.cos(a) * r)
    cy.extend(np.sin(a) * r)
    rad.extend([50.0] * clip_count)
    cnt.extend((np.arange(clip_count) % 5 + 3).tolist())
    base.extend([0.0] * clip_count)
    dirs.extend([1.0] * clip_count)
    subj.extend([False] * clip_count)
    return (np.array(cx), np.array(cy), np.array(rad),
            np.array(cnt, np.int64), np.array(base), np.array(dirs),
            np.array(subj, bool))


class ConcentricStage:
    """Job = one ring: the polygonal annulus (body + reversed outer
    contour, both subject) minus the small polygons strung on its
    circumference.  Rings are radially separated (spacing 200 vs
    max extent +100), so every output polygon is ring-local."""

    def __init__(self, n: int):
        self.n = n
        self._adapter = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._adapter is None:
            self._adapter = concentric_adapter(self.n)
        ad = self._adapter
        jobs = np.asarray(batch.column("job"), dtype=np.int64)
        parts = []
        for row, i in enumerate(jobs):
            cx, cy, rad, cnt, base, dirs, subj = _concentric_ring(int(i))
            parts.append((np.full(len(cx), row, np.int64),
                          cx, cy, rad, cnt, base, dirs, subj))
        job = np.concatenate([p[0] for p in parts])
        cx = np.concatenate([p[1] for p in parts])
        cy = np.concatenate([p[2] for p in parts])
        rad = np.concatenate([p[3] for p in parts])
        cnt = np.concatenate([p[4] for p in parts])
        base = np.concatenate([p[5] for p in parts])
        dirs = np.concatenate([p[6] for p in parts])
        subj = np.concatenate([p[7] for p in parts])
        xs, ys, offsets = _ngon_flat(cx, cy, rad, cnt, base, dirs)
        qx = np.rint((xs - ad.offset_x) * ad.scale).astype(np.int64)
        qy = np.rint((ys - ad.offset_y) * ad.scale).astype(np.int64)
        n_polys, area2 = overlay_pack_stats_flat(
            qx, qy, offsets, job, subj, "difference", "nonzero",
            n_jobs=len(jobs))
        return pa.table({"n_polys": pa.array(n_polys, pa.int64()),
                         "area2": pa.array(area2, pa.int64())})


def concentric(n: int, batch_size: int = 1) -> dict:
    polys, area2, sec = _run(_ids_table(n), ConcentricStage(n),
                             batch_size)
    assert polys >= n, (polys, n)
    return {"sec": sec, "label": n, "polygons": polys,
            "polygons_per_sec": int(polys / sec), "area2": area2}
