"""Distributed dissolve vs brute-force union area (numpy cell raster)."""

import numpy as np
import pyarrow as pa
import ray.data

from ioverlay_ray.pipelines.dissolve import (dissolve, dissolve_area2,
                                             rings_to_shape, smallest_cell)


def _rects(n, seed=7, world=512):
    rng = np.random.default_rng(seed)
    x0 = rng.integers(0, world - 40, n)
    y0 = rng.integers(0, world - 40, n)
    w = rng.integers(3, 40, n)
    h = rng.integers(3, 40, n)
    return x0, y0, x0 + w, y0 + h


def _rect_ds(x0, y0, x1, y1):
    rings = [[[int(a), int(b), int(c), int(b), int(c), int(d), int(a), int(d)]]
             for a, b, c, d in zip(x0, y0, x1, y1)]
    t = pa.table({
        "rings": pa.array(rings, pa.list_(pa.list_(pa.int64()))),
        "x0": pa.array(x0, pa.int64()), "y0": pa.array(y0, pa.int64()),
        "x1": pa.array(x1, pa.int64()), "y1": pa.array(y1, pa.int64()),
    })
    return ray.data.from_arrow(t)


def _brute_area(x0, y0, x1, y1, world=512):
    grid = np.zeros((world, world), dtype=bool)
    for a, b, c, d in zip(x0, y0, x1, y1):
        grid[a:c, b:d] = True
    return int(grid.sum())


def test_smallest_cell_assignment():
    lev, cell = smallest_cell([0, 0, 100, 130], [0, 0, 100, 130],
                              [10, 200, 120, 250], [10, 200, 120, 250],
                              base=64, levels=3)
    assert lev[0] == 0            # fits one fine cell
    assert lev[1] == 2 and cell[1] == 0   # spans coarse cells -> root
    assert lev[2] == 0            # [100,120) fits fine cell 1
    assert lev[3] == 1            # [130,250) fits level-1 cell (128-wide)


def test_dissolve_matches_brute_force(ray_session):
    x0, y0, x1, y1 = _rects(150)
    ds = _rect_ds(x0, y0, x1, y1)
    area2 = dissolve_area2(ds, base=64, levels=4)
    assert area2 == 2 * _brute_area(x0, y0, x1, y1)


def test_dissolve_disjoint_count(ray_session):
    # 4 disjoint rects, far apart -> 4 shapes out
    x0 = np.array([0, 200, 0, 200])
    y0 = np.array([0, 0, 200, 200])
    ds = _rect_ds(x0, y0, x0 + 10, y0 + 10)
    out = dissolve(ds, base=64, levels=4).to_pandas()
    assert len(out) == 4
    assert dissolve_area2(_rect_ds(x0, y0, x0 + 10, y0 + 10),
                          base=64, levels=4) == 2 * 400


def test_dissolve_overlapping_merge(ray_session):
    # chain of overlapping rects crossing cell borders -> single shape
    x0 = np.arange(0, 300, 30)
    y0 = np.full_like(x0, 60)
    ds = _rect_ds(x0, y0, x0 + 40, y0 + 20)
    out = dissolve(ds, base=64, levels=4).to_pandas()
    assert len(out) == 1
    shape = rings_to_shape(out["rings"].iloc[0])
    assert len(shape) == 1  # no holes


def test_dissolve_with_holes(ray_session):
    """Donut (hull + hole) unioned with a rect that plugs the hole ->
    one solid square; hole rings ride the rings encoding."""
    donut = [[0, 0, 100, 0, 100, 100, 0, 100],       # hull CCW
             [30, 30, 30, 70, 70, 70, 70, 30]]       # hole CW
    plug = [[30, 30, 70, 30, 70, 70, 30, 70]]
    t = pa.table({
        "rings": pa.array([donut, plug], pa.list_(pa.list_(pa.int64()))),
        "x0": pa.array([0, 30], pa.int64()),
        "y0": pa.array([0, 30], pa.int64()),
        "x1": pa.array([100, 70], pa.int64()),
        "y1": pa.array([100, 70], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = dissolve(ds, base=64, levels=3).to_pandas()
    assert len(out) == 1
    shape = rings_to_shape(out["rings"].iloc[0])
    assert len(shape) == 1          # hole filled
    assert dissolve_area2(ray.data.from_arrow(t), base=64, levels=3) \
        == 2 * 100 * 100


def test_root_crosser_unions_with_risen_shapes(ray_session):
    # a coarse-level crosser must union with shapes that rise to the
    # root from below (regression: they were keyed to different top
    # groups and double-counted)
    import ray.data
    from ioverlay_ray.pipelines.dissolve import (dissolve_area2,
                                                 shape_to_rings)
    base, levels = 64, 3  # cells: 64 / 128 / 256
    # A crosses the coarse (256) boundary -> clamped to the top level
    # with a NONZERO coarse cell id (min corner in coarse cell 1)
    A = [[(300, 10), (600, 10), (600, 90), (300, 90)]]
    # B fits a mid (128) cell -> assigned level 1, unions there, rises
    # to the root as cell 0; it lies fully inside A
    B = [[(385, 40), (500, 40), (500, 80), (385, 80)]]
    rows = []
    for s in (A, B):
        xs = [p[0] for c in s for p in c]
        ys = [p[1] for c in s for p in c]
        rows.append({"rings": shape_to_rings(s),
                     "x0": min(xs), "y0": min(ys),
                     "x1": max(xs) + 1, "y1": max(ys) + 1})
    ds = ray.data.from_items(rows)
    got = dissolve_area2(ds, base=base, levels=levels)
    # union area, not the sum: B is inside A = 300x80
    assert got == 2 * (300 * 80)


def test_component_root_parity_randomized(ray_session):
    # the parallel component root (bbox union-find + per-component
    # union tasks) must produce the same union area as one big kernel
    # union of the same rects
    import numpy as np
    import ray.data
    from ioverlay_ray.geometry.overlay import simplify_shape
    from ioverlay_ray.pipelines.dissolve import (dissolve_area2,
                                                 shape_to_rings)
    rng = np.random.default_rng(42)
    rows = []
    contours = []
    for _ in range(600):
        x0 = int(rng.integers(0, 980))
        y0 = int(rng.integers(0, 980))
        w = int(rng.integers(3, 40))
        h = int(rng.integers(3, 40))
        s = [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]]
        contours.extend(s)
        rows.append({"rings": shape_to_rings(s),
                     "x0": x0, "y0": y0,
                     "x1": x0 + w + 1, "y1": y0 + h + 1})
    shapes = simplify_shape(contours, "nonzero")
    want = 0
    for shape in shapes:
        for ring in shape:
            a2 = 0
            for i in range(len(ring)):
                p0 = ring[i - 1]
                p1 = ring[i]
                a2 += p0[0] * p1[1] - p1[0] * p0[1]
            want += a2
    # force the component-root branch: max_group_rows small so the
    # pre-root row count exceeds it but stays under the driver cap
    got = dissolve_area2(ray.data.from_items(rows), base=64, levels=3,
                         max_group_rows=8)
    assert got == abs(want)


def test_salted_root_fallback_above_cap(ray_session, monkeypatch):
    # above DRIVER_COMPONENTS_CAP the pre-r4 salted+single-root path
    # must still produce the same union area
    import numpy as np
    import ray.data
    from ioverlay_ray.pipelines import dissolve as D
    from ioverlay_ray.pipelines.dissolve import (dissolve_area2,
                                                 shape_to_rings)
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(300):
        x0 = int(rng.integers(0, 980))
        y0 = int(rng.integers(0, 980))
        w = int(rng.integers(3, 30))
        h = int(rng.integers(3, 30))
        s = [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]]
        rows.append({"rings": shape_to_rings(s),
                     "x0": x0, "y0": y0,
                     "x1": x0 + w + 1, "y1": y0 + h + 1})
    ds = ray.data.from_items(rows)
    want = dissolve_area2(ds, base=64, levels=3, max_group_rows=8)
    monkeypatch.setattr(D, "DRIVER_COMPONENTS_CAP", 4)
    got = dissolve_area2(ray.data.from_items(rows), base=64, levels=3,
                         max_group_rows=8)
    assert got == want
