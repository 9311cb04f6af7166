"""Tile-distributed overlay vs the single-kernel result.

Regions must agree exactly except at half-integer snap ties computed
from fragment endpoints (see geometry/tiled.py docstring); the xor
sliver bound is one grid cell per affected crossing.
"""

import numpy as np

from ioverlay_ray.geometry.overlay import overlay
from ioverlay_ray.geometry.tiled import tiled_overlay
from ioverlay_ray.stages.geo_arrow import shapes_area2


def rect(x0, y0, w, h):
    return [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]


def diamond(cx, cy, r):
    return [(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r)]


def xor_sliver(subj, clip, rule, strip_w=256):
    single = overlay(subj, clip, rule, "nonzero")
    tiled = tiled_overlay(subj, clip, rule, "nonzero", strip_w=strip_w)
    a = [c for s in single for c in s]
    b = [c for s in tiled for c in s]
    return abs(shapes_area2(overlay(a, b, "xor", "nonzero")))


def test_rect_cases_exact():
    subj = [rect(10, 10, 500, 300), rect(400, 200, 300, 300)]
    clip = [rect(200, 50, 400, 400)]
    for rule in ("union", "intersect", "difference", "xor"):
        assert xor_sliver(subj, clip, rule) == 0


def test_cross_border_diamonds():
    subj = [diamond(250, 300, 150)]   # straddles the x=256 border
    clip = [diamond(400, 300, 200)]
    for rule in ("union", "intersect", "difference", "xor"):
        assert xor_sliver(subj, clip, rule) == 0


def test_hole_across_border():
    outer = [rect(100, 100, 600, 400)]
    inner = [rect(200, 200, 300, 200)]  # hole spans x=256 border
    s = tiled_overlay(outer, inner, "difference", "nonzero")
    assert len(s) == 1 and len(s[0]) == 2
    assert xor_sliver(outer, inner, "difference") == 0


def test_randomized_bounded_sliver():
    rng = np.random.default_rng(3)
    exact = 0
    total = 0
    for trial in range(25):
        subj, clip = [], []
        for _ in range(rng.integers(1, 5)):
            x0, y0 = rng.integers(0, 900, 2)
            w, h = rng.integers(20, 300, 2)
            subj.append(rect(int(x0), int(y0), int(w), int(h)))
        for _ in range(rng.integers(1, 5)):
            cx, cy = rng.integers(100, 900, 2)
            r = int(rng.integers(20, 200))
            clip.append(diamond(int(cx), int(cy), r))
        for rule in ("union", "intersect", "difference", "xor"):
            d2 = xor_sliver(subj, clip, rule)
            total += 1
            exact += d2 == 0
            # sliver bounded: a few grid cells per half-tie crossing
            assert d2 <= 256, (trial, rule, d2)
    assert exact >= total * 0.9  # the overwhelming majority is bit-exact


def test_ray_pipeline_matches_local(ray_session):
    from ioverlay_ray.pipelines.tiled_overlay import tiled_overlay_ray
    subj = [diamond(250, 300, 150), rect(500, 100, 300, 300)]
    clip = [diamond(400, 300, 200)]
    for rule in ("union", "intersect"):
        local = tiled_overlay(subj, clip, rule, "nonzero")
        dist = tiled_overlay_ray(subj, clip, rule, "nonzero")
        assert shapes_area2(dist) == shapes_area2(local)
        a = [c for s in local for c in s]
        b = [c for s in dist for c in s]
        assert abs(shapes_area2(overlay(a, b, "xor", "nonzero"))) == 0


def test_scene_scale_smoke(ray_session):
    """Wide scene across many strips: distributed union stays correct
    (area equality vs the worker-local path) at 1000-polygon scale."""
    from ioverlay_ray.pipelines.tiled_overlay import tiled_overlay_ray
    rng = np.random.default_rng(1)
    n = 500
    subj = [rect(int(x), int(y), int(w), int(h)) for x, y, w, h in
            zip(rng.integers(0, 10000, n), rng.integers(0, 1500, n),
                rng.integers(20, 200, n), rng.integers(20, 200, n))]
    clip = [diamond(int(x), int(y), int(r)) for x, y, r in
            zip(rng.integers(100, 10000, n), rng.integers(100, 1500, n),
                rng.integers(20, 150, n))]
    dist = tiled_overlay_ray(subj, clip, "union", "nonzero", strip_w=512)
    local = tiled_overlay(subj, clip, "union", "nonzero", strip_w=512)
    assert shapes_area2(dist) == shapes_area2(local)
    assert len(dist) == len(local)
