"""Coordinate-bound / fixed-scale validation (ADVICE round 1) and the
packed relate / string-clip kernels."""

import numpy as np
import pytest

from ioverlay_ray.geometry.float_api import FloatPointAdapter, float_overlay
from ioverlay_ray.geometry.kernel import MAX_COORD
from ioverlay_ray.geometry.overlay import overlay
from ioverlay_ray.geometry.relate import Relation, relate_pack
from ioverlay_ray.geometry.string_ops import clip_paths, clip_paths_pack


def _rect(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def test_build_segments_rejects_out_of_range():
    big = MAX_COORD * 8
    with pytest.raises(ValueError):
        overlay([_rect(0, 0, big, big)], [_rect(1, 1, 5, 5)],
                "intersect", "nonzero")


def test_fixed_scale_too_large_raises():
    # 1e6-extent input at scale 1e7 quantizes far past 2^29
    subj = [[(0.0, 0.0), (1e6, 0.0), (1e6, 1e6), (0.0, 1e6)]]
    clip = [[(1.0, 1.0), (5.0, 1.0), (5.0, 5.0), (1.0, 5.0)]]
    with pytest.raises(ValueError):
        float_overlay(subj, clip, "intersect", "nonzero", scale=1e7)


def test_fixed_scale_shared_lattice():
    # two fixed-scale adapters with different bounding boxes must agree
    # on every grid point (offsets snapped to multiples of 1/scale)
    a = FloatPointAdapter(0.0, 0.0, 10.0, 10.0, scale=16.0)
    b = FloatPointAdapter(5.0, 5.0, 11.3, 11.3, scale=16.0)
    p = (5.07, 5.07)
    pa_ = a.to_float_point(a.to_int_contour([p])[0])
    pb_ = b.to_float_point(b.to_int_contour([p])[0])
    assert pa_ == pytest.approx(pb_, abs=1e-12)


def test_relate_pack_matches_single():
    rng = np.random.default_rng(3)
    jobs = []
    for _ in range(40):
        x0, y0 = rng.integers(0, 50, 2)
        w1, h1 = rng.integers(1, 40, 2)
        x2, y2 = rng.integers(0, 50, 2)
        w2, h2 = rng.integers(1, 40, 2)
        jobs.append(([_rect(int(x0), int(y0), int(x0 + w1), int(y0 + h1))],
                     [_rect(int(x2), int(y2), int(x2 + w2), int(y2 + h2))]))
    packed = relate_pack(jobs, "nonzero")
    for (subj, clip), r in zip(jobs, packed):
        ref = Relation(subj, clip, "nonzero")
        for pred in ("intersects", "interiors_intersect", "touches",
                     "within", "covers", "disjoint", "point_intersects"):
            assert getattr(r, pred)() == getattr(ref, pred)(), pred


def test_clip_paths_pack_matches_single():
    rng = np.random.default_rng(5)
    jobs = []
    for _ in range(30):
        x0, y0 = rng.integers(0, 60, 2)
        w, h = rng.integers(4, 50, 2)
        rect = [_rect(int(x0), int(y0), int(x0 + w), int(y0 + h))]
        lx = int(rng.integers(-20, 80))
        ly = int(y0 + h // 2)
        line = [[(lx, ly), (lx + 70, ly)]]
        jobs.append((rect, line))
    packed = clip_paths_pack(jobs, "nonzero")
    for (rect, line), (inside, outside) in zip(jobs, packed):
        ref_in = clip_paths(rect, line, "nonzero", invert=False)
        ref_out = clip_paths(rect, line, "nonzero", invert=True)
        assert sorted(inside) == sorted(ref_in)
        assert sorted(outside) == sorted(ref_out)
