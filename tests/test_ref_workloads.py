"""Distributed reference perf workloads vs whole-scene single kernel.

Each workload's decomposition claims every output polygon is local to
one job; these tests run the SAME scene through one kernel invocation
(same quantization lattice for the float ones) and require count and
net-area equality.
"""

import math

import numpy as np
import pytest

from ioverlay_ray.geometry.overlay import overlay
from ioverlay_ray.pipelines import ref_workloads as W


def _net_area2(shapes):
    tot = 0
    for shape in shapes:
        for contour in shape:
            a = np.asarray(contour, dtype=np.int64)
            x = a[:, 0]
            y = a[:, 1]
            tot += int((x * np.roll(y, -1) - np.roll(x, -1) * y).sum())
    return tot


def test_not_overlap_closed_form(ray_session):
    r = W.not_overlap(32)
    assert r["polygons"] == 32 * 32 + 31 * 31


def test_windows_closed_form(ray_session):
    r = W.windows(32)
    assert r["polygons"] == 32 * 32


def test_nested_squares_matches_single_kernel(ray_session):
    n = 128
    r = W.nested_squares(n)
    single = W.nested_squares_single(n)
    assert r["polygons"] == single["shapes"] == n
    assert single["contours"] == 2 * n


def test_windmill_matches_single_kernel(ray_session):
    n = 8
    r = W.wind_mill(n)
    # whole scene through one kernel call
    subj, clip = [], []
    a = 10
    sq = [[(-3, 1), (-3, 3), (-1, 3), (-1, 1)],
          [(1, 2), (1, 4), (3, 4), (3, 2)],
          [(-2, -3), (-2, -1), (0, -1), (0, -3)],
          [(2, -2), (2, 0), (4, 0), (4, -2)]]
    tr = [[(0, 0), (-3, 0), (0, 3)],
          [(0, 1), (0, 4), (3, 1)],
          [(1, 0), (1, -3), (-2, 0)],
          [(1, 1), (4, 1), (1, -2)]]
    for i in range(n):
        for j in range(n):
            cx, cy = 40 + 80 * i, 40 + 80 * j
            for t in tr:
                subj.append([(cx + a * px, cy + a * py) for px, py in t])
            for s in sq:
                clip.append([(cx + a * px, cy + a * py) for px, py in s])
    shapes = overlay(subj, clip, "difference", "nonzero")
    assert r["polygons"] == len(shapes) == n * n
    assert r["area2"] == _net_area2(shapes)


def _corrosion_scene(n):
    nc = int(round(2.5 * n))

    def shape(cx, cy, radius, k):
        da = 2.0 * math.pi / k
        ang = np.arange(k) * da
        return np.cos(ang) * radius + cx, np.sin(ang) * radius + cy

    subs, clips = [], []
    for i in range(n):
        for c in range(n):
            subs.append(shape(100.0 * c, 100.0 * i, 40.0, (i + c) % 5 + 3))
    for m in range(nc):
        for l in range(nc):
            clips.append(shape(40.0 * l - 40.0, 40.0 * m - 40.0, 16.0,
                               (m + l) % 5 + 3))
    return subs, clips


def test_corrosion_matches_single_kernel(ray_session):
    n = 8
    r = W.corrosion(n)
    ad = W.corrosion_adapter(n)
    subs, clips = _corrosion_scene(n)

    def quant(pts):
        xs, ys = pts
        return list(zip(
            np.rint((xs - ad.offset_x) * ad.scale).astype(np.int64).tolist(),
            np.rint((ys - ad.offset_y) * ad.scale).astype(np.int64).tolist()))

    shapes = overlay([quant(s) for s in subs], [quant(c) for c in clips],
                     "difference", "nonzero")
    assert r["polygons"] == len(shapes)
    assert r["area2"] == _net_area2(shapes)


def test_concentric_matches_single_kernel(ray_session):
    n = 6
    r = W.concentric(n)
    ad = W.concentric_adapter(n)
    subs, clips = [], []
    for i in range(n):
        cx, cy, rad, cnt, base, dirs, subj = W._concentric_ring(i)
        xs, ys, offs = W._ngon_flat(cx, cy, rad, cnt, base, dirs)
        qx = np.rint((xs - ad.offset_x) * ad.scale).astype(np.int64)
        qy = np.rint((ys - ad.offset_y) * ad.scale).astype(np.int64)
        for k in range(len(cnt)):
            pts = list(zip(qx[offs[k]:offs[k + 1]].tolist(),
                           qy[offs[k]:offs[k + 1]].tolist()))
            (subs if subj[k] else clips).append(pts)
    shapes = overlay(subs, clips, "difference", "nonzero")
    assert r["polygons"] == len(shapes)
    assert r["area2"] == _net_area2(shapes)


def test_nested_deep_single_kernel_gate(ray_session):
    # deep-nesting regression gate: 1024 concentric frames through the
    # single kernel (hole binding is the historical O(n^2) hazard)
    r = W.nested_squares_single(1024)
    assert r["shapes"] == 1024
    assert r["contours"] == 2048
