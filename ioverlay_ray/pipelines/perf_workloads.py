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
    """Single-kernel Spiral subject-only overlay (float API)."""
    from ..geometry.float_api import float_overlay
    path = spiral(count)
    t0 = time.perf_counter()
    shapes = float_overlay([path], [], "subject", "nonzero")
    sec = time.perf_counter() - t0
    return {"sec": sec, "polygons": len(shapes),
            "polygons_per_sec": int(len(shapes) / sec)}
