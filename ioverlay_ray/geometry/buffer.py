"""Buffering (offset) operators: stroke open/closed paths into polygons
and inflate/deflate polygons (outline).

Same capability surface as the reference mesh module (stroke:
mesh/stroke/offset.rs:44-140, outline: mesh/outline/offset.rs:47-520,
styles: mesh/style.rs:7-81): per-edge rectangles + cap geometry
(butt/round/square) + join geometry (bevel/miter/round), self-unioned
through the boolean overlay engine. The reference emits segment soup and
unions with Positive/Negative fill; we emit CCW piece polygons and union
with NonZero — same result region, simpler generator. Tessellation of
arcs uses an angle step like LineJoin::Round(a) (a ~ max-segment/radius,
clamped to [0.01*pi, 0.25*pi], mesh/style.rs:57-81).

All math is float; the union runs on the integer kernel under a fixed
quantization scale (default 1024 grid steps per unit).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

from .overlay import overlay, simplify_shape

FPoint = Tuple[float, float]
DEFAULT_SCALE = 1024.0


def _norm(dx: float, dy: float) -> Tuple[float, float]:
    d = math.hypot(dx, dy)
    if d == 0.0:
        return 0.0, 0.0
    return dx / d, dy / d


def _ccw(piece: List[FPoint]) -> List[FPoint]:
    s = 0.0
    n = len(piece)
    for i in range(n):
        x0, y0 = piece[i - 1]
        x1, y1 = piece[i]
        s += x0 * y1 - x1 * y0
    return piece if s >= 0 else piece[::-1]


def _arc(c: FPoint, r: float, a0: float, a1: float, step: float) -> List[FPoint]:
    """Fan points from angle a0 to a1 (increasing CCW) stepping <= step."""
    if a1 < a0:
        a1 += 2 * math.pi
    n = max(1, int(math.ceil((a1 - a0) / step)))
    return [(c[0] + r * math.cos(a0 + (a1 - a0) * k / n),
             c[1] + r * math.sin(a0 + (a1 - a0) * k / n))
            for k in range(n + 1)]


def _clamp_angle(a: float) -> float:
    return min(max(a, 0.01 * math.pi), 0.25 * math.pi)


def _edge_band(a: FPoint, b: FPoint, r: float) -> List[FPoint]:
    dx, dy = _norm(b[0] - a[0], b[1] - a[1])
    nx, ny = -dy, dx
    return [(a[0] + nx * r, a[1] + ny * r), (b[0] + nx * r, b[1] + ny * r),
            (b[0] - nx * r, b[1] - ny * r), (a[0] - nx * r, a[1] - ny * r)]


def _join_pieces(p0: FPoint, p1: FPoint, p2: FPoint, r: float,
                 join: str, join_param: float) -> List[List[FPoint]]:
    """Fill the gap at vertex p1 between bands of (p0,p1) and (p1,p2)."""
    d1x, d1y = _norm(p1[0] - p0[0], p1[1] - p0[1])
    d2x, d2y = _norm(p2[0] - p1[0], p2[1] - p1[1])
    cross = d1x * d2y - d1y * d2x
    if cross == 0.0 and d1x * d2x + d1y * d2y >= 0:
        return []  # straight through, no gap
    # gap side: left turn (cross>0) leaves a gap on the right (-normal)
    s = -1.0 if cross > 0 else 1.0
    n1 = (-d1y * s, d1x * s)
    n2 = (-d2y * s, d2x * s)
    c1 = (p1[0] + n1[0] * r, p1[1] + n1[1] * r)
    c2 = (p1[0] + n2[0] * r, p1[1] + n2[1] * r)
    if join == "round":
        step = _clamp_angle(join_param)
        a1 = math.atan2(n1[1], n1[0])
        a2 = math.atan2(n2[1], n2[0])
        if s > 0:  # rotate from a1 to a2 the short way around the gap
            pts = _arc(p1, r, a2, a1, step)[::-1]
        else:
            pts = _arc(p1, r, a1, a2, step)
        return [[p1] + pts]
    if join == "miter":
        # intersection of the two offset edge lines; limit by sharpness
        half = math.acos(max(-1.0, min(1.0, d1x * d2x + d1y * d2y))) / 2.0
        angle = math.pi - 2 * half
        if angle >= max(join_param, 1e-9):
            denom = math.cos(half)
            if denom > 1e-9:
                m_len = r / denom
                bis = _norm(n1[0] + n2[0], n1[1] + n2[1])
                m = (p1[0] + bis[0] * m_len, p1[1] + bis[1] * m_len)
                return [[p1, c1, m, c2]]
    # bevel (and miter fallback)
    return [[p1, c1, c2]]


def _cap_pieces(end: FPoint, inward: FPoint, r: float, cap: str,
                cap_param: float) -> List[List[FPoint]]:
    """Cap at ``end`` of an edge coming from ``inward``."""
    dx, dy = _norm(end[0] - inward[0], end[1] - inward[1])
    nx, ny = -dy, dx
    if cap == "butt":
        return []
    if cap == "square":
        e = (end[0] + dx * r, end[1] + dy * r)
        return [[(end[0] + nx * r, end[1] + ny * r),
                 (e[0] + nx * r, e[1] + ny * r),
                 (e[0] - nx * r, e[1] - ny * r),
                 (end[0] - nx * r, end[1] - ny * r)]]
    if cap == "round":
        step = _clamp_angle(cap_param)
        a0 = math.atan2(-ny, -nx)
        return [[*_arc(end, r, a0, a0 + math.pi, step)]]
    if isinstance(cap, (list, tuple)):
        # LineCap::Custom (mesh/style.rs:16-17): template points in a
        # local frame, +x = outgoing direction, unit = half line width
        pts = [(end[0] + (dx * px - nx * py) * r,
                end[1] + (dy * px - ny * py) * r) for px, py in cap]
        return [[(end[0] + nx * r, end[1] + ny * r), *pts,
                 (end[0] - nx * r, end[1] - ny * r)]]
    raise ValueError(f"unknown cap {cap}")


def _path_pieces(path: Sequence[FPoint], r: float, is_closed: bool,
                 start_cap: str, end_cap: str, join: str,
                 join_param: float, cap_param: float) -> List[List[FPoint]]:
    pts = [tuple(map(float, p)) for p in path]
    # drop consecutive duplicates
    pts = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    if is_closed and len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 2:
        if len(pts) == 1 and is_closed:
            return [_arc(pts[0], r, 0.0, 2 * math.pi, _clamp_angle(cap_param))]
        return []
    pieces: List[List[FPoint]] = []
    edges = list(zip(pts, pts[1:]))
    if is_closed:
        edges.append((pts[-1], pts[0]))
    for a, b in edges:
        pieces.append(_edge_band(a, b, r))
    n = len(pts)
    if is_closed:
        for i in range(n):
            pieces.extend(_join_pieces(pts[i - 1], pts[i], pts[(i + 1) % n],
                                       r, join, join_param))
    else:
        for i in range(1, n - 1):
            pieces.extend(_join_pieces(pts[i - 1], pts[i], pts[i + 1],
                                       r, join, join_param))
        pieces.extend(_cap_pieces(pts[0], pts[1], r, start_cap, cap_param))
        pieces.extend(_cap_pieces(pts[-1], pts[-2], r, end_cap, cap_param))
    return pieces


def _quantize(pieces: List[List[FPoint]], scale: float) -> List[List[tuple]]:
    out = []
    for piece in pieces:
        ring = [(int(round(x * scale)), int(round(y * scale)))
                for x, y in _ccw(piece)]
        dedup = [p for i, p in enumerate(ring) if i == 0 or p != ring[i - 1]]
        if len(dedup) >= 3:
            out.append(dedup)
    return out


def _to_float(shapes: List[list], scale: float) -> List[list]:
    inv = 1.0 / scale
    return [[[(x * inv, y * inv) for x, y in contour] for contour in shape]
            for shape in shapes]


def stroke(paths: Sequence[Sequence[FPoint]], width: float,
           is_closed: bool = False, start_cap: str = "butt",
           end_cap: str = "butt", join: str = "bevel",
           join_param: float = 0.25 * math.pi,
           cap_param: float = 0.25 * math.pi,
           scale: float = DEFAULT_SCALE) -> List[list]:
    """Buffer open/closed paths into polygon shapes (float, CCW hulls,
    CW holes). Mirrors StrokeOffset::stroke semantics."""
    r = width / 2.0
    pieces: List[List[FPoint]] = []
    for path in paths:
        pieces.extend(_path_pieces(path, r, is_closed, start_cap, end_cap,
                                   join, join_param, cap_param))
    contours = _quantize(pieces, scale)
    if not contours:
        return []
    return _to_float(simplify_shape(contours, "nonzero"), scale)


def outline(shapes_or_contours, outer_offset: float,
            inner_offset: float = None, join: str = "bevel",
            join_param: float = 0.25 * math.pi,
            scale: float = DEFAULT_SCALE) -> List[list]:
    """Polygon inflate: grow each outer boundary by ``outer_offset`` and
    shrink each hole by ``inner_offset`` (OutlineOffset::outline; holes
    are CW contours). Positive offsets only.

    Accepts one shape ([contour, hole...]) or a list of shapes.
    """
    if inner_offset is None:
        inner_offset = outer_offset
    shapes = shapes_or_contours
    if shapes and isinstance(shapes[0][0], (tuple, list)) and \
            isinstance(shapes[0][0][0], (int, float)):
        shapes = [shapes]  # single shape given

    grow_pieces: List[List[FPoint]] = []
    hull_regions: List[List[tuple]] = []   # pre-shrunk hulls (r < 0)
    hole_regions: List[List[tuple]] = []
    for shape in shapes:
        for ci, contour in enumerate(shape):
            pts = [tuple(map(float, p)) for p in contour]
            r = outer_offset if ci == 0 else inner_offset
            band = _path_pieces(pts, abs(r), True, "butt", "butt", join,
                                join_param, join_param)
            if ci == 0:
                if r >= 0:
                    # inflate: region itself + boundary band
                    grow_pieces.append(pts)
                    grow_pieces.extend(band)
                else:
                    # deflate: region minus boundary band
                    shrunk = overlay(_quantize([pts], scale),
                                     _quantize(band, scale),
                                     "difference", "nonzero")
                    for s in shrunk:
                        hull_regions.extend(s)
            else:
                if r >= 0:
                    # hole shrinks when the polygon inflates
                    shrunk = overlay(_quantize([pts], scale),
                                     _quantize(band, scale),
                                     "difference", "nonzero")
                else:
                    # hole grows when the polygon deflates
                    shrunk = simplify_shape(
                        _quantize([pts] + band, scale), "nonzero")
                for s in shrunk:
                    hole_regions.extend(s)

    grown = simplify_shape(_quantize(grow_pieces, scale) + hull_regions,
                           "nonzero")
    if hole_regions:
        flat = [c for s in grown for c in s]
        grown = overlay(flat, hole_regions, "difference", "nonzero")
    return _to_float(grown, scale)
