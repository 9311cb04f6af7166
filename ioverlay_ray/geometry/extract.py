"""Graph construction, contour extraction and hole binding.

Python re-expression of the reference's link-graph walk:
- node build: build/graph.rs:19-107
- contour walk + nearest-by-angle navigation: core/extract.rs:101-584,
  core/nearest_vector.rs
- hole -> parent binding (scan-line as-of join): bind/solver.rs:25-198

Runs per connected group (a geometry pair or a tile) inside a Ray
map_batches/map_groups task; inherently sequential per component, which
is why the distributed design partitions by pair/tile first.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .kernel import Segments, is_fill_top

UNVISITED = 0
SKIPPED = 1
HOLE_VISITED = 2
HULL_VISITED = 3

Point = Tuple[int, int]


def _cross(o: Point, a: Point, b: Point) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _is_clockwise(p0: Point, p1: Point, p2: Point) -> bool:
    return _cross(p0, p1, p2) < 0


class Links:
    """Filtered link table: point pairs + node ids + fill (core/link.rs)."""

    __slots__ = ("a", "b", "a_id", "b_id", "fill", "nodes")

    def __init__(self, a: List[Point], b: List[Point], fill: List[int]):
        self.a = a
        self.b = b
        self.fill = fill
        self.a_id = [0] * len(a)
        self.b_id = [0] * len(a)
        self.nodes: List[List[int]] = []

    def __len__(self):
        return len(self.a)


def build_links(segs: Segments, fills: np.ndarray, mask: np.ndarray) -> Links:
    idx = np.flatnonzero(mask)
    a = list(zip(segs.ax[idx].tolist(), segs.ay[idx].tolist()))
    b = list(zip(segs.bx[idx].tolist(), segs.by[idx].tolist()))
    return Links(a, b, fills[idx].tolist())


def connect_nodes(links: Links) -> None:
    """Assign node ids by two-pointer merge of a-points (already sorted,
    links come from the sorted segment table) with (x, y)-sorted b-ends
    (build/graph.rs:19-107). Node index lists keep a-group order first,
    then b-group order (stable by link index)."""
    n = len(links)
    if n == 0:
        return
    ends = sorted(range(n), key=lambda i: links.b[i])
    nodes: List[List[int]] = []

    ai = 0
    bi = 0
    while ai < n or bi < n:
        a_point = links.a[ai] if ai < n else None
        b_point = links.b[ends[bi]] if bi < n else None

        node_id = len(nodes)
        indices: List[int] = []

        take_a = a_point is not None and (b_point is None or a_point <= b_point)
        take_b = b_point is not None and (a_point is None or b_point <= a_point)

        if take_a:
            while ai < n and links.a[ai] == a_point:
                links.a_id[ai] = node_id
                indices.append(ai)
                ai += 1
        if take_b:
            while bi < n and links.b[ends[bi]] == b_point:
                li = ends[bi]
                indices.append(li)
                links.b_id[li] = node_id
                bi += 1
        nodes.append(indices)
    links.nodes = nodes


# ---------------------------------------------------------------------------
# Navigation (core/extract.rs:391-584, core/nearest_vector.rs)
# ---------------------------------------------------------------------------

def _find_left_top_link(links: Links, link_index: int, visited) -> int:
    top_a = links.a[link_index]
    node = links.nodes[links.a_id[link_index]]
    if len(node) == 2:
        i0, i1 = node
        if _is_clockwise(links.a[i0], links.b[i0], links.b[i1]):
            return i0
        return i1
    top_index = link_index
    top_b = links.b[link_index]
    for i in node:
        if i == link_index:
            continue
        if links.a[i] >= links.b[i]:  # not direct
            continue
        if _is_clockwise(top_a, top_b, links.b[i]):
            continue
        if visited[i] != UNVISITED:
            continue
        top_index = i
        top_b = links.b[i]
    return top_index


def _other(links: Links, i: int, node_id: int) -> Point:
    if links.a_id[i] == node_id:
        return links.b[i]
    return links.a[i]


def _next_link(links: Links, link_id: int, node_id: int,
               clockwise: bool, visited) -> int:
    node = links.nodes[node_id]
    if len(node) == 2:
        return node[1] if node[0] == link_id else node[0]

    # gather first two unvisited
    first_index = 0
    second_index = -1
    pos = 0
    is_first = True
    for i, li in enumerate(node):
        if visited[li] == UNVISITED:
            if is_first:
                first_index = li
                is_first = False
            else:
                second_index = li
                pos = i
                break
    if second_index < 0:
        return first_index

    target = link_id
    if links.a_id[target] == node_id:
        c = links.a[target]
        a = links.b[target]
    else:
        c = links.b[target]
        a = links.a[target]

    # NearestVector (core/nearest_vector.rs:15-60): pick the closest
    # outgoing vector to (a - c) by the requested rotation.
    vax = a[0] - c[0]
    vay = a[1] - c[1]
    b = _other(links, first_index, node_id)
    vbx = b[0] - c[0]
    vby = b[1] - c[1]
    rot = 1 if clockwise else -1
    cr = vax * vby - vay * vbx
    more_180 = (cr >= 0) if clockwise else (cr <= 0)
    best_id = first_index

    def add(p: Point, pid: int):
        nonlocal vbx, vby, more_180, best_id
        vpx = p[0] - c[0]
        vpy = p[1] - c[1]
        ap_more_180 = (vax * vpy - vay * vpx) * rot >= 0
        if more_180 == ap_more_180:
            if (vpx * vby - vpy * vbx) * rot < 0:
                vbx, vby = vpx, vpy
                best_id = pid
        elif more_180:
            more_180 = False
            vbx, vby = vpx, vpy
            best_id = pid

    add(_other(links, second_index, node_id), second_index)
    for li in node[pos + 1:]:
        if visited[li] == UNVISITED:
            add(_other(links, li, node_id), li)
    return best_id


def _find_contour(links: Links, visited, start_link: int, begin: Point,
                  node_id: int, last_node_id: int, direction: bool,
                  state: int) -> List[Point]:
    link_id = start_link
    visited[link_id] = state
    points = [begin]
    last_link_id = _next_link(links, link_id, last_node_id, not direction,
                              visited)
    while link_id != last_link_id:
        link_id = _next_link(links, link_id, node_id, direction, visited)
        if links.a_id[link_id] == node_id:
            points.append(links.a[link_id])
            node_id = links.b_id[link_id]
        else:
            points.append(links.b[link_id])
            node_id = links.a_id[link_id]
        visited[link_id] = state
    return points


# ---------------------------------------------------------------------------
# Contour validation (i_shape Simplify semantics used by
# core/extract.rs:312-333)
# ---------------------------------------------------------------------------

def simplify_contour(points: List[Point]) -> Tuple[List[Point], bool]:
    """Remove degenerate vertices (duplicates, collinear midpoints and
    spikes) from a closed contour; returns (points, modified)."""
    modified = False
    pts = points
    changed = True
    while changed and len(pts) >= 3:
        changed = False
        out = []
        n = len(pts)
        for i in range(n):
            p0 = pts[i - 1]
            p1 = pts[i]
            p2 = pts[(i + 1) % n]
            if _cross(p0, p1, p2) == 0:
                changed = True
                modified = True
            else:
                out.append(p1)
        if changed:
            pts = out
    return pts, modified


def validate_contour(points: List[Point], min_area: int,
                     preserve_collinear: bool) -> Tuple[List[Point], bool, bool]:
    """(points, is_valid, is_modified) — core/extract.rs:312-333."""
    modified = False
    if not preserve_collinear:
        points, modified = simplify_contour(points)
    if len(points) < 3:
        return points, False, modified
    if min_area == 0:
        return points, True, modified
    area2 = 0
    n = len(points)
    for i in range(n):
        x0, y0 = points[i - 1]
        x1, y1 = points[i]
        area2 += x0 * y1 - x1 * y0
    if (abs(area2) >> 1) < min_area:
        return points, False, modified
    return points, True, modified


# ---------------------------------------------------------------------------
# VSegment helpers (geom/v_segment.rs)
# ---------------------------------------------------------------------------

def _vseg_cmp(s: Tuple[Point, Point], t: Tuple[Point, Point]) -> int:
    """is_under_segment_order: -1 when s is under t."""
    sa, sb = s
    ta, tb = t
    if sa < ta:
        c = _cross(sa, ta, sb)
    elif sa == ta:
        c = _cross(sa, tb, sb)
    else:
        c = _cross(ta, tb, sa)
    return -1 if c < 0 else (1 if c > 0 else 0)


def _vseg_is_under(s, t) -> bool:
    sa, sb = s
    ta, tb = t
    if sa < ta:
        return _is_clockwise(sa, ta, sb)
    if sa == ta:
        return _is_clockwise(sa, tb, sb)
    return _is_clockwise(ta, tb, sa)


def _cmp_by_angle(s, t) -> int:
    """counterclockwise angle order: -1 when cross(v_s, v_t) > 0."""
    v0x = s[1][0] - s[0][0]
    v0y = s[1][1] - s[0][1]
    v1x = t[1][0] - t[0][0]
    v1y = t[1][1] - t[0][1]
    cr = v0x * v1y - v0y * v1x
    return -1 if cr > 0 else (1 if cr < 0 else 0)


def _left_bottom_segment_from(contour: List[Point], a: Point):
    n = len(contour)
    best = None
    for i, p in enumerate(contour):
        if p != a:
            continue
        for b in (contour[(i + 1) % n], contour[i - 1]):
            cand = (a, b)
            if best is None or _vseg_is_under(cand, best):
                best = cand
    return best if best is not None else (a, a)


def _left_bottom_segment(contour: List[Point]):
    a = min(contour)
    return _left_bottom_segment_from(contour, a)


# ---------------------------------------------------------------------------
# Hole binding (bind/solver.rs:25-198, bind/segment.rs)
# ---------------------------------------------------------------------------

def _append_id_segments(contour: List[Point], out: list, tag: tuple,
                        x_min: int, x_max: int, clockwise: bool) -> None:
    """Collect bottom edges (a.x < b.x in traversal order) overlapping the
    anchor x-window (bind/segment.rs:71-105)."""
    seq = contour if clockwise else list(reversed(contour))
    first = seq[0]
    b = first
    for a in seq[1:]:
        if a[0] < b[0] and x_min < b[0] and a[0] <= x_max:
            out.append(((a, b), tag))
        b = a
    a = first
    if a[0] < b[0] and x_min < b[0] and a[0] <= x_max:
        out.append(((a, b), tag))


def join_holes(shapes: List[list], holes: List[List[Point]],
               anchors: List[tuple], clockwise: bool,
               anchors_sorted: bool) -> None:
    """Assign each hole to its parent shape via a scan-line over x-sorted
    bottom edges; transitive parents for hole-under-hole
    (bind/solver.rs:119-198)."""
    if not shapes or not holes:
        return
    if len(shapes) == 1:
        shapes[0].extend(holes)
        return

    if not anchors_sorted:
        anchors = sorted(anchors, key=lambda it: it[0][0])
    # stable per-run angle sort of anchors sharing the same a point
    anchors = _sort_runs_by_angle(anchors)

    x_min = anchors[0][0][0][0]
    x_max = anchors[-1][0][0][0]

    segments: list = []
    for i, shape in enumerate(shapes):
        _append_id_segments(shape[0], segments, ("shape", i), x_min, x_max,
                            clockwise)
    for i, hole in enumerate(holes):
        _append_id_segments(hole, segments, ("hole", i), x_min, x_max,
                            clockwise)

    import functools
    segments.sort(key=functools.cmp_to_key(
        lambda u, v: (-1 if u[0][0] < v[0][0] else 1) if u[0][0] != v[0][0]
        else _cmp_by_angle(u[0], v[0])))

    parent_for_child = [-1] * len(holes)

    scan: list = []  # [vseg, tag]
    j = 0
    for anchor_vseg, (_, child_index) in anchors:
        p = anchor_vseg[0]
        while j < len(segments):
            vseg, tag = segments[j]
            if vseg[0] > anchor_vseg[0] or (
                    vseg[0] == anchor_vseg[0]
                    and _cmp_by_angle(vseg, anchor_vseg) > 0):
                break
            if vseg[1][0] > p[0]:
                scan.append((vseg, tag))
            j += 1

        # purge expired & find greatest segment strictly under the anchor
        best = None
        best_tag = None
        alive = []
        for vseg, tag in scan:
            if vseg[1][0] < p[0]:
                continue  # expired
            alive.append((vseg, tag))
            if _vseg_cmp(vseg, anchor_vseg) < 0:
                if best is None or _vseg_cmp(best, vseg) < 0:
                    best = vseg
                    best_tag = tag
        scan = alive

        if best_tag is None:
            parent = 0  # defensive: every hole has a hull below
        elif best_tag[0] == "hole":
            parent = parent_for_child[best_tag[1]]
        else:
            parent = best_tag[1]
        parent_for_child[child_index] = parent

    for hole_index, hole in enumerate(holes):
        shapes[parent_for_child[hole_index]].append(hole)


def _sort_runs_by_angle(anchors: List[tuple]) -> List[tuple]:
    """Sort runs of anchors sharing an a-point by angle
    (bind/solver.rs add_sort_by_angle)."""
    import functools
    out = list(anchors)
    start = 0
    n = len(out)
    while start < n:
        a = out[start][0][0]
        end = start + 1
        while end < n and out[end][0][0] == a:
            end += 1
        if end > start + 1:
            out[start:end] = sorted(
                out[start:end],
                key=functools.cmp_to_key(lambda u, v: _cmp_by_angle(u[0], v[0])))
        start = end
    return out


# ---------------------------------------------------------------------------
# Top-level extraction (core/extract.rs:101-187)
# ---------------------------------------------------------------------------

def extract_shapes(links: Links, rule: int, clockwise: bool = False,
                   preserve_output_collinear: bool = False,
                   min_output_area: int = 0,
                   nest_holes: bool = True) -> List[list]:
    """Walk the filtered link graph into shapes-with-holes.

    Returns [[contour, hole, hole, ...], ...]; hull direction CCW unless
    ``clockwise``; holes opposite. ``nest_holes=False`` is the flat
    variant (extract_contours_into, core/extract.rs:223-276): every
    contour comes back top-level in discovery order, holes unbound.
    """
    n = len(links)
    visited = bytearray(n)
    shapes: List[list] = []
    holes: List[List[Point]] = []
    anchors: List[tuple] = []
    anchors_sorted = True

    link_index = 0
    while link_index < n:
        if visited[link_index] != UNVISITED:
            link_index += 1
            continue
        left_top = _find_left_top_link(links, link_index, visited)
        fill = links.fill[left_top]
        hole = is_fill_top(fill, rule)
        state = HOLE_VISITED if hole else HULL_VISITED
        direction = (hole == clockwise)
        if direction:
            begin = links.b[left_top]
            node_id = links.a_id[left_top]
            last_node_id = links.b_id[left_top]
        else:
            begin = links.a[left_top]
            node_id = links.b_id[left_top]
            last_node_id = links.a_id[left_top]

        points = _find_contour(links, visited, left_top, begin, node_id,
                               last_node_id, direction, state)
        points, is_valid, is_modified = validate_contour(
            points, min_output_area, preserve_output_collinear)
        if not is_valid:
            link_index += 1
            continue

        if hole:
            left_bottom = points[1] if clockwise else points[0]
            v_seg = _left_bottom_segment_from(points, left_bottom)
            if is_modified:
                most_left = _left_bottom_segment(points)
                if most_left != v_seg:
                    v_seg = most_left
                    anchors_sorted = False
            anchors.append((v_seg, ("hole", len(holes))))
            holes.append(points)
        else:
            shapes.append([points])

    if not nest_holes:
        return [[c] for shape in shapes for c in shape] + \
               [[h] for h in holes]
    join_holes(shapes, holes, anchors, clockwise, anchors_sorted)
    return shapes


# ---------------------------------------------------------------------------
# OGC-valid extraction (core/extract_ogc.rs:19-350): every surface
# interior is a connected point set (ISO 19125-1) — self-touching
# contours are split into hull + per-shape holes via a contour-local
# reverse re-walk; holes are collected in a second pass.
# ---------------------------------------------------------------------------

def _start_data(links: Links, left_top: int, direction: bool):
    """(begin, node_id, last_node_id) — StartPathData::new."""
    if direction:
        return links.b[left_top], links.a_id[left_top], links.b_id[left_top]
    return links.a[left_top], links.b_id[left_top], links.a_id[left_top]


def _walk_links(links: Links, visited, start_link: int, node_id: int,
                last_node_id: int, direction: bool, state: int) -> List[int]:
    """Traverse a closed tour marking ``state``; return visited link ids
    (skip_contour / collect_shape first pass)."""
    link_id = start_link
    visited[link_id] = state
    ids = [link_id]
    last_link_id = _next_link(links, link_id, last_node_id, not direction,
                              visited)
    while link_id != last_link_id:
        link_id = _next_link(links, link_id, node_id, direction, visited)
        if links.a_id[link_id] == node_id:
            node_id = links.b_id[link_id]
        else:
            node_id = links.a_id[link_id]
        visited[link_id] = state
        ids.append(link_id)
    return ids


def _collect_shape_ogc(links: Links, visited, left_top: int,
                       direction: bool, traversal: bool, min_area: int,
                       preserve_collinear: bool):
    """core/extract_ogc.rs:214-350: mark the full self-touching contour,
    re-walk it with reversed rotation to get the outer boundary, then
    emit the pinched-off loops as holes of this shape."""
    begin, node_id, last_node_id = _start_data(links, left_top, direction)
    ids = _walk_links(links, visited, left_top, node_id, last_node_id,
                      traversal, HULL_VISITED)
    end_link = max(ids)

    contour_visited = bytearray([SKIPPED]) * len(links)
    for i in ids:
        contour_visited[i] = UNVISITED

    points = _find_contour(links, contour_visited, left_top, begin,
                           node_id, last_node_id, not traversal,
                           HULL_VISITED)
    points, is_valid, _ = validate_contour(points, min_area,
                                           preserve_collinear)
    shape = [points] if is_valid else None

    if len(points) < len(ids):
        # self-touches pinched off interior loops -> holes of this shape
        link_index = left_top
        while link_index <= end_link:
            if contour_visited[link_index] != UNVISITED:
                link_index += 1
                continue
            lt = _find_left_top_link(links, link_index, contour_visited)
            h_begin, h_node, h_last = _start_data(links, lt, traversal)
            h_points = _find_contour(links, contour_visited, lt, h_begin,
                                     h_node, h_last, traversal,
                                     HOLE_VISITED)
            if shape is not None:
                h_points, ok, _ = validate_contour(h_points, min_area,
                                                   preserve_collinear)
                if not ok:
                    link_index += 1
                    continue
                shape.append(h_points)
    return shape


def extract_shapes_ogc(links: Links, rule: int, clockwise: bool = False,
                       preserve_output_collinear: bool = False,
                       min_output_area: int = 0) -> List[list]:
    """OGC-valid variant of extract_shapes (options.ogc)."""
    n = len(links)
    visited = bytearray(n)
    shapes: List[list] = []
    traversal = not clockwise
    hole_count = 0

    link_index = 0
    while link_index < n:
        if visited[link_index] != UNVISITED:
            link_index += 1
            continue
        left_top = _find_left_top_link(links, link_index, visited)
        hole = is_fill_top(links.fill[left_top], rule)
        direction = (hole == clockwise)
        if hole:
            begin, node_id, last_node_id = _start_data(links, left_top,
                                                       direction)
            _walk_links(links, visited, left_top, node_id, last_node_id,
                        traversal, HOLE_VISITED)
            hole_count += 1
            continue
        shape = _collect_shape_ogc(links, visited, left_top, direction,
                                   traversal, min_output_area,
                                   preserve_output_collinear)
        if shape is not None:
            shapes.append(shape)
        else:
            link_index += 1

    if hole_count:
        # second pass: only hole edges stay walkable
        for i in range(n):
            visited[i] = UNVISITED if visited[i] == HOLE_VISITED else SKIPPED
        holes: List[List[Point]] = []
        anchors: List[tuple] = []
        anchors_sorted = True
        link_index = 0
        while link_index < n:
            if visited[link_index] != UNVISITED:
                link_index += 1
                continue
            left_top = _find_left_top_link(links, link_index, visited)
            begin, node_id, last_node_id = _start_data(links, left_top,
                                                       clockwise)
            points = _find_contour(links, visited, left_top, begin,
                                   node_id, last_node_id, clockwise,
                                   HULL_VISITED)
            points, is_valid, is_modified = validate_contour(
                points, min_output_area, preserve_output_collinear)
            if not is_valid:
                link_index += 1
                continue
            left_bottom = points[1] if clockwise else points[0]
            v_seg = _left_bottom_segment_from(points, left_bottom)
            if is_modified:
                most_left = _left_bottom_segment(points)
                if most_left != v_seg:
                    v_seg = most_left
                    anchors_sorted = False
            anchors.append((v_seg, ("hole", len(holes))))
            holes.append(points)
        join_holes(shapes, holes, anchors, clockwise, anchors_sorted)
    return shapes
