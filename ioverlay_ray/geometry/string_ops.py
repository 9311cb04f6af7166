"""Polyline (string) operators: clip open paths by polygons, slice
polygons by polylines.

From-scratch re-expression of the reference string machinery:
- winding model ShapeCountString {subj: i32, clip: FORWARD/BACK bitmask}
  (segm/string.rs:5-88); string lines normalized with the direction bit
  recording original travel (string/overlay.rs:136-156)
- string fill sweep: subject winding only + clip mask shifted to bits
  2-3 (build/string.rs:90-150)
- clip-rule inclusion filters over (clip bits, popcount of subj bits)
  (build/string.rs:155-229)
- clip extraction: greedy polyline assembly consuming FORWARD/BACK
  flags (string/clip.rs:25-121)
- slice extraction: per-side contour walk with nearest-by-angle
  navigation, loop splitting at repeated points, hole binding
  (string/extract.rs:40-236, string/filter.rs, string/split.rs:20-64)

All functions are worker-local kernels — a Ray pipeline calls them per
row/pair inside ``map_batches``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .extract import (Links, _left_bottom_segment, build_links,
                      connect_nodes, join_holes)
from .kernel import (EVEN_ODD, FILL_RULE_NAMES, SUBJ_BOTH, SUBJ_BOTTOM,
                     SUBJ_TOP, Segments, bottom_windings, contour_to_edges,
                     split_segments)

Point = Tuple[int, int]

# direction bits on the merged-segment clip mask (segm/string.rs:11-12)
STRING_BACK = 0b01    # line travels in normalized (a < b) direction
STRING_FORWARD = 0b10  # line travels against normalized direction
# same bits shifted into the fill byte (string/clip.rs:124-126)
CLIP_BACK_F = STRING_BACK << 2
CLIP_FWD_F = STRING_FORWARD << 2
CLIP_ALL_F = CLIP_BACK_F | CLIP_FWD_F


def _as_fill_rule(fill_rule) -> int:
    if isinstance(fill_rule, str):
        return FILL_RULE_NAMES[fill_rule.lower().replace("_", "")]
    return int(fill_rule)


# ---------------------------------------------------------------------------
# Segment building (string/overlay.rs:96-215)
# ---------------------------------------------------------------------------

def build_string_segments(shape_contours: Sequence, string_paths: Sequence,
                          string_contours: Sequence = (),
                          preserve_collinear: bool = False) -> Segments:
    """Subject polygon contours + open polylines -> string segment table.

    Subject edges carry subj=+-1 (as boolean); each polyline edge a->b is
    normalized and tagged BACK when a < b (travel == normalized order)
    else FORWARD (string/overlay.rs:136-156).
    """
    ax, ay, bx, by, subj, clip = [], [], [], [], [], []

    for contour in shape_contours:
        for (p, q) in contour_to_edges(contour, preserve_collinear):
            if p < q:
                a, b, w = p, q, 1
            else:
                a, b, w = q, p, -1
            ax.append(a[0]); ay.append(a[1])
            bx.append(b[0]); by.append(b[1])
            subj.append(w); clip.append(0)

    def add_line(p: Point, q: Point) -> None:
        if p == q:
            return
        if p < q:
            a, b, mask = p, q, STRING_BACK
        else:
            a, b, mask = q, p, STRING_FORWARD
        ax.append(a[0]); ay.append(a[1])
        bx.append(b[0]); by.append(b[1])
        subj.append(0); clip.append(mask)

    for path in string_paths:
        pts = [tuple(p) for p in path]
        for i in range(1, len(pts)):
            add_line(pts[i - 1], pts[i])
    for contour in string_contours:
        pts = [tuple(p) for p in contour]
        if len(pts) >= 2:
            prev = pts[-1]
            for p in pts:
                add_line(prev, p)
                prev = p

    segs = Segments(ax, ay, bx, by, subj, clip)
    from .kernel import check_coords
    check_coords(segs.ax, segs.ay, segs.bx, segs.by)
    return segs


# ---------------------------------------------------------------------------
# String fill (build/string.rs:90-150)
# ---------------------------------------------------------------------------

def compute_string_fills(segs: Segments, fill_rule: int) -> np.ndarray:
    """fill byte = subj_top | subj_bot << 1 | clip_mask << 2; winding is
    over subject edges only."""
    n = len(segs)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    bot_subj, _ = bottom_windings(segs, with_clip=False)
    top_subj = bot_subj + segs.subj
    if fill_rule == EVEN_ODD:
        st = top_subj & 1
        sb = bot_subj & 1
    elif fill_rule == 1:  # NON_ZERO
        st = top_subj != 0
        sb = bot_subj != 0
    elif fill_rule == 2:  # POSITIVE
        st = top_subj > 0
        sb = bot_subj > 0
    else:  # NEGATIVE
        st = top_subj < 0
        sb = bot_subj < 0
    return (np.asarray(st, np.uint8) | (np.asarray(sb, np.uint8) << 1) |
            (segs.clip.astype(np.uint8) << 2))


# ---------------------------------------------------------------------------
# Clip-rule inclusion filters (build/string.rs:155-229)
# ---------------------------------------------------------------------------

def clip_include_mask(fills: np.ndarray, invert: bool,
                      boundary_included: bool) -> np.ndarray:
    has_clip = (fills & CLIP_ALL_F) != 0
    subj_bits = fills & SUBJ_BOTH
    pop = ((subj_bits & 1) + (subj_bits >> 1)).astype(np.uint8)
    if not invert and not boundary_included:
        return has_clip & (pop == 2)
    if not invert and boundary_included:
        return has_clip & (pop >= 1)
    if invert and not boundary_included:
        return has_clip & (pop < 2)
    return has_clip & (pop == 0)


# ---------------------------------------------------------------------------
# Clip extraction (string/clip.rs:25-121)
# ---------------------------------------------------------------------------

def _clip_walk(links: Links) -> List[List[Point]]:
    """Assemble clipped polylines by consuming FORWARD/BACK flags."""
    fills = links.fill  # mutated in place
    paths: List[List[Point]] = []
    n = len(links)
    li = 0
    while li < n:
        if fills[li] & CLIP_ALL_F == 0:
            li += 1
            continue
        # visit(): prefer consuming the BACK flag; else consume the link
        # entirely (string/clip.rs:111-120)
        if fills[li] & CLIP_BACK_F:
            fills[li] &= ~CLIP_BACK_F
            is_out = True
        else:
            fills[li] = 0
            is_out = False
        sub = [links.a[li], links.b[li]]
        a_id = links.b_id[li]
        a_pt = links.b[li]
        while True:
            nxt = _find_next_point(links, fills, a_id, a_pt, is_out)
            if nxt is None:
                break
            a_id, a_pt = nxt
            sub.append(a_pt)
        if not is_out:
            sub.reverse()
        paths.append(sub)
    return paths


def _find_next_point(links: Links, fills, a_id: int, a_pt: Point,
                     is_out: bool) -> Optional[Tuple[int, Point]]:
    for index in links.nodes[a_id]:
        if links.a_id[index] == a_id:
            b_id, b_pt = links.b_id[index], links.b[index]
        else:
            b_id, b_pt = links.a_id[index], links.a[index]
        is_forward = is_out == (a_pt > b_pt)
        if is_forward:
            if fills[index] & CLIP_FWD_F:
                fills[index] &= ~CLIP_FWD_F
                return b_id, b_pt
        else:
            if fills[index] & CLIP_BACK_F:
                fills[index] &= ~CLIP_BACK_F
                return b_id, b_pt
    return None


# ---------------------------------------------------------------------------
# Slice extraction (string/extract.rs:40-236, string/filter.rs)
# ---------------------------------------------------------------------------

def _visit_fill(links: Links, fill: int, i: int, node_id: int,
                clockwise: bool) -> int:
    is_a = links.a_id[i] == node_id
    direct = links.a[i] < links.b[i]
    same = clockwise == direct
    if is_a:
        mask = SUBJ_TOP if same else SUBJ_BOTTOM
    else:
        mask = SUBJ_BOTTOM if same else SUBJ_TOP
    return fill & ~mask


def _is_move_possible(links: Links, fill: int, i: int, node_id: int,
                      clockwise: bool) -> bool:
    if fill == SUBJ_BOTH:
        return True
    if fill == 0:
        return False
    is_a = links.a_id[i] == node_id
    direct = links.a[i] < links.b[i]
    left = (fill & SUBJ_TOP != 0) if direct else (fill & SUBJ_BOTTOM != 0)
    return is_a == (clockwise == left)


def _other_point(links: Links, i: int, node_id: int) -> Point:
    return links.b[i] if links.a_id[i] == node_id else links.a[i]


def _find_nearest_link_to(links: Links, fills, target_index: int,
                          node_id: int, clockwise: bool) -> int:
    """NearestVector selection among movable links (string/extract.rs
    129-236, core/nearest_vector.rs)."""
    indices = links.nodes[node_id]
    first_index = -1
    second_index = -1
    pos = 0
    for i, li in enumerate(indices):
        if li == target_index:
            continue
        if _is_move_possible(links, fills[li], li, node_id, clockwise):
            if first_index < 0:
                first_index = li
            else:
                second_index = li
                pos = i
                break

    if first_index < 0:
        if _is_move_possible(links, fills[target_index], target_index,
                             node_id, clockwise):
            return target_index
        raise RuntimeError("no move found in slice walk")
    if second_index < 0:
        return first_index

    if links.a_id[target_index] == node_id:
        c = links.a[target_index]
        a = links.b[target_index]
    else:
        c = links.b[target_index]
        a = links.a[target_index]

    vax = a[0] - c[0]
    vay = a[1] - c[1]
    b = _other_point(links, first_index, node_id)
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

    add(_other_point(links, second_index, node_id), second_index)
    for li in indices[pos + 1:]:
        if _is_move_possible(links, fills[li], li, node_id, clockwise):
            add(_other_point(links, li, node_id), li)
    return best_id


def _get_path(links: Links, fills, start: int, clockwise: bool) -> List[Point]:
    link_id = start
    node_id = links.b_id[start]
    last = links.a_id[start]
    path = [links.a[start]]
    fills[start] = _visit_fill(links, fills[start], start,
                               links.a_id[start], clockwise)
    while node_id != last:
        link_id = _find_nearest_link_to(links, fills, link_id, node_id,
                                        clockwise)
        fills[link_id] = _visit_fill(links, fills[link_id], link_id,
                                     node_id, clockwise)
        if links.a_id[link_id] == node_id:
            path.append(links.a[link_id])
            node_id = links.b_id[link_id]
        else:
            path.append(links.b[link_id])
            node_id = links.a_id[link_id]
    return path


def _area2(ring: List[Point]) -> int:
    s = 0
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i - 1]
        x1, y1 = ring[i]
        s += x0 * y1 - x1 * y0
    return s


def _split_loops(path: List[Point], min_area: int) -> List[List[Point]]:
    """Split a self-touching walk into simple loops at repeated points
    (string/split.rs:20-64; BinStore positions intentionally stale after
    a split, mirroring the reference)."""
    if not path:
        return []
    store: dict = {}
    buf: List[Point] = []
    result: List[List[Point]] = []
    for p in path:
        pos = store.setdefault(p, len(buf) + 1)
        if pos < len(buf):
            tail = buf[pos:]
            del buf[pos:]
            if len(tail) >= 2:
                tail.append(p)
                if (abs(_area2(tail)) >> 1) >= min_area:
                    result.append(tail)
        else:
            buf.append(p)
    if len(buf) > 2:
        result.append(buf)
    return result


def _is_clockwise_ordered(ring: List[Point]) -> bool:
    return _area2(ring) < 0


def slice_extract(links: Links, clockwise: bool = False,
                  min_area: int = 0) -> List[list]:
    """StringRule::Slice shape extraction over the full link graph."""
    n = len(links)
    fills = [int(f) & SUBJ_BOTH for f in links.fill]
    shapes: List[list] = []
    holes: List[List[Point]] = []
    li = 0
    while li < n:
        fill = fills[li]
        if fill == 0:
            li += 1
            continue
        direction = (fill & SUBJ_TOP) == SUBJ_TOP
        walk = _get_path(links, fills, li, direction)
        for ring in _split_loops(walk, min_area):
            order = _is_clockwise_ordered(ring)
            is_hole = order == direction
            if is_hole:
                if clockwise == order:
                    ring.reverse()
                holes.append(ring)
            else:
                if clockwise != order:
                    ring.reverse()
                shapes.append([ring])
    anchors = [(_left_bottom_segment(h), ("hole", i))
               for i, h in enumerate(holes)]
    join_holes(shapes, holes, anchors, clockwise, anchors_sorted=False)
    return shapes


# ---------------------------------------------------------------------------
# Public API (string/clip.rs IntClip, string/slice.rs IntSlice)
# ---------------------------------------------------------------------------

def clip_paths(shape_contours: Sequence, string_paths: Sequence,
               fill_rule="evenodd", invert: bool = False,
               boundary_included: bool = False) -> List[List[Point]]:
    """Clip open polylines by a polygon region; returns the kept pieces
    (inside by default; outside when ``invert``)."""
    fr = _as_fill_rule(fill_rule)
    segs = build_string_segments(shape_contours, string_paths)
    segs = split_segments(segs, string_clip=True)
    if len(segs) == 0:
        return []
    fills = compute_string_fills(segs, fr)
    mask = clip_include_mask(fills, invert, boundary_included)
    links = build_links(segs, fills, mask)
    connect_nodes(links)
    return _clip_walk(links)


def clip_paths_pack(jobs: Sequence[tuple], fill_rule="evenodd",
                    boundary_included: bool = False) -> list:
    """Clip MANY small (shape_contours, string_paths) jobs in ONE string
    split/fill pass (x-band packing, see overlay.overlay_pack). Returns
    per job a pair (inside_paths, outside_paths) — both invert variants
    from the same fills, two link walks."""
    fr = _as_fill_rule(fill_rule)
    n_jobs = len(jobs)
    if n_jobs == 0:
        return []
    spans, mins = [], []
    for shape, paths in jobs:
        xs = [p[0] for cs in (shape, paths) for c in cs for p in c]
        spans.append((max(xs) - min(xs)) if xs else 0)
        mins.append(min(xs) if xs else 0)
    margin = 4
    stride = 1 << max(1, (max(spans) + 2 * margin)).bit_length()
    if stride * n_jobs >= (1 << 29):
        mid = max(1, n_jobs // 2)
        if mid == n_jobs:
            raise ValueError("single job exceeds the coordinate range")
        return (clip_paths_pack(jobs[:mid], fill_rule, boundary_included) +
                clip_paths_pack(jobs[mid:], fill_rule, boundary_included))

    all_shape, all_paths = [], []
    for k, (shape, paths) in enumerate(jobs):
        dx = k * stride + margin - mins[k]
        all_shape.extend([[(x + dx, y) for x, y in c] for c in shape])
        all_paths.extend([[(x + dx, y) for x, y in c] for c in paths])

    segs = build_string_segments(all_shape, all_paths)
    segs = split_segments(segs, string_clip=True)
    out = [([], []) for _ in range(n_jobs)]
    if len(segs) == 0:
        return out
    fills = compute_string_fills(segs, fr)
    for slot, invert in ((0, False), (1, True)):
        mask = clip_include_mask(fills, invert, boundary_included)
        links = build_links(segs, fills.copy(), mask)
        connect_nodes(links)
        for path in _clip_walk(links):
            k = path[0][0] // stride
            dx = k * stride + margin - mins[k]
            out[k][slot].append([(x - dx, y) for x, y in path])
    return out


def slice_by_paths(shape_contours: Sequence, string_paths: Sequence,
                   fill_rule="evenodd", clockwise: bool = False,
                   min_area: int = 0) -> List[list]:
    """Cut polygon(s) into pieces along open polylines; returns
    shapes-with-holes like ``overlay``."""
    fr = _as_fill_rule(fill_rule)
    segs = build_string_segments(shape_contours, string_paths)
    segs = split_segments(segs, string_clip=True)
    if len(segs) == 0:
        return []
    fills = compute_string_fills(segs, fr)
    mask = np.ones(len(segs), dtype=bool)
    links = build_links(segs, fills, mask)
    connect_nodes(links)
    return slice_extract(links, clockwise, min_area)
