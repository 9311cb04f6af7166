"""Tile-distributed boolean overlay with cross-strip chain stitching.

The full distributed regime from SURVEY.md §7 step 4: both input
multipolygons are FRAGMENTED at x-strip borders, every strip resolves
its own intersections and fills locally (fragmentation makes the
winding stab strip-local — every edge whose half-open x-span covers a
point lives in that point's strip), and each strip emits its piece of
the result boundary as ORIENTED CHAINS cut at the borders. A final
stitch pass — tiny compared to the input — joins chains across strips
into closed rings.

Key invariants making per-strip work exact:
- crossings strictly inside a strip involve only that strip's
  fragments; crossings exactly on a border are fragment ENDPOINTS on
  both sides (no split needed);
- a vertical edge lying on a border belongs to the RIGHT strip (the
  half-open [ax, bx) cover rule means only right-strip edges cover
  that x);
- every included boundary segment is oriented REGION-ON-LEFT
  (is_fill_top -> travel +x), so stitched rings come out CCW for
  hulls and CW for holes.

Exactness: bit-parity with the single kernel holds for rectilinear
geometry and slope +-1 edges (border cuts land exactly on the lines).
For arbitrary slopes a border cut floor-rounds onto the grid, so the
distributed boundary deviates from the single-kernel edge by < 1 grid
unit along each border crossing (and a half-integer crossing tie may
snap one cell differently) — the region symmetric difference is
bounded by ~1 cell per border/crossing event. Full bit-parity needs
the reference's architecture of applying split marks to PARENT
segments with a cross-strip mark shuffle per snap round
(split/solver_fragment.rs:152-178; flagged in SURVEY.md section 7.3)
— a round-2 item (see NOTES.md).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .extract import join_holes, _left_bottom_segment
from .kernel import (RULE_NAMES, FILL_RULE_NAMES, Segments, compute_fills,
                     is_fill_top, rule_include_mask, sort_merge,
                     split_segments, contour_to_edges)

Point = Tuple[int, int]


def fragment_contours(contours: Sequence, role_subj: bool, strip_w: int):
    """Contours -> fragment rows (strip, ax, ay, bx, by, subj, clip),
    direction-normalized with winding sign, split at strip borders."""
    rows = []
    for contour in contours:
        for (p, q) in contour_to_edges(contour, False):
            if p < q:
                a, b, w = p, q, 1
            else:
                a, b, w = q, p, -1
            if a[0] == b[0]:
                # vertical: belongs to the strip it covers; on a border
                # line it goes RIGHT (half-open cover rule)
                s = a[0] // strip_w
                rows.append((s, a, b, w))
                continue
            s0 = a[0] // strip_w
            s1 = (b[0] - 1) // strip_w
            prev = a
            for s in range(s0, s1 + 1):
                border = (s + 1) * strip_w
                if border >= b[0]:
                    cut = b
                else:
                    # exact rational y at the border, floor-rounded:
                    # the same cut point on both sides by construction
                    num = (b[1] - a[1]) * (border - a[0])
                    den = b[0] - a[0]
                    cut = (border, a[1] + num // den)
                rows.append((s, prev, cut, w))
                prev = cut
    out = []
    for s, a, b, w in rows:
        if a == b:
            continue
        out.append((s, a[0], a[1], b[0], b[1],
                    w if role_subj else 0, 0 if role_subj else w))
    return out


def strip_chains(fragments: List[tuple], rule: int, fill_rule: int,
                 strip_w: int, strip: int):
    """One strip's kernel: split + fill + rule filter + oriented chain
    extraction. Returns (closed_rings, chains); chains are point lists
    whose first/last points lie on this strip's borders."""
    segs = Segments([f[1] for f in fragments], [f[2] for f in fragments],
                    [f[3] for f in fragments], [f[4] for f in fragments],
                    [f[5] for f in fragments], [f[6] for f in fragments])
    segs = split_segments(segs)
    if len(segs) == 0:
        return [], []
    fills = compute_fills(segs, fill_rule)
    mask = rule_include_mask(fills, rule)
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return [], []

    # orient region-on-left: fill above -> travel a->b (+x), else b->a
    edges: List[Tuple[Point, Point]] = []
    for i in idx.tolist():
        a = (int(segs.ax[i]), int(segs.ay[i]))
        b = (int(segs.bx[i]), int(segs.by[i]))
        if is_fill_top(int(fills[i]), rule):
            edges.append((a, b))
        else:
            edges.append((b, a))

    # successor selection at shared points: leftmost turn keeps the
    # region on the left through junctions
    outgoing: Dict[Point, List[int]] = {}
    for ei, (t, h) in enumerate(edges):
        outgoing.setdefault(t, []).append(ei)

    def pick_successor(ei: int) -> int | None:
        t, h = edges[ei]
        cands = [c for c in outgoing.get(h, []) if not used[c]]
        if not cands:
            return None
        if len(cands) == 1:
            return cands[0]
        # most counterclockwise from the reversed incoming direction
        vix, viy = t[0] - h[0], t[1] - h[1]  # reversed incoming

        def angle_key(c):
            w = edges[c][1]
            vx, vy = w[0] - h[0], w[1] - h[1]
            cross = vix * vy - viy * vx
            dot = vix * vx + viy * vy
            import math
            ang = math.atan2(cross, dot)
            if ang <= 0:
                ang += 2 * math.pi
            return ang  # smallest positive CCW angle = sharpest left turn

        return min(cands, key=angle_key)

    lo = strip * strip_w
    hi = (strip + 1) * strip_w

    def on_border(p: Point) -> bool:
        return p[0] == lo or p[0] == hi

    n = len(edges)
    used = [False] * n
    rings: List[List[Point]] = []
    chains: List[List[Point]] = []

    # chains first: start at border tails
    for start in range(n):
        if used[start] or not on_border(edges[start][0]):
            continue
        path = [edges[start][0], edges[start][1]]
        used[start] = True
        cur = start
        while True:
            if on_border(edges[cur][1]):
                break
            nxt = pick_successor(cur)
            if nxt is None:
                break
            used[nxt] = True
            path.append(edges[nxt][1])
            cur = nxt
        chains.append(path)

    # leftover edges form closed rings wholly inside the strip
    for start in range(n):
        if used[start]:
            continue
        path = [edges[start][0]]
        used[start] = True
        cur = start
        while edges[cur][1] != path[0]:
            path.append(edges[cur][1])
            nxt = pick_successor(cur)
            if nxt is None:
                break
            used[nxt] = True
            cur = nxt
        rings.append(path)
    return rings, chains


def stitch_chains(chains: List[List[Point]]) -> List[List[Point]]:
    """Join border-cut chains into closed rings by matching endpoints
    (the groupby-on-border-point shuffle, run over the SMALL chain set)."""
    by_tail: Dict[Point, List[int]] = {}
    for ci, ch in enumerate(chains):
        by_tail.setdefault(ch[0], []).append(ci)
    used = [False] * len(chains)
    rings = []
    for start in range(len(chains)):
        if used[start]:
            continue
        used[start] = True
        ring = list(chains[start])
        while ring[-1] != ring[0]:
            cands = [c for c in by_tail.get(ring[-1], []) if not used[c]]
            if not cands:
                break
            nxt = cands[0]
            if len(cands) > 1:
                # junction on a border: sharpest left turn continues the
                # same face
                import math
                hx, hy = ring[-1]
                vix, viy = ring[-2][0] - hx, ring[-2][1] - hy

                def angle_key(c):
                    wx, wy = chains[c][1]
                    vx, vy = wx - hx, wy - hy
                    cross = vix * vy - viy * vx
                    dot = vix * vx + viy * vy
                    ang = math.atan2(cross, dot)
                    if ang <= 0:
                        ang += 2 * math.pi
                    return ang

                nxt = min(cands, key=angle_key)
            used[nxt] = True
            ring.extend(chains[nxt][1:])
        if ring[-1] == ring[0]:
            rings.append(ring[:-1])
    return rings


def _ring_area2(ring: List[Point]) -> int:
    s = 0
    for i in range(len(ring)):
        x0, y0 = ring[i - 1]
        x1, y1 = ring[i]
        s += x0 * y1 - x1 * y0
    return s


def assemble_shapes(rings: List[List[Point]]) -> List[list]:
    """CCW rings are hulls, CW rings are holes (region-on-left
    orientation); bind holes to hulls with the scan-line join."""
    shapes: List[list] = []
    holes: List[List[Point]] = []
    for ring in rings:
        if len(ring) < 3:
            continue
        if _ring_area2(ring) > 0:
            shapes.append([ring])
        else:
            holes.append(ring)
    anchors = [(_left_bottom_segment(h), ("hole", i))
               for i, h in enumerate(holes)]
    join_holes(shapes, holes, anchors, clockwise=False,
               anchors_sorted=False)
    return shapes


def tiled_overlay(subj: Sequence, clip: Sequence, rule, fill_rule,
                  strip_w: int = 256) -> List[list]:
    """Worker-local reference implementation of the strip pipeline (the
    Ray version runs strip_chains inside groupby(strip).map_groups —
    pipelines/tiled_overlay.py)."""
    if isinstance(rule, str):
        rule = RULE_NAMES[rule.lower()]
    if isinstance(fill_rule, str):
        fill_rule = FILL_RULE_NAMES[fill_rule.lower().replace("_", "")]
    frags = fragment_contours(subj, True, strip_w) + \
        fragment_contours(clip, False, strip_w)
    by_strip: Dict[int, list] = {}
    for f in frags:
        by_strip.setdefault(f[0], []).append(f)
    rings: List[List[Point]] = []
    chains: List[List[Point]] = []
    for s, fs in sorted(by_strip.items()):
        r, c = strip_chains(fs, rule, fill_rule, strip_w, s)
        rings.extend(r)
        chains.extend(c)
    rings.extend(stitch_chains(chains))
    return assemble_shapes(rings)
