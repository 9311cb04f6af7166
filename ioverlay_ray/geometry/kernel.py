"""Integer polygon boolean-overlay kernel (numpy + exact int arithmetic).

A from-scratch Python/numpy re-expression of the iOverlay algorithm
pipeline: segment build -> sort/merge -> iterative snap-rounding split ->
winding fill -> rule filter -> graph walk extraction -> hole binding.

Semantics follow the reference (cited per function as file:line into
/root/reference/iOverlay) so results match its golden fixtures
row-for-row, but the execution strategy is different: columnar numpy
arrays (SoA) everywhere, vectorized pair classification, and a
stab-based winding fill that replaces the sequential sweep with a
vectorizable computation (valid because after the split phase segment
interiors contain no endpoints or crossings, so the winding immediately
below a segment is constant along it).

Coordinates are int64 and must satisfy |c| < 2^30 (mirrors the exact
cross-point bound, split/cross_solver.rs:221-222); vectorized paths
additionally assume |c| <= 2^29 so int64 intermediates cannot overflow.

The segments table is SoA: ax, ay, bx, by (int64), subj, clip (int64),
direction-normalized a < b lexicographically (segm/segment.rs:27-55).
"""

from __future__ import annotations

import itertools
from typing import Iterable, Sequence

import numpy as np

MAX_COORD = (1 << 30) - 1  # |c| < 2^30: the reference's exact-math bound
# (split/cross_solver.rs:221-222). At this bound every vectorized int64
# intermediate in this kernel stays safe: orientation signs are
# (<2^31)x(<2^31) < 2^62, and the doubled-midpoint winding stab peaks at
# (2^31-1)x(2^32-2) < 2^63-1. Enforced at the segment-build entry
# points, mirroring the reference's checked adapter/engine bounds
# (float/scale.rs:14-47).


def check_coords(*arrays) -> None:
    """Raise if any coordinate magnitude exceeds MAX_COORD."""
    for arr in arrays:
        a = np.asarray(arr, dtype=np.int64)
        if len(a) and int(np.abs(a).max()) > MAX_COORD:
            raise ValueError(
                f"coordinate magnitude {int(np.abs(a).max())} exceeds the "
                f"kernel safe bound {MAX_COORD} (< 2^30); quantize with a "
                f"smaller scale")

SUBJ_TOP = 1
SUBJ_BOTTOM = 2
CLIP_TOP = 4
CLIP_BOTTOM = 8
SUBJ_BOTH = SUBJ_TOP | SUBJ_BOTTOM
CLIP_BOTH = CLIP_TOP | CLIP_BOTTOM
BOTH_TOP = SUBJ_TOP | CLIP_TOP
BOTH_BOTTOM = SUBJ_BOTTOM | CLIP_BOTTOM
ALL = SUBJ_BOTH | CLIP_BOTH

# fill rules
EVEN_ODD = 0
NON_ZERO = 1
POSITIVE = 2
NEGATIVE = 3

FILL_RULE_NAMES = {"evenodd": EVEN_ODD, "nonzero": NON_ZERO,
                   "positive": POSITIVE, "negative": NEGATIVE}

# overlay rules
SUBJECT = 0
CLIP = 1
INTERSECT = 2
UNION = 3
DIFFERENCE = 4
INVERSE_DIFFERENCE = 5
XOR = 6

RULE_NAMES = {
    "subject": SUBJECT, "clip": CLIP, "intersect": INTERSECT,
    "union": UNION, "difference": DIFFERENCE,
    "inversedifference": INVERSE_DIFFERENCE, "inverse_difference": INVERSE_DIFFERENCE,
    "xor": XOR,
}


class Segments:
    """SoA segment table with winding counts (Segment<ShapeCountBoolean>)."""

    __slots__ = ("ax", "ay", "bx", "by", "subj", "clip")

    def __init__(self, ax, ay, bx, by, subj, clip):
        self.ax = np.asarray(ax, dtype=np.int64)
        self.ay = np.asarray(ay, dtype=np.int64)
        self.bx = np.asarray(bx, dtype=np.int64)
        self.by = np.asarray(by, dtype=np.int64)
        self.subj = np.asarray(subj, dtype=np.int64)
        self.clip = np.asarray(clip, dtype=np.int64)

    def __len__(self):
        return len(self.ax)

    @staticmethod
    def empty() -> "Segments":
        z = np.zeros(0, dtype=np.int64)
        return Segments(z, z, z, z, z, z)

    @staticmethod
    def concat(parts: Sequence["Segments"]) -> "Segments":
        parts = [p for p in parts if len(p)]
        if not parts:
            return Segments.empty()
        return Segments(*[np.concatenate([getattr(p, f) for p in parts])
                          for f in Segments.__slots__])

    def take(self, idx) -> "Segments":
        return Segments(*[getattr(self, f)[idx] for f in Segments.__slots__])


# ---------------------------------------------------------------------------
# Segment building (segm/build.rs:10-146)
# ---------------------------------------------------------------------------

def _include_point(p0, p1, p2, keep_same_line: bool) -> bool:
    """PointFilter semantics (segm/build.rs:104-127)."""
    ax = p1[0] - p0[0]
    ay = p1[1] - p0[1]
    bx = p1[0] - p2[0]
    by = p1[1] - p2[1]
    cross = ax * by - ay * bx
    if cross != 0:
        return True
    if not keep_same_line:
        return False
    return ax * bx + ay * by < 0  # collinear: keep only direction reversals


def contour_to_edges(points: Iterable[tuple], keep_same_line: bool) -> list:
    """Closed contour -> directed edge list, dropping degenerate and
    (optionally) collinear points. One cyclic pass with running previous
    kept point, mirroring build_segments_with_filter (segm/build.rs:35-95).

    Returns list of ((x0,y0),(x1,y1)) directed edges.
    """
    it = iter(points)
    p0 = next(it, None)
    if p0 is None:
        return []
    p0 = tuple(p0)
    p1 = None
    for p in it:
        p = tuple(p)
        if p != p0:
            p1 = p
            break
    if p1 is None:
        return []

    q0 = p0
    for p2 in it:
        p2 = tuple(p2)
        if _include_point(p0, p1, p2, keep_same_line):
            p0, p1 = p1, p2
            break
        p1 = p2
    q1 = p0

    edges = []
    for p2 in itertools.chain((tuple(p) for p in it), (q0, q1)):
        if not _include_point(p0, p1, p2, keep_same_line):
            p1 = p2
            continue
        edges.append((p0, p1))
        p0, p1 = p1, p2

    if p1 != p0:
        edges.append((p0, p1))
    return edges


def build_segments(subj_contours: Sequence, clip_contours: Sequence,
                   preserve_collinear: bool = False) -> Segments:
    """Contours -> direction-normalized winding segments.

    Subject edges carry subj=+-1, clip edges clip=+-1; an edge stored
    reversed (to keep a < b) flips the sign (segm/segment.rs:58-81).
    """
    ax, ay, bx, by, subj, clip = [], [], [], [], [], []
    for contours, is_subj in ((subj_contours, True), (clip_contours, False)):
        for contour in contours:
            for (p, q) in contour_to_edges(contour, preserve_collinear):
                if p < q:
                    a, b, w = p, q, 1
                else:
                    a, b, w = q, p, -1
                ax.append(a[0]); ay.append(a[1])
                bx.append(b[0]); by.append(b[1])
                if is_subj:
                    subj.append(w); clip.append(0)
                else:
                    subj.append(0); clip.append(w)
    segs = Segments(ax, ay, bx, by, subj, clip)
    check_coords(segs.ax, segs.ay, segs.bx, segs.by)
    return segs


# ---------------------------------------------------------------------------
# Sort + merge (segm/sort.rs, segm/merge.rs:26-87)
# ---------------------------------------------------------------------------

def sort_merge(segs: Segments, string_clip: bool = False) -> Segments:
    """Sort by (a, b), merge identical edges by summing winding counts,
    drop zero-count edges (the exact-dedup aggregate).

    ``string_clip`` switches the clip column to the polyline bitmask
    algebra (ShapeCountString, segm/string.rs:69-75): merge ORs the
    FORWARD/BACK direction bits instead of summing.
    """
    n = len(segs)
    if n == 0:
        return segs
    order = np.lexsort((segs.by, segs.bx, segs.ay, segs.ax))
    s = segs.take(order)
    if n == 1:
        return s
    same = ((s.ax[1:] == s.ax[:-1]) & (s.ay[1:] == s.ay[:-1]) &
            (s.bx[1:] == s.bx[:-1]) & (s.by[1:] == s.by[:-1]))
    if not same.any():
        return s
    starts = np.flatnonzero(np.concatenate(([True], ~same)))
    subj = np.add.reduceat(s.subj, starts)
    if string_clip:
        clip = np.bitwise_or.reduceat(s.clip, starts)
    else:
        clip = np.add.reduceat(s.clip, starts)
    keep = (subj != 0) | (clip != 0)
    g = starts[keep]
    return Segments(s.ax[g], s.ay[g], s.bx[g], s.by[g], subj[keep], clip[keep])


# ---------------------------------------------------------------------------
# Cross solver (split/cross_solver.rs:76-311)
# ---------------------------------------------------------------------------

def _divide_round(num: int, den: int) -> int:
    """Unsigned divide with round-half-up on magnitude
    (UIntProduct::divide_with_rounding semantics)."""
    return (num + (den >> 1)) // den


def _cross_point(tax, tay, tbx, tby, oax, oay, obx, oby):
    """Exact rational intersection of two non-parallel segments, rounded
    to the integer grid (split/cross_solver.rs:219-311).

    Offset approach: translate by -target.a so intermediates stay narrow;
    wide products handled by Python arbitrary-precision ints.
    """
    a1x = tbx - tax
    b0x = oax - tax
    b1x = obx - tax
    a1y = tby - tay
    b0y = oay - tay
    b1y = oby - tay

    dy_b = b0y - b1y
    dx_b = b0x - b1x
    xy_b = b0x * b1y - b0y * b1x

    if a1x == 0:
        x0 = 0
        # Rust integer division truncates toward zero
        q, r = divmod(abs(xy_b), abs(dx_b))
        y0 = q if (xy_b >= 0) == (dx_b >= 0) else -q
    elif a1y == 0:
        y0 = 0
        q, r = divmod(abs(xy_b), abs(dy_b))
        x0 = -(q if (xy_b >= 0) == (dy_b >= 0) else -q)
    else:
        div = a1y * dx_b - a1x * dy_b
        s = (1 if div > 0 else -1 if div < 0 else 0) * \
            (1 if xy_b > 0 else -1 if xy_b < 0 else 0)
        sx = (1 if a1x > 0 else -1) * s
        sy = (1 if a1y > 0 else -1) * s
        uxy_b = abs(xy_b)
        udiv = abs(div)
        ux = _divide_round(abs(a1x) * uxy_b, udiv)
        uy = _divide_round(abs(a1y) * uxy_b, udiv)
        x0 = sx * ux
        y0 = sy * uy

    return x0 + tax, y0 + tay


def _is_line(ax, ay, bx, by, cx, cy) -> bool:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) == 0


def _middle_cross(t, o, radius):
    """Pure middle crossing with snap-to-end rounding
    (split/cross_solver.rs:164-217).

    t, o: ((ax,ay),(bx,by)) python-int tuples.
    Returns (cross_type, point, is_round) with cross_type in
    {"pure","target_end","other_end"}.
    """
    (tax, tay), (tbx, tby) = t
    (oax, oay), (obx, oby) = o
    px, py = _cross_point(tax, tay, tbx, tby, oax, oay, obx, oby)

    if _is_line(tax, tay, px, py, tbx, tby) and _is_line(oax, oay, px, py, obx, oby):
        return "pure", (px, py), False

    # rounding moved the point off one of the lines: maybe snap to an end
    ra0 = (tax - px) ** 2 + (tay - py) ** 2
    rb0 = (tbx - px) ** 2 + (tby - py) ** 2
    ra1 = (oax - px) ** 2 + (oay - py) ** 2
    rb1 = (obx - px) ** 2 + (oby - py) ** 2

    if ra0 <= radius or ra1 <= radius or rb0 <= radius or rb1 <= radius:
        r0 = min(ra0, rb0)
        r1 = min(ra1, rb1)
        if r0 <= r1:
            p = (tax, tay) if ra0 < rb0 else (tbx, tby)
            if not _is_line(oax, oay, p[0], p[1], obx, oby):
                return "target_end", p, True
        else:
            p = (oax, oay) if ra1 < rb1 else (obx, oby)
            if not _is_line(tax, tay, p[0], p[1], tbx, tby):
                return "other_end", p, True

    return "pure", (px, py), True


# ---------------------------------------------------------------------------
# Split: iterate until no snap-rounding occurred (split/solver.rs,
# split/solver_list.rs:14-67, split/snap_radius.rs:5-27)
# ---------------------------------------------------------------------------

PAIR_BLOCK = 4_000_000  # max candidate pairs materialized at once


def _candidate_pair_blocks(segs: Segments):
    """Yield (i, j>i) candidate-pair blocks with x-overlap (sorted by a)
    and y-range overlap. Mirrors the list-split pruning
    (split/solver_list.rs:33-44); blocks bound peak memory so one dense
    tile can't blow up a worker (the 100TB-regime guard)."""
    n = len(segs)
    # segments sorted by (a, b); pair window: j while a_j.x <= b_i.x
    j_end = np.searchsorted(segs.ax, segs.bx, side="right")
    counts = np.maximum(j_end - np.arange(1, n + 1), 0)
    if int(counts.sum()) == 0:
        return

    ymin_i = np.minimum(segs.ay, segs.by)
    ymax_i = np.maximum(segs.ay, segs.by)
    csum = np.concatenate(([0], np.cumsum(counts)))

    i0 = 0
    while i0 < n:
        # widest i-range whose pair count stays under the block cap
        i1 = int(np.searchsorted(csum, csum[i0] + PAIR_BLOCK, "right")) - 1
        i1 = max(i1, i0 + 1)
        c = counts[i0:i1]
        total = int(c.sum())
        if total == 0:
            i0 = i1
            continue
        ii = np.repeat(np.arange(i0, i1), c)
        offs = (csum[i0:i1] - csum[i0]).astype(np.int64)
        jj = np.arange(total) - np.repeat(offs, c) + ii + 1

        low = ymin_i[ii]
        high = ymax_i[ii]
        ajy = segs.ay[jj]
        bjy = segs.by[jj]
        skip = ((low > ajy) & (low > bjy)) | ((high < ajy) & (high < bjy))
        keep = ~skip
        if keep.any():
            yield ii[keep], jj[keep]
        i0 = i1


def _candidate_pairs(segs: Segments):
    """All candidate pairs at once (small inputs / tests)."""
    blocks = list(_candidate_pair_blocks(segs))
    if not blocks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (np.concatenate([b[0] for b in blocks]),
            np.concatenate([b[1] for b in blocks]))


def _find_marks(segs: Segments, radius: int):
    """Classify all candidate pairs; return split marks and whether any
    rounding occurred (split/solver.rs:82-156).

    Marks are (seg_index, px, py) triples. Pairs are consumed in
    bounded-memory blocks (_candidate_pair_blocks).
    """
    m_idx: list = []
    m_px: list = []
    m_py: list = []
    any_round = False
    for ii, jj in _candidate_pair_blocks(segs):
        r = _classify_pairs(segs, ii, jj, radius, m_idx, m_px, m_py)
        any_round |= r
    return m_idx, m_px, m_py, any_round


def _classify_pairs(segs: Segments, ii, jj, radius: int,
                    m_idx: list, m_px: list, m_py: list) -> bool:

    tax, tay = segs.ax[ii], segs.ay[ii]
    tbx, tby = segs.bx[ii], segs.by[ii]
    oax, oay = segs.ax[jj], segs.ay[jj]
    obx, oby = segs.bx[jj], segs.by[jj]

    # orientation signs (Triangle::clock_direction); int64-safe for |c|<2^30
    ux, uy = tbx - tax, tby - tay
    d1 = np.sign(ux * (oay - tay) - uy * (oax - tax))
    d2 = np.sign(ux * (oby - tay) - uy * (obx - tax))
    vx, vy = obx - oax, oby - oay
    d3 = np.sign(vx * (tay - oay) - vy * (tax - oax))
    d4 = np.sign(vx * (tby - oay) - vy * (tbx - oax))

    z = (d1 == 0).astype(np.int8) + (d2 == 0) + (d3 == 0) + (d4 == 0)
    overlay = z == 4
    not_cross = (d1 == d2) | (d3 == d4)
    skip = (~overlay) & ((z > 1) | not_cross)

    # --- z == 1: an endpoint lies strictly inside the other segment ---
    touch = (~skip) & (~overlay) & (z == 1)
    if touch.any():
        w = np.flatnonzero(touch)
        # other.a on target -> split target (index i) at other.a, etc.
        for zero_d, idx_arr, pxa, pya in (
            (d1, ii, oax, oay), (d2, ii, obx, oby),
            (d3, jj, tax, tay), (d4, jj, tbx, tby),
        ):
            sel = w[zero_d[w] == 0]
            if len(sel):
                m_idx.extend(idx_arr[sel].tolist())
                m_px.extend(pxa[sel].tolist())
                m_py.extend(pya[sel].tolist())

    # --- collinear overlay (split/cross_solver.rs:137-162) ---
    if overlay.any():
        w = np.flatnonzero(overlay)
        v1x = (obx - oax)[w]
        v1y = (oby - oay)[w]

        def dot_sign(pxa, pya, qx, qy):
            return np.sign((pxa - qx) * v1x + (pya - qy) * v1y)

        aa0 = dot_sign(tax[w], tay[w], oax[w], oay[w])
        ab0 = dot_sign(tax[w], tay[w], obx[w], oby[w])
        ba0 = dot_sign(tbx[w], tby[w], oax[w], oay[w])
        bb0 = dot_sign(tbx[w], tby[w], obx[w], oby[w])
        is_ta = (aa0 == -ab0) & (aa0 != 0)   # target.a strictly inside other
        is_tb = (ba0 == -bb0) & (ba0 != 0)
        aa1, ab1 = -aa0, -ba0
        ba1, bb1 = -ab0, -bb0
        is_oa = (aa1 == -ab1) & (aa1 != 0)   # other.a strictly inside target
        is_ob = (ba1 == -bb1) & (ba1 != 0)
        for mask, idx_arr, pxa, pya in (
            (is_ta, jj[w], tax[w], tay[w]), (is_tb, jj[w], tbx[w], tby[w]),
            (is_oa, ii[w], oax[w], oay[w]), (is_ob, ii[w], obx[w], oby[w]),
        ):
            sel = np.flatnonzero(mask)
            if len(sel):
                m_idx.extend(idx_arr[sel].tolist())
                m_px.extend(pxa[sel].tolist())
                m_py.extend(pya[sel].tolist())

    # --- z == 0 strict middle cross: exact rational point + snapping ---
    mid = (~skip) & (z == 0)
    any_round = False
    if mid.any():
        w = np.flatnonzero(mid)
        t_list = np.stack([tax[w], tay[w], tbx[w], tby[w]], axis=1).tolist()
        o_list = np.stack([oax[w], oay[w], obx[w], oby[w]], axis=1).tolist()
        i_list = ii[w].tolist()
        j_list = jj[w].tolist()
        for k in range(len(w)):
            ta, tya, tb, tyb = t_list[k]
            oa, oya, ob, oyb = o_list[k]
            ct, (px, py), is_round = _middle_cross(
                ((ta, tya), (tb, tyb)), ((oa, oya), (ob, oyb)), radius)
            any_round |= is_round
            if ct == "pure":
                m_idx.append(i_list[k]); m_px.append(px); m_py.append(py)
                m_idx.append(j_list[k]); m_px.append(px); m_py.append(py)
            elif ct == "target_end":
                m_idx.append(j_list[k]); m_px.append(px); m_py.append(py)
            else:  # other_end
                m_idx.append(i_list[k]); m_px.append(px); m_py.append(py)

    return any_round


def _apply_marks(segs: Segments, m_idx, m_px, m_py,
                 string_clip: bool = False) -> Segments:
    """Subdivide marked segments at their split points, preserving winding
    counts; re-normalize direction; re-sort + merge
    (split/solver.rs:158-251)."""
    idx = np.asarray(m_idx, dtype=np.int64)
    px = np.asarray(m_px, dtype=np.int64)
    py = np.asarray(m_py, dtype=np.int64)
    order = np.lexsort((py, px, idx))
    idx, px, py = idx[order], px[order], py[order]
    # dedup adjacent identical (index, point)
    if len(idx) > 1:
        dup = (idx[1:] == idx[:-1]) & (px[1:] == px[:-1]) & (py[1:] == py[:-1])
        keep = np.concatenate(([True], ~dup))
        idx, px, py = idx[keep], px[keep], py[keep]

    marked = np.unique(idx)
    marked_set_mask = np.zeros(len(segs), dtype=bool)
    marked_set_mask[marked] = True

    # fast path: segments with exactly ONE strictly-interior mark (the
    # common case by far) subdivide vectorized into two halves with the
    # original counts and no direction flip (a < p < b along a
    # normalized segment)
    fast_segs = None
    if len(idx):
        counts = np.bincount(idx, minlength=len(segs))
        one = counts[idx] == 1
        if one.any():
            si = idx[one]
            spx = px[one]
            spy = py[one]
            a_lt_p = (segs.ax[si] < spx) | ((segs.ax[si] == spx) &
                                            (segs.ay[si] < spy))
            p_lt_b = (spx < segs.bx[si]) | ((spx == segs.bx[si]) &
                                            (spy < segs.by[si]))
            ok = a_lt_p & p_lt_b
            if ok.any():
                si_ok = si[ok]
                spx_ok = spx[ok]
                spy_ok = spy[ok]
                fast_segs = Segments(
                    np.concatenate([segs.ax[si_ok], spx_ok]),
                    np.concatenate([segs.ay[si_ok], spy_ok]),
                    np.concatenate([spx_ok, segs.bx[si_ok]]),
                    np.concatenate([spy_ok, segs.by[si_ok]]),
                    np.concatenate([segs.subj[si_ok], segs.subj[si_ok]]),
                    np.concatenate([segs.clip[si_ok], segs.clip[si_ok]]))
                handled = np.zeros(len(segs), dtype=bool)
                handled[si_ok] = True
                slow_keep = ~handled[idx]
                idx, px, py = idx[slow_keep], px[slow_keep], py[slow_keep]

    out_ax, out_ay, out_bx, out_by, out_subj, out_clip = [], [], [], [], [], []

    ax_l = segs.ax.tolist(); ay_l = segs.ay.tolist()
    bx_l = segs.bx.tolist(); by_l = segs.by.tolist()
    subj_l = segs.subj.tolist(); clip_l = segs.clip.tolist()

    idx_l = idx.tolist(); px_l = px.tolist(); py_l = py.tolist()

    def emit(p, q, sgn_subj, sgn_clip):
        if p < q:
            out_ax.append(p[0]); out_ay.append(p[1])
            out_bx.append(q[0]); out_by.append(q[1])
            out_subj.append(sgn_subj); out_clip.append(sgn_clip)
        else:
            out_ax.append(q[0]); out_ay.append(q[1])
            out_bx.append(p[0]); out_by.append(p[1])
            out_subj.append(-sgn_subj)
            if string_clip:  # invert swaps FORWARD/BACK (segm/string.rs:78-88)
                out_clip.append(((sgn_clip & 1) << 1) | ((sgn_clip >> 1) & 1))
            else:
                out_clip.append(-sgn_clip)

    pos = 0
    n_marks = len(idx_l)
    while pos < n_marks:
        start = pos
        seg_i = idx_l[pos]
        pos += 1
        while pos < n_marks and idx_l[pos] == seg_i:
            pos += 1
        pts = [(px_l[k], py_l[k]) for k in range(start, pos)]
        a = (ax_l[seg_i], ay_l[seg_i])
        b = (bx_l[seg_i], by_l[seg_i])
        if len(pts) > 1:
            pts = _order_sub_marks(pts, a, b)
        su, cl = subj_l[seg_i], clip_l[seg_i]
        prev = a
        for p in pts:
            emit(prev, p, su, cl)
            prev = p
        emit(prev, b, su, cl)

    # untouched segments pass through
    untouched = ~marked_set_mask
    untouched_segs = segs.take(untouched)
    new = Segments(out_ax, out_ay, out_bx, out_by, out_subj, out_clip)
    parts = [untouched_segs, new]
    if fast_segs is not None:
        parts.append(fast_segs)
    return sort_merge(Segments.concat(parts), string_clip)


def _order_sub_marks(pts, a, b):
    """Order split points along the segment: sorted by (x, y); runs of
    equal x flipped to descending y when the segment locally descends
    (split/solver.rs:253-302)."""
    n = len(pts)
    out = list(pts)
    j0 = 0
    j = 1
    x0 = out[0][0]
    while j <= n:
        if j < n and out[j][0] == x0:
            j += 1
            continue
        if j0 + 1 < j:
            y0 = a[1] if j0 == 0 else out[j0 - 1][1]
            y1 = b[1] if j == n else out[j][1]
            if y0 > y1:
                out[j0:j] = reversed(out[j0:j])
        if j < n:
            x0 = out[j][0]
            j0 = j
        j += 1
    return out


def split_segments(segs: Segments, precision_start: int = 0,
                   precision_progression: int = 1,
                   max_rounds: int = 1000,
                   string_clip: bool = False) -> Segments:
    """Resolve all intersections by iterative split + snap rounding until
    a fixed point (split/solver_list.rs:14-67; radius schedule
    split/snap_radius.rs:5-27, Precision::HIGH defaults)."""
    segs = sort_merge(segs, string_clip)
    if len(segs) < 2:
        return segs

    exp = precision_start
    for _ in range(max_rounds):
        radius = 1 << exp
        m_idx, m_px, m_py, any_round = _find_marks(segs, radius)
        if not m_idx:
            return segs
        segs = _apply_marks(segs, m_idx, m_px, m_py, string_clip)
        exp = min(60, exp + precision_progression)
        if not any_round or len(segs) < 2:
            # one clean pass with no rounding: check for leftovers once more
            if not any_round:
                return segs
    return segs


# ---------------------------------------------------------------------------
# Winding fill via midpoint stabbing (replaces build/sweep.rs:33-90; fill
# strategies build/boolean.rs:96-154)
# ---------------------------------------------------------------------------

def bottom_windings(segs: Segments, block: int = 256,
                    with_clip: bool = True):
    """(bot_subj, bot_clip) winding just below each segment's midpoint.

    bot(s) = winding at a point just below s's midpoint = sum of counts of
    segments t whose half-open x-span [2*t.ax, 2*t.bx) covers s's doubled
    midpoint x and that pass strictly below the doubled midpoint.
    Equivalent to the reference sweep's scan value because split-phase
    output has no T-junctions or crossings, making the winding constant
    along each segment.
    """
    n = len(segs)
    bot_subj = np.zeros(n, dtype=np.int64)
    bot_clip = np.zeros(n, dtype=np.int64)
    if n == 0:
        return bot_subj, bot_clip

    mx = segs.ax + segs.bx          # doubled midpoint
    my = segs.ay + segs.by
    tax2 = 2 * segs.ax
    tbx2 = 2 * segs.bx
    ux = segs.bx - segs.ax
    uy = segs.by - segs.ay

    # segments are sorted by ax, so each x-contiguous query block only
    # needs the column window whose x-span can reach it: ax in
    # (qmin - max_span, qmax]. Turns the stab from O(n^2) into
    # O(n * local density) for spatially-spread inputs (tiles, packed
    # job batches).
    max_span2 = int((tbx2 - tax2).max()) if n else 0

    for q0 in range(0, n, block):
        q1 = min(n, q0 + block)
        qmx = mx[q0:q1, None]
        qmy = my[q0:q1, None]
        qlo = int(qmx.min())
        qhi = int(qmx.max())
        c0 = int(np.searchsorted(tax2, qlo - max_span2, side="left"))
        c1 = int(np.searchsorted(tax2, qhi, side="right"))
        cover = (tax2[None, c0:c1] <= qmx) & (qmx < tbx2[None, c0:c1])
        # strictly under: cross((b-a), (m - 2a)) > 0
        cr = ux[None, c0:c1] * (qmy - 2 * segs.ay[None, c0:c1]) - \
             uy[None, c0:c1] * (qmx - 2 * segs.ax[None, c0:c1])
        under = cover & (cr > 0)
        bot_subj[q0:q1] = under @ segs.subj[c0:c1]
        if with_clip:
            bot_clip[q0:q1] = under @ segs.clip[c0:c1]

    return bot_subj, bot_clip


def compute_fills(segs: Segments, fill_rule: int,
                  block: int = 256) -> np.ndarray:
    """4-bit SUBJ/CLIP top/bottom fill mask per split segment."""
    if len(segs) == 0:
        return np.zeros(0, dtype=np.uint8)
    bot_subj, bot_clip = bottom_windings(segs, block)
    return fills_from_windings(segs.subj, segs.clip, bot_subj, bot_clip,
                               fill_rule)


def fills_from_windings(subj, clip, bot_subj, bot_clip,
                        fill_rule: int) -> np.ndarray:
    top_subj = bot_subj + subj
    top_clip = bot_clip + clip
    if fill_rule == EVEN_ODD:
        st = top_subj & 1
        sb = bot_subj & 1
        ct = top_clip & 1
        cb = bot_clip & 1
    elif fill_rule == NON_ZERO:
        st = top_subj != 0
        sb = bot_subj != 0
        ct = top_clip != 0
        cb = bot_clip != 0
    elif fill_rule == POSITIVE:
        st = top_subj > 0
        sb = bot_subj > 0
        ct = top_clip > 0
        cb = bot_clip > 0
    else:
        st = top_subj < 0
        sb = bot_subj < 0
        ct = top_clip < 0
        cb = bot_clip < 0
    return (np.asarray(st, np.uint8) | (np.asarray(sb, np.uint8) << 1) |
            (np.asarray(ct, np.uint8) << 2) | (np.asarray(cb, np.uint8) << 3))


# ---------------------------------------------------------------------------
# Rule inclusion filters (build/boolean.rs:223-285)
# ---------------------------------------------------------------------------

def rule_include_mask(fill: np.ndarray, rule: int) -> np.ndarray:
    f = fill
    if rule == SUBJECT:
        s = f & SUBJ_BOTH
        return (s == SUBJ_TOP) | (s == SUBJ_BOTTOM)
    if rule == CLIP:
        c = f & CLIP_BOTH
        return (c == CLIP_TOP) | (c == CLIP_BOTTOM)
    top = f & BOTH_TOP
    bottom = f & BOTH_BOTTOM
    if rule == INTERSECT:
        return ((top == BOTH_TOP) | (bottom == BOTH_BOTTOM)) & (f != ALL)
    if rule == UNION:
        return ((top == 0) | (bottom == 0)) & (f != 0)
    if rule == DIFFERENCE:
        return ((top == SUBJ_TOP) | (bottom == SUBJ_BOTTOM)) & (f != SUBJ_BOTH)
    if rule == INVERSE_DIFFERENCE:
        return ((top == CLIP_TOP) | (bottom == CLIP_BOTTOM)) & (f != CLIP_BOTH)
    if rule == XOR:
        any_top = (top == SUBJ_TOP) | (top == CLIP_TOP)
        any_bottom = (bottom == SUBJ_BOTTOM) | (bottom == CLIP_BOTTOM)
        return any_top != any_bottom
    raise ValueError(f"unknown overlay rule {rule}")


def is_fill_top(fill: int, rule: int) -> bool:
    """Hole test for the left-top link (core/overlay_rule.rs:24-39)."""
    if rule == SUBJECT:
        return fill & SUBJ_TOP == SUBJ_TOP
    if rule == CLIP:
        return fill & CLIP_TOP == CLIP_TOP
    if rule == INTERSECT:
        return fill & BOTH_TOP == BOTH_TOP
    if rule == UNION:
        return fill & BOTH_BOTTOM == 0
    if rule == DIFFERENCE:
        return fill & BOTH_TOP == SUBJ_TOP
    if rule == INVERSE_DIFFERENCE:
        return fill & BOTH_TOP == CLIP_TOP
    if rule == XOR:
        t = fill & BOTH_TOP
        return t == SUBJ_TOP or t == CLIP_TOP
    raise ValueError(f"unknown overlay rule {rule}")
