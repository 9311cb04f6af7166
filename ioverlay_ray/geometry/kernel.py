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


def build_segments_flat(xs: np.ndarray, ys: np.ndarray,
                        offsets: np.ndarray, subj_flags: np.ndarray,
                        preserve_collinear: bool = False) -> Segments:
    """Vectorized ``build_segments`` over FLAT columnar contours — the
    zero-copy Arrow interchange surface (offsets + coords, no Python
    point lists).

    ``xs``/``ys``: flat vertex coords; ``offsets``: (n_contours+1)
    vertex offsets; ``subj_flags``: per-contour True=subject.
    Contours with a degenerate vertex (duplicate/collinear, per the
    PointFilter) or fewer than 3 vertices fall back to the sequential
    filter; clean contours (the overwhelming case for packed fleets)
    are built entirely with array ops.
    """
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    subj_flags = np.asarray(subj_flags, dtype=bool)
    nc = len(offsets) - 1
    if nc == 0:
        return Segments.empty()
    lens = np.diff(offsets)
    total = int(offsets[-1])
    cid = np.repeat(np.arange(nc), lens)
    # cyclic neighbors within each contour
    idx = np.arange(total)
    start = np.repeat(offsets[:-1], lens)
    end = start + np.repeat(lens, lens)
    nxt = np.where(idx + 1 < end, idx + 1, start)
    prv = np.where(idx - 1 >= start, idx - 1, end - 1)
    crs = (xs - xs[prv]) * (ys[nxt] - ys[prv]) \
        - (ys - ys[prv]) * (xs[nxt] - xs[prv])
    bad_vertex = crs == 0
    bad_contour = np.zeros(nc, dtype=bool)
    np.logical_or.at(bad_contour, cid, bad_vertex)
    bad_contour |= lens < 3

    clean = ~bad_contour
    parts = []
    if clean.any():
        keep_v = clean[cid]
        p_x = xs[keep_v]
        p_y = ys[keep_v]
        q_x = xs[nxt[keep_v]]
        q_y = ys[nxt[keep_v]]
        fwd = (p_x < q_x) | ((p_x == q_x) & (p_y < q_y))
        a_x = np.where(fwd, p_x, q_x)
        a_y = np.where(fwd, p_y, q_y)
        b_x = np.where(fwd, q_x, p_x)
        b_y = np.where(fwd, q_y, p_y)
        w = np.where(fwd, 1, -1).astype(np.int64)
        is_s = subj_flags[cid[keep_v]]
        parts.append(Segments(a_x, a_y, b_x, b_y,
                              np.where(is_s, w, 0),
                              np.where(is_s, 0, w)))
    if bad_contour.any():
        subj_py = []
        clip_py = []
        for c in np.flatnonzero(bad_contour).tolist():
            pts = list(zip(xs[offsets[c]:offsets[c + 1]].tolist(),
                           ys[offsets[c]:offsets[c + 1]].tolist()))
            (subj_py if subj_flags[c] else clip_py).append(pts)
        parts.append(build_segments(subj_py, clip_py, preserve_collinear))
    segs = Segments.concat(parts)
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
    if PARALLEL_SORT is not None:
        # pipeline-injected sharded sort (pipelines/parallel_fill.py):
        # key-range partitions co-locate equal rows, so per-shard
        # sort_merge + ordered concat is the identical table
        res = PARALLEL_SORT(segs, string_clip)
        if res is not None:
            return res
    # |c| <= MAX_COORD (< 2^30, enforced at the API boundary), so each
    # biased point packs into 62 bits: one int64 key per endpoint
    # halves the lexsort passes
    B = np.int64(1 << 30)
    akey = ((segs.ax + B) << np.int64(31)) | (segs.ay + B)
    bkey = ((segs.bx + B) << np.int64(31)) | (segs.by + B)
    order = np.lexsort((bkey, akey))
    s = segs.take(order)
    if n == 1:
        return s
    ak = akey[order]
    bk = bkey[order]
    same = (ak[1:] == ak[:-1]) & (bk[1:] == bk[:-1])
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
# optional hooks installed by pipelines/parallel_fill.py; None = in-process
# numpy. PARALLEL_FILL: fn(segs, with_clip) -> (bot_subj, bot_clip) shards
# the fill's stab queries across Ray tasks (exact: per-query independence).
# PARALLEL_MARKS: fn(segs, radius) -> marks tuple or None (None = caller
# falls through to the in-process path) shards the split's banded
# candidate enumeration by band range.
# PARALLEL_SORT: fn(segs, string_clip) -> Segments or None shards the
# sort_merge exchange by akey ranges (equal keys co-locate).
# PARALLEL_APPLY: fn(segs, idx, px, py, string_clip) -> Segments or None
# shards the split's mark-application (subdivision) by segment-index
# ranges — all marks of one segment co-locate, so per-shard subdivision
# is exact and the trailing global sort_merge canonicalizes order.
PARALLEL_FILL = None
PARALLEL_MARKS = None
PARALLEL_SORT = None
PARALLEL_APPLY = None

_TREE_LEAF_MAX = 256    # widest leaf the tree cost model considers
# NOTE (r4): a direct-pair "mid band" (accept up to ~96M pairs when
# under ~384 pairs/row) was tried for the Spiral-32k fill and REVERTED:
# an interleaved A/B measured the chunked pair engine 3x SLOWER than
# the tree there (1.81 s vs 0.66 s median over 6 alternating runs);
# the apparent pair win in a one-shot measurement was a cold-window
# artifact. Keep the classic budget.
_RECT_FAST = True       # rectilinear perpendicular classify fast path


def _pair_blocks_1d(segs: Segments, members: np.ndarray, bmin=None,
                    band: int | None = None):
    """(i, j>i) x-window candidate pairs over ``members`` (ascending
    global indices).  With ``bmin``/``band``, keep only pairs whose
    max(bmin_i, bmin_j) equals ``band`` (exact de-dup across y-bands)."""
    m = len(members)
    ax = segs.ax[members]
    bx = segs.bx[members]
    j_end = np.searchsorted(ax, bx, side="right")
    counts = np.maximum(j_end - np.arange(1, m + 1), 0)
    if int(counts.sum()) == 0:
        return

    ymin = np.minimum(segs.ay, segs.by)
    ymax = np.maximum(segs.ay, segs.by)
    csum = np.concatenate(([0], np.cumsum(counts)))

    i0 = 0
    while i0 < m:
        i1 = int(np.searchsorted(csum, csum[i0] + PAIR_BLOCK, "right")) - 1
        i1 = max(i1, i0 + 1)
        c = counts[i0:i1]
        total = int(c.sum())
        if total == 0:
            i0 = i1
            continue
        pp = np.repeat(np.arange(i0, i1), c)
        offs = (csum[i0:i1] - csum[i0]).astype(np.int64)
        qq = np.arange(total) - np.repeat(offs, c) + pp + 1
        ii = members[pp]
        jj = members[qq]

        low = ymin[ii]
        high = ymax[ii]
        keep = ~(((low > segs.ay[jj]) & (low > segs.by[jj]))
                 | ((high < segs.ay[jj]) & (high < segs.by[jj])))
        if bmin is not None:
            keep &= np.maximum(bmin[ii], bmin[jj]) == band
        if keep.any():
            yield ii[keep], jj[keep]
        i0 = i1


def _rect_pair_blocks(segs: Segments, h_mask: np.ndarray):
    """Candidate pairs for fully rectilinear scenes, enumerated
    straight from INCLUSIVE bbox overlap (the same pair set the
    generic x-window + y-reject scan keeps, proven by a set-equality
    test): H x V through a segment tree over the vertical columns with
    per-node y-sorted members (O((n + out) log n)), H-H / V-V through
    same-line packed windows."""
    n = len(segs)
    hh = np.flatnonzero(h_mask)
    vv = np.flatnonzero(~h_mask)
    out_i: list = []
    out_j: list = []
    budget = [0]

    def flush(force=False):
        if budget[0] >= PAIR_BLOCK or (force and budget[0]):
            ii = np.concatenate(out_i)
            jj = np.concatenate(out_j)
            out_i.clear()
            out_j.clear()
            budget[0] = 0
            return ii, jj
        return None

    # ---- H x V ----
    if len(hh) and len(vv):
        vx = segs.ax[vv]
        vy0 = segs.ay[vv]
        vy1 = segs.by[vv]           # a < b normalized: ay < by for V
        X, vcol = np.unique(vx, return_inverse=True)
        ncols = len(X)
        lo = np.searchsorted(X, segs.ax[hh], side="left")
        hi = np.searchsorted(X, segs.bx[hh], side="right")  # inclusive
        keep = hi > lo
        N = 1 << max(1, (ncols - 1).bit_length())
        l = (lo[keep] + N).copy()
        h = (hi[keep] + N - 1).copy()   # inclusive leaf range [l, h]
        sid = hh[keep]
        node_parts = []
        mem_parts = []
        while len(l):
            oddl = (l & 1) == 1
            if oddl.any():
                node_parts.append(l[oddl].copy())
                mem_parts.append(sid[oddl].copy())
                l = l + oddl
            evenh = (h & 1) == 0
            if evenh.any():
                node_parts.append(h[evenh].copy())
                mem_parts.append(sid[evenh].copy())
                h = h - evenh
            l >>= 1
            h >>= 1
            keep2 = l <= h
            l = l[keep2]
            h = h[keep2]
            sid = sid[keep2]
        if node_parts:
            nodes = np.concatenate(node_parts)
            mem = np.concatenate(mem_parts)
            hy = segs.ay[mem]
            B31 = np.int64(1) << 31
            packed = nodes.astype(np.int64) * (np.int64(1) << 32) \
                + (hy + B31)
            o = np.argsort(packed, kind="stable")
            packed_s = packed[o]
            mem_s = mem[o]
            # per-V ancestor probes, all levels at once
            leaf = vcol + N
            levels = int(N).bit_length()
            base = np.int64(1) << 32
            for _ in range(levels):
                lb = np.searchsorted(
                    packed_s, leaf.astype(np.int64) * base
                    + (vy0 + B31), side="left")
                ub = np.searchsorted(
                    packed_s, leaf.astype(np.int64) * base
                    + (vy1 + B31), side="right")
                cnt = ub - lb
                hitv = np.flatnonzero(cnt > 0)
                if len(hitv):
                    reps = cnt[hitv]
                    total = int(reps.sum())
                    offs = np.concatenate(([0],
                                           np.cumsum(reps)))[:-1]
                    pos = np.arange(total, dtype=np.int64) \
                        - np.repeat(offs, reps) + np.repeat(lb[hitv],
                                                            reps)
                    out_i.append(mem_s[pos])
                    out_j.append(vv[np.repeat(hitv, reps)])
                    budget[0] += total
                    blk = flush()
                    if blk is not None:
                        yield blk
                leaf >>= 1

    # ---- same-line pairs (H-H sharing y, V-V sharing x) ----
    for idx, line, c0, c1 in (
            (hh, segs.ay, segs.ax, segs.bx),
            (vv, segs.ax, segs.ay, segs.by)):
        if len(idx) < 2:
            continue
        ln = line[idx]
        a = c0[idx]
        b = c1[idx]
        o = np.lexsort((a, ln))
        idx_s = idx[o]
        ln_s = ln[o]
        a_s = a[o]
        b_s = b[o]
        avals = np.unique(a_s)
        K = np.int64(len(avals) + 2)
        lr = np.unique(ln_s, return_inverse=True)[1].astype(np.int64)
        xr = np.searchsorted(avals, a_s)
        pk = lr * K + xr
        qr = np.searchsorted(avals, b_s, side="right")
        j_end = np.searchsorted(pk, lr * K + qr, side="left")
        m = len(idx_s)
        cts = np.maximum(j_end - np.arange(1, m + 1), 0)
        pcs = np.concatenate(([0], np.cumsum(cts)))
        i0 = 0
        while i0 < m:
            i1 = int(np.searchsorted(pcs, pcs[i0] + PAIR_BLOCK,
                                     "right")) - 1
            i1 = max(i1, i0 + 1)
            c = cts[i0:i1]
            total = int(c.sum())
            if total:
                pp = np.repeat(np.arange(i0, i1), c)
                offs = (pcs[i0:i1] - pcs[i0]).astype(np.int64)
                qq = np.arange(total) - np.repeat(offs, c) + pp + 1
                out_i.append(idx_s[pp])
                out_j.append(idx_s[qq])
                budget[0] += total
                blk = flush()
                if blk is not None:
                    yield blk
            i0 = i1
    blk = flush(force=True)
    if blk is not None:
        yield blk


def _pair_plan(segs: Segments):
    """Which enumeration regime _candidate_pair_blocks will take:
    ("flat"|"rect"|"banded", B). Exposed so the sharded split
    (pipelines/parallel_fill.py) can fan the banded regime out by band
    ranges; must stay in lockstep with _candidate_pair_blocks."""
    n = len(segs)
    if n == 0:
        return "flat", 0
    use_bands = False
    flat_pairs = 0
    if n > 512:
        # flat_pairs feeds only the regime heuristic and the band
        # count (any B >= 2 enumerates the identical pair set), so a
        # strided estimate is safe above 1M rows — the exact
        # searchsorted over the full table costs ~0.2-0.35 s per
        # split round at Spiral-524k scale
        if n >= 1_000_000:
            k = 16
            sel = np.arange(0, n, k, dtype=np.int64)
            j_end = np.searchsorted(segs.ax, segs.bx[sel], side="right")
            flat_pairs = int(np.maximum(
                j_end - (sel + 1), 0).sum()) * k
        else:
            j_end = np.searchsorted(segs.ax, segs.bx, side="right")
            flat_pairs = int(np.maximum(
                j_end - np.arange(1, n + 1), 0).sum())
        use_bands = flat_pairs > max(32 * n, 1 << 16)
    if use_bands and _RECT_FAST:
        is_h = segs.ay == segs.by
        is_v = segs.ax == segs.bx
        if bool(np.all(is_h | is_v)):
            return "rect", 0
    if use_bands:
        ymin = np.minimum(segs.ay, segs.by)
        ymax = np.maximum(segs.ay, segs.by)
        y0 = int(ymin.min())
        y1 = int(ymax.max())
        B = min(512, max(2, flat_pairs // (2 * n)))
        while B > 1:
            h = max(1, (y1 - y0 + B) // B)
            rep = int(((ymax - y0) // h - (ymin - y0) // h + 1).sum())
            if rep <= 4 * n:
                break
            B >>= 1
        if B > 1:
            return "banded", B
    return "flat", 0


def _candidate_pair_blocks(segs: Segments, band_range=None,
                           banded_ctx=None):
    """Yield (i, j>i) candidate-pair blocks with x-overlap (sorted by a)
    and y-range overlap.

    Small inputs use the flat x-window scan (split/solver_list.rs:
    33-44).  Dense inputs whose x-windows explode (spirals, long thin
    boards) are bucketed into y-bands first — the flat analogue of the
    reference's interval-tree regime (split/solver_tree.rs:34-97): each
    segment joins every band its y-range overlaps, pairs are emitted in
    the band max(bmin_i, bmin_j) only (exact de-dup), and the x-window
    runs per band.  Blocks bound peak memory so one dense tile can't
    blow up a worker (the 100TB-regime guard).

    ``band_range=(lo, hi)`` restricts the BANDED regime to bands in
    [lo, hi) — the sharded split's unit of work; pairs are emitted in
    the same order as the full enumeration restricted to those bands
    (bands are processed band-major either way). Only valid when
    _pair_plan says "banded".

    ``banded_ctx=(B, y0, h)`` forces the banded regime with the given
    FULL-table band geometry: the sharded split passes each task only
    the segments overlapping its band range, and the subset must band
    identically to the full enumeration (band membership depends only
    on (y0, h) and the segment's own y-extent, so it does)."""
    n = len(segs)
    if n == 0:
        return
    if banded_ctx is not None:
        mode = "banded"
        B, y0, h = banded_ctx
    else:
        mode, B = _pair_plan(segs)
    if mode == "rect":
        assert band_range is None
        is_h = segs.ay == segs.by
        is_v = segs.ax == segs.bx
        # rectilinear interval join: candidates enumerated straight
        # from bbox overlap (H x V via a column segment tree with
        # per-node y-sorted members; same-line H-H / V-V via packed
        # windows) — the y-banded scan enumerates x-window pairs
        # BEFORE its y-reject, which is O(n^2) on concentric-frame
        # scenes where every strip spans the full extent
        yield from _rect_pair_blocks(segs, is_h & ~is_v)
        return
    if mode == "banded":
        ymin = np.minimum(segs.ay, segs.by)
        ymax = np.maximum(segs.ay, segs.by)
        if banded_ctx is None:
            y0 = int(ymin.min())
            y1 = int(ymax.max())
            h = max(1, (y1 - y0 + B) // B)
        bmin = (ymin - y0) // h
        bmax = (ymax - y0) // h
        counts = (bmax - bmin + 1).astype(np.int64)
        order = np.repeat(np.arange(n), counts)
        csum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        bands = np.arange(len(order)) - np.repeat(csum, counts) \
            + bmin[order]
        if band_range is not None:
            sel = (bands >= band_range[0]) & (bands < band_range[1])
            order = order[sel]
            bands = bands[sel]
        srt = np.argsort(bands, kind="stable")
        band_m = bands[srt]
        order_s = order[srt]
        # x-windows for ALL bands in one pass: rank-pack
        # (band, rank(ax)) so one global searchsorted finds each
        # member's window end within its band
        m = len(order_s)
        ax_vals = np.unique(segs.ax)
        KK = np.int64(len(ax_vals) + 2)
        xr = np.searchsorted(ax_vals, segs.ax[order_s])
        packed = band_m * KK + xr
        qr = np.searchsorted(ax_vals, segs.bx[order_s],
                             side="right")
        j_end = np.searchsorted(packed, band_m * KK + qr,
                                side="left")
        cts = np.maximum(j_end - np.arange(1, m + 1), 0)
        pcs = np.concatenate(([0], np.cumsum(cts)))
        i0 = 0
        while i0 < m:
            i1 = int(np.searchsorted(pcs, pcs[i0] + PAIR_BLOCK,
                                     "right")) - 1
            i1 = max(i1, i0 + 1)
            c = cts[i0:i1]
            total = int(c.sum())
            if total == 0:
                i0 = i1
                continue
            pp = np.repeat(np.arange(i0, i1), c)
            offs = (pcs[i0:i1] - pcs[i0]).astype(np.int64)
            qq = np.arange(total) - np.repeat(offs, c) + pp + 1
            ii = order_s[pp]
            jj = order_s[qq]
            low = ymin[ii]
            high = ymax[ii]
            keep = ~(((low > segs.ay[jj]) & (low > segs.by[jj]))
                     | ((high < segs.ay[jj]) & (high < segs.by[jj])))
            keep &= np.maximum(bmin[ii], bmin[jj]) == band_m[pp]
            if keep.any():
                yield ii[keep], jj[keep]
            i0 = i1
        return
    assert band_range is None
    yield from _pair_blocks_1d(segs, np.arange(n))


def _candidate_pairs(segs: Segments):
    """All candidate pairs at once (small inputs / tests)."""
    blocks = list(_candidate_pair_blocks(segs))
    if not blocks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (np.concatenate([b[0] for b in blocks]),
            np.concatenate([b[1] for b in blocks]))


def _cat_marks(parts) -> np.ndarray:
    """Concatenate mark-array parts appended by _classify_pairs."""
    if not parts:
        return np.zeros(0, np.int64)
    if len(parts) == 1:
        return np.asarray(parts[0], np.int64)
    return np.concatenate(parts)


def _find_marks(segs: Segments, radius: int, band_range=None,
                banded_ctx=None):
    """Classify all candidate pairs; return split marks and whether any
    rounding occurred (split/solver.rs:82-156).

    Marks are (seg_index, px, py) int64 arrays. Pairs are consumed in
    bounded-memory blocks (_candidate_pair_blocks). ``band_range``
    restricts enumeration+classification to a band range of the banded
    regime (the sharded split's task unit); ``banded_ctx`` carries the
    full-table band geometry when ``segs`` is a subset (see
    _candidate_pair_blocks)."""
    if PARALLEL_MARKS is not None and band_range is None:
        res = PARALLEL_MARKS(segs, radius)
        if res is not None:
            return res
    m_idx: list = []
    m_px: list = []
    m_py: list = []
    any_round = False
    for ii, jj in _candidate_pair_blocks(segs, band_range, banded_ctx):
        r = _classify_pairs(segs, ii, jj, radius, m_idx, m_px, m_py)
        any_round |= r
    return _cat_marks(m_idx), _cat_marks(m_px), _cat_marks(m_py), any_round


def _classify_pairs(segs: Segments, ii, jj, radius: int,
                    m_idx: list, m_px: list, m_py: list) -> bool:

    tax, tay = segs.ax[ii], segs.ay[ii]
    tbx, tby = segs.bx[ii], segs.by[ii]
    oax, oay = segs.ax[jj], segs.ay[jj]
    obx, oby = segs.bx[jj], segs.by[jj]

    # rectilinear perpendicular fast path (checkerboard / LinesNet /
    # clip-board scenes): every pair is one horizontal x one vertical
    # segment, so the four orientation signs are plain coordinate
    # differences (identical values to the cross products below — the
    # factored-out u/v component is strictly positive because segments
    # are a<b normalized) and the middle-cross point is the exact
    # lattice point (vx, hy): no rational arithmetic, never rounds.
    perp_a = (tay == tby) & (oax == obx) & (tax != tbx) & (oay != oby)
    perp_b = (tax == tbx) & (oay == oby) & (tay != tby) & (oax != obx)
    if _RECT_FAST and len(ii) and (perp_a | perp_b).all():
        d1 = np.sign(np.where(perp_a, oay - tay, tax - oax))
        d2 = np.sign(np.where(perp_a, oby - tay, tax - obx))
        d3 = np.sign(np.where(perp_a, oax - tax, tay - oay))
        d4 = np.sign(np.where(perp_a, oax - tbx, tby - oay))
        z = (d1 == 0).astype(np.int8) + (d2 == 0) + (d3 == 0) + (d4 == 0)
        not_cross = (d1 == d2) | (d3 == d4)
        skip = (z > 1) | not_cross      # overlay (z==4) impossible
        touch = (~skip) & (z == 1)
        if touch.any():
            w = np.flatnonzero(touch)
            for zero_d, idx_arr, pxa, pya in (
                (d1, ii, oax, oay), (d2, ii, obx, oby),
                (d3, jj, tax, tay), (d4, jj, tbx, tby),
            ):
                sel = w[zero_d[w] == 0]
                if len(sel):
                    m_idx.append(idx_arr[sel])
                    m_px.append(pxa[sel])
                    m_py.append(pya[sel])
        mid = (~skip) & (z == 0)
        if mid.any():
            w = np.flatnonzero(mid)
            px = np.where(perp_a[w], oax[w], tax[w])
            py = np.where(perp_a[w], tay[w], oay[w])
            m_idx.append(ii[w])
            m_px.append(px)
            m_py.append(py)
            m_idx.append(jj[w])
            m_px.append(px)
            m_py.append(py)
        return False

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
                m_idx.append(idx_arr[sel])
                m_px.append(pxa[sel])
                m_py.append(pya[sel])

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
                m_idx.append(idx_arr[sel])
                m_px.append(pxa[sel])
                m_py.append(pya[sel])

    # --- z == 0 strict middle cross: exact rational point + snapping ---
    mid = (~skip) & (z == 0)
    any_round = False
    if mid.any():
        w = np.flatnonzero(mid)
        code, px, py, rnd = _middle_cross_batch(
            tax[w], tay[w], tbx[w], tby[w],
            oax[w], oay[w], obx[w], oby[w], radius)
        any_round = bool(rnd.any())
        pure = code == 0
        if pure.any():
            s = np.flatnonzero(pure)
            m_idx.append(ii[w[s]])
            m_px.append(px[s])
            m_py.append(py[s])
            m_idx.append(jj[w[s]])
            m_px.append(px[s])
            m_py.append(py[s])
        te = code == 1
        if te.any():
            s = np.flatnonzero(te)
            m_idx.append(jj[w[s]])
            m_px.append(px[s])
            m_py.append(py[s])
        oe = code == 2
        if oe.any():
            s = np.flatnonzero(oe)
            m_idx.append(ii[w[s]])
            m_px.append(px[s])
            m_py.append(py[s])

    return any_round


def _middle_cross_batch(tax, tay, tbx, tby, oax, oay, obx, oby, radius):
    """Vectorized _middle_cross over pair arrays: int64 fast path with a
    Python-int fallback only for elements whose |a1| * |xy_b| product
    would overflow int64 (cross_solver.rs:219-311 semantics, bit-exact).

    Returns (code[0=pure,1=target_end,2=other_end], px, py, is_round).
    """
    n = len(tax)
    # offset approach: translate by -target.a
    a1x = tbx - tax
    a1y = tby - tay
    b0x = oax - tax
    b0y = oay - tay
    b1x = obx - tax
    b1y = oby - tay
    dy_b = b0y - b1y
    dx_b = b0x - b1x
    xy_b = b0x * b1y - b0y * b1x          # |.| < 2^63 for |c| < 2^30

    px = np.zeros(n, dtype=np.int64)
    py = np.zeros(n, dtype=np.int64)

    vert = a1x == 0
    horz = (~vert) & (a1y == 0)
    gen = ~(vert | horz)

    if vert.any():
        # trunc-toward-zero division (Rust integer division)
        num = xy_b[vert]
        den = dx_b[vert]
        q = np.abs(num) // np.abs(den)
        py[vert] = np.where((num >= 0) == (den >= 0), q, -q)
    if horz.any():
        num = xy_b[horz]
        den = dy_b[horz]
        q = np.abs(num) // np.abs(den)
        px[horz] = -np.where((num >= 0) == (den >= 0), q, -q)

    overflow = np.zeros(n, dtype=bool)
    if gen.any():
        g = np.flatnonzero(gen)
        div = a1y[g] * dx_b[g] - a1x[g] * dy_b[g]
        uxy = np.abs(xy_b[g])
        udiv = np.abs(div)
        # fast-path gate: |a1| * |xy_b| + (udiv >> 1) must fit int64
        amax = np.maximum(np.abs(a1x[g]), np.abs(a1y[g]))
        safe = amax.astype(np.float64) * uxy.astype(np.float64) < 2.0 ** 62
        s = np.sign(div) * np.sign(xy_b[g])
        sx = np.where(a1x[g] > 0, 1, -1) * s
        sy = np.where(a1y[g] > 0, 1, -1) * s
        gs = g[safe]
        if len(gs):
            w = np.flatnonzero(safe)
            half = udiv[w] >> 1
            ux = (np.abs(a1x[g][w]) * uxy[w] + half) // udiv[w]
            uy = (np.abs(a1y[g][w]) * uxy[w] + half) // udiv[w]
            px[gs] = sx[w] * ux
            py[gs] = sy[w] * uy
        overflow[g[~safe]] = True

    px = px + tax
    py = py + tay

    # wide-product fallback: exact Python ints (rare)
    code = np.zeros(n, dtype=np.int8)
    rnd = np.zeros(n, dtype=bool)
    if overflow.any():
        for k in np.flatnonzero(overflow).tolist():
            ct, (fx, fy), is_round = _middle_cross(
                ((int(tax[k]), int(tay[k])), (int(tbx[k]), int(tby[k]))),
                ((int(oax[k]), int(oay[k])), (int(obx[k]), int(oby[k]))),
                radius)
            px[k] = fx
            py[k] = fy
            code[k] = {"pure": 0, "target_end": 1, "other_end": 2}[ct]
            rnd[k] = is_round
    ok = ~overflow

    # on-line tests for the rounded point (int64 safe: diffs < 2^31)
    def on_line(ax_, ay_, bx_, by_, cx_, cy_):
        return (bx_ - ax_) * (cy_ - ay_) - (by_ - ay_) * (cx_ - ax_) == 0

    t_line = on_line(tax, tay, tbx, tby, px, py)
    o_line = on_line(oax, oay, obx, oby, px, py)
    exact = ok & t_line & o_line          # pure, not rounded
    rough = ok & ~exact
    if rough.any():
        r = np.flatnonzero(rough)
        ra0 = (tax[r] - px[r]) ** 2 + (tay[r] - py[r]) ** 2
        rb0 = (tbx[r] - px[r]) ** 2 + (tby[r] - py[r]) ** 2
        ra1 = (oax[r] - px[r]) ** 2 + (oay[r] - py[r]) ** 2
        rb1 = (obx[r] - px[r]) ** 2 + (oby[r] - py[r]) ** 2
        near = (ra0 <= radius) | (ra1 <= radius) | \
               (rb0 <= radius) | (rb1 <= radius)
        rnd[r] = True
        if near.any():
            m = np.flatnonzero(near)
            rm = r[m]
            r0 = np.minimum(ra0[m], rb0[m])
            r1 = np.minimum(ra1[m], rb1[m])
            snap_t = r0 <= r1
            # snap to a target end: candidate point, then reject if it
            # lies on the other line
            if snap_t.any():
                st = np.flatnonzero(snap_t)
                rs = rm[st]
                use_a = ra0[m][st] < rb0[m][st]
                cx = np.where(use_a, tax[rs], tbx[rs])
                cy = np.where(use_a, tay[rs], tby[rs])
                off = ~on_line(oax[rs], oay[rs], obx[rs], oby[rs], cx, cy)
                sel = rs[off]
                px[sel] = cx[off]
                py[sel] = cy[off]
                code[sel] = 1
            snap_o = ~snap_t
            if snap_o.any():
                so = np.flatnonzero(snap_o)
                rs = rm[so]
                use_a = ra1[m][so] < rb1[m][so]
                cx = np.where(use_a, oax[rs], obx[rs])
                cy = np.where(use_a, oay[rs], oby[rs])
                off = ~on_line(tax[rs], tay[rs], tbx[rs], tby[rs], cx, cy)
                sel = rs[off]
                px[sel] = cx[off]
                py[sel] = cy[off]
                code[sel] = 2
    return code, px, py, rnd


def _apply_marks(segs: Segments, m_idx, m_px, m_py,
                 string_clip: bool = False) -> Segments:
    """Subdivide marked segments at their split points, preserving winding
    counts; re-normalize direction; re-sort + merge
    (split/solver.rs:158-251). Fully vectorized (round-2); the
    subdivision core lives in :func:`_subdivide_marks` so the
    PARALLEL_APPLY hook can run it as a Ray task wave over
    segment-index shards."""
    idx = np.asarray(m_idx, dtype=np.int64)
    px = np.asarray(m_px, dtype=np.int64)
    py = np.asarray(m_py, dtype=np.int64)
    if PARALLEL_APPLY is not None:
        res = PARALLEL_APPLY(segs, idx, px, py, string_clip)
        if res is not None:
            return res
    new = Segments(*_subdivide_marks(segs, idx, px, py, string_clip))
    marked_set_mask = np.zeros(len(segs), dtype=bool)
    marked_set_mask[idx] = True
    untouched_segs = segs.take(~marked_set_mask)
    return sort_merge(Segments.concat([untouched_segs, new]), string_clip)


def _subdivide_marks(segs: Segments, idx, px, py,
                     string_clip: bool = False):
    """Build the subdivided (new) sub-segment arrays for raw mark
    triples: lexsort marks along each segment (runs of equal x follow
    the segment's y direction — the _order_sub_marks semantics for
    strictly-interior marks), dedup identical (index, point) pairs,
    scatter-build sub-segments, re-normalize direction with a masked
    swap. Requires ONLY that every mark of a given segment is present
    in ``idx`` (a segment's marks must not be split across calls);
    returns the six new-segment arrays, pre-sort_merge."""
    # pack the (px, py) mark point into one 62-bit key (|c| < 2^30)
    B = np.int64(1 << 30)
    pkey = ((px + B) << np.int64(31)) | (py + B)
    order = np.lexsort((pkey, idx))
    idx, px, py = idx[order], px[order], py[order]
    pkey = pkey[order]
    # dedup adjacent identical (index, point)
    if len(idx) > 1:
        dup = (idx[1:] == idx[:-1]) & (pkey[1:] == pkey[:-1])
        keep = np.concatenate(([True], ~dup))
        idx, px, py = idx[keep], px[keep], py[keep]

    # order marks ALONG each segment. Base order (x, y) is already
    # correct except for runs of equal x on NON-vertical segments,
    # where the reference flips runs by the neighbor-y rule
    # (split/solver.rs:253-302, _order_sub_marks). Such runs are rare
    # (several crossings rounded into one x column of a shallow
    # segment) — those groups reorder through the exact Python rule;
    # vertical segments' single run is already ascending-y = reference.
    if len(idx) > 1:
        run = (idx[1:] == idx[:-1]) & (px[1:] == px[:-1]) & \
            (segs.ax[idx[1:]] != segs.bx[idx[1:]])
        if run.any():
            bad = np.unique(idx[np.concatenate(([False], run))])
            sel = np.isin(idx, bad)
            w = np.flatnonzero(sel)
            pos = 0
            while pos < len(w):
                seg_i = int(idx[w[pos]])
                end = pos
                while end < len(w) and idx[w[end]] == seg_i:
                    end += 1
                span = w[pos:end]
                pts = list(zip(px[span].tolist(), py[span].tolist()))
                a = (int(segs.ax[seg_i]), int(segs.ay[seg_i]))
                b = (int(segs.bx[seg_i]), int(segs.by[seg_i]))
                pts = _order_sub_marks(pts, a, b)
                px[span] = [p[0] for p in pts]
                py[span] = [p[1] for p in pts]
                pos = end

    # group marks by segment
    grp_start = np.flatnonzero(np.concatenate(
        ([True], idx[1:] != idx[:-1]))) if len(idx) else np.zeros(0, np.int64)
    grp_seg = idx[grp_start] if len(idx) else np.zeros(0, np.int64)
    k = np.diff(np.concatenate((grp_start, [len(idx)])))  # marks per seg
    n_grp = len(grp_seg)
    total = int(len(idx) + n_grp)          # sub-segments emitted

    g_ord = np.repeat(np.arange(n_grp, dtype=np.int64), k + 1)
    out_off = np.concatenate(([0], np.cumsum(k + 1)))[:-1]
    pos = np.arange(total, dtype=np.int64)
    local = pos - out_off[g_ord]
    seg_of = grp_seg[g_ord]
    mark_off = np.concatenate(([0], np.cumsum(k)))[:-1]

    first = local == 0
    last = local == k[g_ord]
    prev_i = np.clip(mark_off[g_ord] + local - 1, 0, max(len(idx) - 1, 0))
    next_i = np.clip(mark_off[g_ord] + local, 0, max(len(idx) - 1, 0))
    sx = np.where(first, segs.ax[seg_of], px[prev_i])
    sy = np.where(first, segs.ay[seg_of], py[prev_i])
    ex = np.where(last, segs.bx[seg_of], px[next_i])
    ey = np.where(last, segs.by[seg_of], py[next_i])
    su = segs.subj[seg_of]
    cl = segs.clip[seg_of]

    flip = (sx > ex) | ((sx == ex) & (sy > ey))
    n_ax = np.where(flip, ex, sx)
    n_ay = np.where(flip, ey, sy)
    n_bx = np.where(flip, sx, ex)
    n_by = np.where(flip, sy, ey)
    n_su = np.where(flip, -su, su)
    if string_clip:  # invert swaps FORWARD/BACK (segm/string.rs:78-88)
        flipped = ((cl & 1) << 1) | ((cl >> 1) & 1)
        n_cl = np.where(flip, flipped, cl)
    else:
        n_cl = np.where(flip, -cl, cl)

    return n_ax, n_ay, n_bx, n_by, n_su, n_cl


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
        if len(m_idx) == 0:
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

def _single_cycle_windings(segs: Segments):
    """O(n) closed-form bot_subj for the clean-geometry fast path: a
    post-split subject-only scene that is ONE simple closed contour
    (every node degree 2, one cycle, every count +-1 — the Spiral
    regime, and any already-clean polygon union'd with nothing).

    Split output has no crossings or T-junctions, so if the segments
    form a single directed cycle the scene is a simple polygon: the
    winding just below a boundary edge is the polygon's orientation w
    where the interior lies below and 0 where it lies above. With the
    canonical a < b storage (subj=+1 means the input edge ran a->b),
    "interior below" reduces to subj != w for BOTH the non-vertical
    case (interior left of travel for w=+1; below iff travelling -x)
    and the vertical case under the half-open stab convention
    (winding on the +x side; interior right iff travelling -y), so

        bot_subj = w  if subj != w  else 0.

    Returns None when any precondition fails (caller falls back to the
    stabbing engines). Preconditions are airtight, not heuristic:
    crossings/touches would have produced degree-4 nodes, coincident
    runs merged counts away from +-1, and multiple cycles fail the
    pointer-doubling single-label check.
    """
    n = len(segs)
    subj = segs.subj
    if n < 3 or np.abs(subj).min() != 1 or np.abs(subj).max() != 1:
        return None
    off = np.int64(1) << np.int64(30)   # |coords| < 2^30 (check_coords)
    ka = ((segs.ax + off) << np.int64(31)) | (segs.ay + off)
    kb = ((segs.bx + off) << np.int64(31)) | (segs.by + off)
    nodes, inv = np.unique(np.concatenate([ka, kb]), return_inverse=True)
    if len(nodes) != n:
        return None
    fwd = subj > 0
    head = np.where(fwd, inv[n:], inv[:n])   # input-direction endpoint
    tail = np.where(fwd, inv[:n], inv[n:])
    cnt = np.bincount(head, minlength=n)
    if cnt.max() != 1 or np.bincount(tail, minlength=n).max() != 1:
        return None
    seg_at_tail = np.empty(n, np.int64)
    seg_at_tail[tail] = np.arange(n)
    # single directed cycle <=> pointer doubling reaches label 0 everywhere
    lbl = np.arange(n)
    reach = seg_at_tail[head]
    for _ in range(max(1, int(np.ceil(np.log2(n))))):
        lbl = np.minimum(lbl, lbl[reach])
        reach = reach[reach]
    if lbl.max() != 0:
        return None
    # orientation sign from the shoelace sum; float64 with an error
    # bound, exact Python-int fallback only when the bound is violated
    terms = subj * (segs.ax * segs.by - segs.bx * segs.ay)
    s = float(np.sum(terms, dtype=np.float64))
    bound = n * float(np.abs(terms).max()) * 2.0 ** -50
    if abs(s) <= bound:
        s = float(sum(int(t) for t in terms.tolist()))
        if s == 0.0:
            return None
    w = np.int64(1) if s > 0 else np.int64(-1)
    return np.where(subj != w, w, np.int64(0))


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
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    if not with_clip and not segs.clip.any():
        fast = _single_cycle_windings(segs)
        if fast is not None:
            return fast, np.zeros(n, dtype=np.int64)
    if PARALLEL_FILL is not None:
        # pipeline-injected sharded fill (pipelines/parallel_fill.py):
        # stab queries are data-parallel, so a task wave computes the
        # identical values; the kernel itself stays numpy-pure
        return PARALLEL_FILL(segs, with_clip)
    mx = segs.ax + segs.bx          # doubled midpoint
    my = segs.ay + segs.by
    return _stab_windings(segs, mx, my, np.arange(n), block, with_clip)


def _tree_windings(segs: Segments, mx, my, q_pos, with_clip: bool = True,
                   ctx: dict | None = None):
    """Winding below doubled points (mx, my) via a vectorized segment
    tree over query columns — the distributed analogue of the
    reference's medium-regime sweep (split/solver_tree.rs:34-97).

    Post-split segments share no interior points, so all segments
    assigned to one canonical tree node (they span the node's full
    column range) have one consistent vertical order across the node;
    each query ranks against the node's y-sorted prefix sums by a
    batched binary search whose comparator is the exact int64 cross
    test at the query's own x — no approximate keys on the query side.
    O((n+q)·log^2) with every step a numpy pass.
    """
    nq = len(q_pos)
    bot_subj = np.zeros(nq, dtype=np.int64)
    bot_clip = np.zeros(nq, dtype=np.int64)
    if nq == 0 or len(segs) == 0:
        return bot_subj, bot_clip
    if ctx is not None:
        qmx_all = ctx["qmx"]
        qmy_all = ctx["qmy"]
        tax2, tbx2 = ctx["tax2"], ctx["tbx2"]
        ux, uy = ctx["ux"], ctx["uy"]
        X = ctx["X"]
    else:
        qmx_all = mx[q_pos]
        qmy_all = my[q_pos]
        tax2 = 2 * segs.ax
        tbx2 = 2 * segs.bx
        ux = segs.bx - segs.ax
        uy = segs.by - segs.ay
        X = np.unique(qmx_all)
    ncols = len(X)
    # coarse leaves: L columns per tree leaf cuts replication (and the
    # level count) by ~log2(L); the sub-leaf ends of each segment are
    # evaluated as direct exact pairs instead.  L is picked by a cost
    # model — remnant pairs are streaming-cheap (~1 unit) while tree
    # entries (keys+sort+prefix, ~6 units) and per-level query hits
    # (binary-search gathers, ~2 units/level) dominate — evaluated from
    # the widest leaf down, stopping when cost turns back up (the cost
    # curve is unimodal in L).  Sweep-validated on Spiral 32k/131k:
    # the old fixed remnant budget picked L=16 at 131k (13 s); the
    # model picks L=64 (4.5 s).
    if ctx is not None:
        lo_c, hi_c, q_col, Qp = (ctx["lo"], ctx["hi"], ctx["q_col"],
                                 ctx["Qp"])
    else:
        lo_c = np.searchsorted(X, tax2, side="left")
        hi_c = np.searchsorted(X, tbx2, side="left")
        q_col = np.searchsorted(X, qmx_all)
        Qp = np.concatenate(([0], np.cumsum(
            np.bincount(q_col, minlength=ncols)))).astype(np.int64)
    best = None
    L = _TREE_LEAF_MAX
    while L >= 1:
        lf_lo = (lo_c + L - 1) // L
        lf_hi = hi_c // L
        full = lf_hi > lf_lo
        # full segments: left remnant up to the first full leaf;
        # non-full segments: the WHOLE span is remnant
        a_end = np.where(full, lf_lo * L, hi_c)
        rem1 = Qp[a_end] - Qp[lo_c]
        rem2 = np.where(full, Qp[hi_c] - Qp[np.maximum(lf_hi * L, lo_c)],
                        0)
        rem = int(rem1.sum() + rem2.sum())
        nleaves = (ncols + L - 1) // L
        levels = max(1, (nleaves - 1).bit_length()) + 1
        spans = (lf_hi - lf_lo)[full]
        entries = 2 * len(spans) + 2 * int(
            np.log2(np.maximum(spans, 1)).sum())
        # weights fit to the empirical L sweeps on Spiral 32k/131k
        # (entries carry keys+lexsort+prefix work; remnant pairs are
        # a streaming cross test each)
        cost = rem + 13 * entries + 2 * nq * levels
        if best is None or cost < best[0]:
            best = (cost, L, lf_lo, lf_hi, full, a_end, rem1, rem2)
        elif cost > best[0] * 1.25:
            break           # well past the minimum
        L >>= 1
    _, L, lf_lo, lf_hi, full, a_end, rem1, rem2 = best
    if L == 1:
        rem1 = np.zeros(len(segs), np.int64)
        rem2 = rem1

    # ---- remnant pairs: exact cross tests, no ordering involved ----
    rr_start_parts = []
    rr_end_parts = []
    rr_seg_parts = []
    if L > 1:
        m1 = np.flatnonzero(rem1 > 0)
        if len(m1):
            rr_start_parts.append(lo_c[m1])
            rr_end_parts.append(a_end[m1])
            rr_seg_parts.append(m1)
        m2 = np.flatnonzero(rem2 > 0)
        if len(m2):
            rr_start_parts.append(np.maximum(lf_hi * L, lo_c)[m2])
            rr_end_parts.append(hi_c[m2])
            rr_seg_parts.append(m2)
    if rr_start_parts:
        rs = np.concatenate(rr_start_parts)
        re = np.concatenate(rr_end_parts)
        rg = np.concatenate(rr_seg_parts)
        pcr = Qp[re] - Qp[rs]
        qs_idx = np.argsort(q_col, kind="stable")
        # column-sorted query coords: the per-pair access below becomes
        # ascending runs instead of a double indirection through qs_idx
        qmx_srt = qmx_all[qs_idx]
        qmy_srt = qmy_all[qs_idx]
        cumr = np.concatenate(([0], np.cumsum(pcr)))
        # below-test as ux*qy - uy*qx > C, C precomputed per segment
        # (|c| <= 2^29 for this path keeps every term under 2^61)
        c_seg = 2 * (segs.ay * ux - segs.ax * uy)
        # contributions accumulate in SORTED query space (sequential
        # bincount keys); ONE scatter back to query ids at the end.
        # No boolean extraction anywhere: the below-mask multiplies the
        # winding weight instead (w = subj * (cross > c)), so the chunk
        # is 4 repeats + 2 sequential-run gathers + 3 arithmetic passes
        # + 1 weighted bincount — measured 1.5x over the extraction
        # form on Spiral 32k (8.9M pairs)
        acc_s = np.zeros(nq, np.float64)
        acc_c = np.zeros(nq, np.float64) if with_clip else None
        subj64 = segs.subj.astype(np.float64)
        clip64 = segs.clip.astype(np.float64) if with_clip else None
        CH = 1 << 21
        # reused scratch sized to the ACTUAL remnant total (the host
        # pays dearly for fresh large pages — see NOTES; a small query
        # shard must not first-touch the full 48MB chunk scratch)
        sz = int(min(CH, cumr[-1])) + 1
        t_a = np.empty(sz, np.int64)
        t_b = np.empty(sz, np.int64)
        ar = np.arange(sz, dtype=np.int64)
        r0 = 0
        nr = len(rs)
        while r0 < nr:
            r1 = min(nr, max(r0 + 1,
                             int(np.searchsorted(cumr, cumr[r0] + CH,
                                                 "left"))))
            tot = int(cumr[r1] - cumr[r0])
            if tot:
                if tot > len(t_a):   # a single run can cross CH
                    t_a = np.empty(tot, np.int64)
                    t_b = np.empty(tot, np.int64)
                    ar = np.arange(tot, dtype=np.int64)
                run = rg[r0:r1]
                pcs = pcr[r0:r1]
                # per-run gathers once, expanded by repeat (sequential
                # writes) instead of random gathers per PAIR
                ta = t_a[:tot]
                tb = t_b[:tot]
                uxr = np.repeat(ux[run], pcs)
                uyr = np.repeat(uy[run], pcs)
                cr = np.repeat(c_seg[run], pcs)
                # ascending query positions per run: base + offset
                np.add(ar[:tot],
                       np.repeat(Qp[rs[r0:r1]] - (cumr[r0:r1]
                                                  - cumr[r0]), pcs),
                       out=ta)
                np.multiply(uxr, qmy_srt[ta], out=tb)
                tb -= uyr * qmx_srt[ta]
                under = tb > cr
                w = np.repeat(subj64[run], pcs)
                w *= under
                acc_s += np.bincount(ta, weights=w, minlength=nq)
                if with_clip:
                    wc = np.repeat(clip64[run], pcs)
                    wc *= under
                    acc_c += np.bincount(ta, weights=wc, minlength=nq)
            r0 = r1
        # scatter back: position p in sorted space is query qs_idx[p]
        # (qs_idx is a permutation, so plain fancy-index add is safe)
        bot_subj[qs_idx] += acc_s.astype(np.int64)
        if with_clip:
            bot_clip[qs_idx] += acc_c.astype(np.int64)

    nleaves = (ncols + L - 1) // L
    N = 1 << max(1, (nleaves - 1).bit_length())
    keep = full
    lo = (lf_lo[keep] + N).copy()
    hi = (lf_hi[keep] + N).copy()
    seg_ids = np.flatnonzero(keep)

    # canonical segment-tree decomposition, all segments at once;
    # arrays are COMPACTED each level (no repeated fancy indexing into
    # the full-size buffers)
    node_parts = []
    seg_parts = []
    shift_parts = []            # tree level of each part (shifts applied)
    l = lo
    h = hi
    sid = seg_ids
    k_lvl = 0
    while len(l):
        oddl = (l & 1) == 1
        if oddl.any():
            node_parts.append(l[oddl].copy())
            seg_parts.append(sid[oddl].copy())
            shift_parts.append(k_lvl)
            l = l + oddl
        oddh = (h & 1) == 1
        if oddh.any():
            h = h - oddh
            node_parts.append(h[oddh].copy())
            seg_parts.append(sid[oddh].copy())
            shift_parts.append(k_lvl)
        l >>= 1
        h >>= 1
        k_lvl += 1
        keep = l < h
        l = l[keep]
        h = h[keep]
        sid = sid[keep]
    if not node_parts:
        return bot_subj, bot_clip
    nodes = np.concatenate(node_parts)
    segids = np.concatenate(seg_parts)
    shifts = np.repeat(np.asarray(shift_parts, np.int64),
                       [len(p) for p in node_parts])

    # within-node order: y at the node's first covered column, slope
    # tie-break (shared left endpoints). Sort on FLOAT keys; any
    # adjacency closer than the float error bound is re-sorted with the
    # exact two-part rational keys (and an exact Fraction pass on
    # truncation collisions) — the exact arithmetic runs only on the
    # few ambiguous runs, not all replicated entries.
    # first covered leaf of node v emitted after k shifts = (v<<k) - N;
    # its first column is leaf * L (all segments in the node span the
    # node's full leaf range, so this column is covered by every one)
    first_leaf = (nodes << shifts) - N
    xstar = X[np.minimum(first_leaf * L, ncols - 1)]
    g = segids
    den = ux[g]
    dxs = xstar - tax2[g]
    # key split as exact-int + rational-correction so the error bound
    # tracks the CORRECTION's magnitude, not the full key's — a plain
    # num/den loses the bound to cancellation when 2*ay*den and
    # uy*dx nearly cancel
    t2 = (uy[g] * dxs) / den
    fkey = 2 * segs.ay[g] + t2
    errf = (np.abs(t2) + np.abs(fkey)) * 2.0 ** -50
    errf[(uy[g] == 0) | (dxs == 0)] = 0.0   # t2 == 0 exactly
    fslope = uy[g] / den
    errs = np.abs(fslope) * 2.0 ** -50
    errs[uy[g] == 0] = 0.0
    order = np.lexsort((fslope, fkey, nodes))
    fkey_s = fkey[order]
    nodes_s = nodes[order]
    seg_s = segids[order]
    # ambiguous adjacency: same node, float keys within combined error
    # (exact-equal keys fall through to the slope check; exact-equal
    # keys AND certain slope order need no fix)
    errf_s = errf[order]
    errs_s = errs[order]
    fs_s = fslope[order]
    df = np.abs(fkey_s[1:] - fkey_s[:-1])
    es = errf_s[1:] + errf_s[:-1]
    dfs = np.abs(fs_s[1:] - fs_s[:-1])
    ess = errs_s[1:] + errs_s[:-1]
    amb = (nodes_s[1:] == nodes_s[:-1]) & (df <= es) \
        & ((es > 0) | ((dfs <= ess) & (ess > 0)))
    if amb.any():
        bounds_r = np.flatnonzero(np.concatenate(([True], ~amb)))
        L = len(order)
        run_len = np.diff(np.concatenate((bounds_r, [L])))
        flagged = np.flatnonzero(run_len > 1)
        if len(flagged):
            starts = bounds_r[flagged]
            lens = run_len[flagged]
            tot = int(lens.sum())
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            pos = np.arange(tot, dtype=np.int64) \
                - np.repeat(offs, lens) + np.repeat(starts, lens)
            rid = np.repeat(np.arange(len(flagged), dtype=np.int64),
                            lens)
            rows = order[pos]
            gr = segids[rows]
            den_r = den[rows]
            num_r = 2 * segs.ay[gr] * den_r + uy[gr] * dxs[rows]
            uy_r = uy[gr]
            k1 = num_r // den_r
            rem = num_r - k1 * den_r
            k2 = (rem << 31) // den_r
            s1 = uy_r // den_r
            srem = uy_r - s1 * den_r
            s2 = (srem << 31) // den_r
            sub = np.lexsort((s2, s1, k2, k1, rid))
            order[pos] = rows[sub]
            # truncated-key collisions inside a run still need the
            # exact Fraction comparator (rare: distinct rationals whose
            # floor+31-bit-fraction keys coincide)
            k1s, k2s = k1[sub], k2[sub]
            s1s, s2s = s1[sub], s2[sub]
            trunc = (rem[sub] != 0) | (srem[sub] != 0)
            eq2 = (rid[1:] == rid[:-1]) & (k1s[1:] == k1s[:-1]) \
                & (k2s[1:] == k2s[:-1]) & (s1s[1:] == s1s[:-1]) \
                & (s2s[1:] == s2s[:-1]) & (trunc[1:] | trunc[:-1])
            if eq2.any():
                from fractions import Fraction
                nmap = dict(zip(rows.tolist(), num_r.tolist()))
                b2 = np.flatnonzero(np.concatenate(([True], ~eq2)))
                ends2 = np.concatenate((b2, [tot]))
                long2 = np.flatnonzero(np.diff(ends2) > 1)
                for rr in long2.tolist():
                    a0 = int(ends2[rr])
                    b0 = int(ends2[rr + 1])
                    p2 = pos[a0:b0]
                    rows2 = order[p2].tolist()
                    rows2.sort(key=lambda r: (
                        Fraction(nmap[r], int(den[r])),
                        Fraction(int(uy[segids[r]]), int(den[r]))))
                    order[p2] = rows2
        nodes_s = nodes[order]
        seg_s = segids[order]
    # per-node bounds + prefix sums (exclusive); nodes_s is sorted, so
    # run boundaries come from a diff, not a second sort
    nb = np.concatenate(([True], nodes_s[1:] != nodes_s[:-1]))
    node_first = np.flatnonzero(nb)
    uniq_nodes = nodes_s[node_first]
    node_last = np.concatenate((node_first[1:], [len(nodes_s)]))
    csum_s = np.concatenate(([0], np.cumsum(segs.subj[seg_s])))
    csum_c = np.concatenate(([0], np.cumsum(segs.clip[seg_s]))) \
        if with_clip else None

    ux_s = ux[seg_s]
    uy_s = uy[seg_s]
    # per-entry cross constant: below-test is ux*(qy-2ay) - uy*(qx-2ax)
    # = ux*qy - uy*qx - C with C = 2*(ay*ux - ax*uy); |c| < 2^30 keeps
    # both products under 2^62, their difference under 2^63 - 2 and
    # |C| under 2^62: no overflow
    c_s = 2 * (segs.ay[seg_s] * ux_s - segs.ax[seg_s] * uy_s)
    leaf = q_col // L + N
    levels = int(N).bit_length()
    # collect ALL (query, ancestor-node) hits first, then rank every
    # hit in ONE simultaneous binary-search loop — ~log(max node size)
    # numpy passes total instead of levels x log small-array passes.
    # node -> slot is a dense 2N-entry table (nodes < 2N, table fits
    # L1/L2): one cached gather per level instead of a log-width
    # searchsorted over uniq_nodes per query
    node_pos = np.full(2 * N, -1, np.int64)
    node_pos[uniq_nodes] = np.arange(len(uniq_nodes), dtype=np.int64)
    hit_qs = []
    hit_start = []
    hit_len = []
    for _ in range(levels):
        pos = node_pos[leaf]
        hit = pos >= 0
        if hit.any():
            qs = np.flatnonzero(hit)
            hit_qs.append(qs)
            hit_start.append(node_first[pos[qs]])
            hit_len.append(node_last[pos[qs]] - node_first[pos[qs]])
        leaf >>= 1
    if hit_qs:
        qs = np.concatenate(hit_qs)
        start = np.concatenate(hit_start)
        b_lo = np.zeros(len(qs), dtype=np.int64)
        b_hi = np.concatenate(hit_len).astype(np.int64)
        qx = qmx_all[qs]
        qy = qmy_all[qs]
        # prefix-sliced simultaneous binary search: a hit of initial
        # width w needs at most floor(log2(w))+1 probes, so sorting
        # hits by width DESC makes the still-active set a contiguous
        # PREFIX — per-iteration bookkeeping becomes slices + masked
        # copyto instead of 7 fancy-index ops on a compacted set
        # (~1.2x measured on Spiral 32k; bit-identical)
        widths = b_hi
        order = np.argsort(-widths, kind="stable")
        w_s = widths[order]
        b_lo = np.zeros(len(order), np.int64)
        b_hi = w_s.copy()
        st_s = start[order]
        qx_s = qx[order]
        qy_s = qy[order]
        neg_w = -w_s
        k = 0
        while True:
            # rows with w < 2^k are certainly converged — shrink prefix
            n_act = int(np.searchsorted(neg_w, -(1 << k), side="right"))
            if n_act == 0:
                break
            loa = b_lo[:n_act]
            hia = b_hi[:n_act]
            active = loa < hia
            mid = (loa + hia) >> 1
            # converged rows probe a safe (discarded) index
            np.minimum(mid, w_s[:n_act] - 1, out=mid)
            t = st_s[:n_act] + mid
            below = ux_s[t] * qy_s[:n_act] - uy_s[t] * qx_s[:n_act] \
                > c_s[t]
            np.copyto(loa, mid + 1, where=below & active)
            np.copyto(hia, mid, where=(~below) & active)
            k += 1
        res = np.empty(len(order), np.int64)
        res[order] = b_lo
        r = start + res
        # winding prefix sums are integer-valued and << 2^53, so the
        # float64 bincount accumulation is exact
        bot_subj += np.bincount(
            qs, weights=(csum_s[r] - csum_s[start]).astype(np.float64),
            minlength=nq).astype(np.int64)
        if with_clip:
            bot_clip += np.bincount(
                qs, weights=(csum_c[r] - csum_c[start]).astype(np.float64),
                minlength=nq).astype(np.int64)
    return bot_subj, bot_clip


def _rect_windings(segs: Segments, q_pos, with_clip: bool, ctx: dict):
    """Winding below doubled points for fully RECTILINEAR scenes.

    Vertical segments have an empty half-open x-span [2ax, 2ax) and
    never cover a stab; a horizontal segment at y=ay counts exactly
    when 2ax <= qx < 2bx and 2ay < qy. So the answer is a pure prefix
    sum: decompose each H x-span over a segment tree of the query
    columns, sort each node's members by 2ay with winding prefix sums,
    and every query reads ONE searchsorted position per ancestor level
    — no float keys, no exact-rational re-sorts, no rank search.
    Bit-exact with the generic engines (same strict-below semantics)."""
    nq = len(q_pos)
    bot_subj = np.zeros(nq, dtype=np.int64)
    bot_clip = np.zeros(nq, dtype=np.int64)
    qmx = ctx["qmx"]
    qmy = ctx["qmy"]
    X = ctx["X"]
    q_col = ctx["q_col"]
    hmask = (segs.ay == segs.by) & (segs.ax != segs.bx)
    hsel = np.flatnonzero(hmask)
    if not len(hsel) or not len(X):
        return bot_subj, bot_clip
    lo = ctx["lo"][hsel]
    hi = ctx["hi"][hsel]
    keep = hi > lo
    hsel = hsel[keep]
    lo = lo[keep]
    hi = hi[keep]
    if not len(hsel):
        return bot_subj, bot_clip
    ncols = len(X)
    N = 1 << max(1, (ncols - 1).bit_length())
    l = (lo + N).copy()
    h = (hi - 1 + N).copy()     # inclusive leaf range
    sid = hsel
    node_parts = []
    mem_parts = []
    while len(l):
        oddl = (l & 1) == 1
        if oddl.any():
            node_parts.append(l[oddl].copy())
            mem_parts.append(sid[oddl].copy())
            l = l + oddl
        evenh = (h & 1) == 0
        if evenh.any():
            node_parts.append(h[evenh].copy())
            mem_parts.append(sid[evenh].copy())
            h = h - evenh
        l >>= 1
        h >>= 1
        keep2 = l <= h
        l = l[keep2]
        h = h[keep2]
        sid = sid[keep2]
    if not node_parts:
        return bot_subj, bot_clip
    nodes = np.concatenate(node_parts).astype(np.int64)
    mem = np.concatenate(mem_parts)
    OFF = np.int64(1) << 32
    BASE = np.int64(1) << 33
    packed = nodes * BASE + (2 * segs.ay[mem] + OFF)
    o = np.argsort(packed, kind="stable")
    packed_s = packed[o]
    mem_s = mem[o]
    csum_s = np.concatenate(([0], np.cumsum(segs.subj[mem_s])))
    csum_c = np.concatenate(([0], np.cumsum(segs.clip[mem_s]))) \
        if with_clip else None
    leaf = (q_col + N).astype(np.int64)
    levels = int(N).bit_length()
    qk = qmy + OFF
    for _ in range(levels):
        base = leaf * BASE
        nb = np.searchsorted(packed_s, base)
        pos = np.searchsorted(packed_s, base + qk, side="left")
        bot_subj += csum_s[pos] - csum_s[nb]
        if with_clip:
            bot_clip += csum_c[pos] - csum_c[nb]
        leaf >>= 1
    return bot_subj, bot_clip


def _pair_windings(segs: Segments, mx, my, q_pos, with_clip: bool = True,
                   ctx: dict | None = None):
    """Winding below doubled points by direct exact pair evaluation.

    Candidate (segment, query) pairs are generated by bucketing the
    queries into their distinct-x columns and expanding each segment
    over the queries of the columns its half-open x-span covers — the
    column containment IS the cover test (searchsorted bounds are
    exact), so each pair needs only one int64 cross test: no sort
    keys, no rational arithmetic, no tie handling at all.  The cheapest
    engine whenever total pairs stay near the column-replication count
    (queries spread over distinct columns — the spiral / sparse-scene
    regime); dense repeated query columns blow the pair budget and are
    handled by the column-prefix sweep or the segment tree instead.
    """
    nq = len(q_pos)
    bot_subj = np.zeros(nq, dtype=np.int64)
    bot_clip = np.zeros(nq, dtype=np.int64)
    if nq == 0 or len(segs) == 0:
        return bot_subj, bot_clip
    if ctx is not None:
        qmx_all = ctx["qmx"]
        qmy_all = ctx["qmy"]
        ux, uy = ctx["ux"], ctx["uy"]
        X, lo, hi, q_col, Qp = (ctx["X"], ctx["lo"], ctx["hi"],
                                ctx["q_col"], ctx["Qp"])
    else:
        qmx_all = mx[q_pos]
        qmy_all = my[q_pos]
        tax2 = 2 * segs.ax
        tbx2 = 2 * segs.bx
        ux = segs.bx - segs.ax
        uy = segs.by - segs.ay
        X = np.unique(qmx_all)
        lo = np.searchsorted(X, tax2, side="left")
        hi = np.searchsorted(X, tbx2, side="left")
        q_col = np.searchsorted(X, qmx_all)
        Qp = np.concatenate(([0], np.cumsum(np.bincount(
            q_col, minlength=len(X)))))
    pc = Qp[hi] - Qp[lo]                 # queries per segment
    cum = np.concatenate(([0], np.cumsum(pc)))
    qs_idx = np.argsort(q_col, kind="stable")
    n = len(segs)
    # below-test as ux*qy - uy*qx > C with C precomputed per segment;
    # |c| < 2^30 keeps both products under 2^62, the difference under
    # 2^63 - 2, and |C| under 2^62: no overflow
    c_seg = 2 * (segs.ay * ux - segs.ax * uy)
    CH = 1 << 21                         # pairs per chunk; 16MB int64 temps
    s0 = 0
    while s0 < n:
        s1 = min(n, max(s0 + 1,
                        int(np.searchsorted(cum, cum[s0] + CH, "left"))))
        tot = int(cum[s1] - cum[s0])
        if tot:
            pcs = pc[s0:s1]
            srep = np.repeat(np.arange(s0, s1, dtype=np.int64), pcs)
            j = np.arange(tot, dtype=np.int64) \
                - np.repeat(cum[s0:s1] - cum[s0], pcs)
            qidx = qs_idx[np.repeat(Qp[lo[s0:s1]], pcs) + j]
            under = ux[srep] * qmy_all[qidx] \
                - uy[srep] * qmx_all[qidx] > c_seg[srep]   # strictly below
            if under.any():
                qi = qidx[under]
                su = srep[under]
                # counts are tiny ints: float64 bincount is exact
                bot_subj += np.bincount(
                    qi, weights=segs.subj[su], minlength=nq
                ).astype(np.int64)
                if with_clip:
                    bot_clip += np.bincount(
                        qi, weights=segs.clip[su], minlength=nq
                    ).astype(np.int64)
        s0 = s1
    return bot_subj, bot_clip


def _stab_windings(segs: Segments, mx, my, q_pos, block: int = 256,
                   with_clip: bool = True):
    """Winding below the doubled points (mx, my) (queries in ax-sorted
    position order ``q_pos``) against ALL segments of ``segs`` (sorted
    by ax).

    Fast path (column-prefix sweep, O(n log n)): segments are
    replicated once per DISTINCT query column they cover, keyed by an
    exact scaled rational y-at-x (scale C >= U^2 where U is the max
    x-extent, so the integer keys order exactly like the rationals —
    no crossings exist post-split, so the per-column order is a total
    order), then one global lexsort + segmented prefix sum answers
    every query. Dense-grid workloads (LinesNet) are O(n^2) under the
    pairwise stab; this path restores the reference sweep's
    complexity. Falls back to the exact pairwise window scan when the
    scaled keys could overflow int64; the long tail above the
    99th-percentile span is always handled pairwise so a few
    full-width edges don't inflate U."""
    nq = len(q_pos)
    bot_subj = np.zeros(nq, dtype=np.int64)
    bot_clip = np.zeros(nq, dtype=np.int64)
    if nq == 0 or len(segs) == 0:
        return bot_subj, bot_clip

    tax2 = 2 * segs.ax
    tbx2 = 2 * segs.bx
    ux = segs.bx - segs.ax
    uy = segs.by - segs.ay
    spans = tbx2 - tax2

    # Pick the span threshold separating fast-path (column-replicated)
    # segments from the pairwise long tail.  Prefer the LARGEST
    # threshold whose scaled keys still fit int64 and whose column
    # replication stays within budget — ideally max(span), making the
    # tail empty (a dense long tail is O(nq * n_long) pairwise).
    qmx_all = mx[q_pos]
    qmy_all = my[q_pos]
    X = np.unique(qmx_all)
    lo_all = np.searchsorted(X, tax2, side="left")
    hi_all = np.searchsorted(X, tbx2, side="left")
    counts_all = np.maximum(hi_all - lo_all, 0)
    # direct-pair engine first: when total (segment, covered-query)
    # pairs stay within budget, one exact cross test per pair beats
    # every sort-based engine (no keys, no ties)
    q_col0 = np.searchsorted(X, qmx_all)
    Qp0 = np.concatenate(([0], np.cumsum(
        np.bincount(q_col0, minlength=len(X))))).astype(np.int64)
    # shared probe context: the chosen engine reuses the unique/
    # searchsorted setup instead of recomputing it (~0.1-0.15 s on
    # Spiral-class scenes)
    ctx = {"X": X, "lo": lo_all, "hi": hi_all, "q_col": q_col0,
           "Qp": Qp0, "tax2": tax2, "tbx2": tbx2, "ux": ux, "uy": uy,
           "qmx": qmx_all, "qmy": qmy_all}
    if _RECT_FAST and bool(np.all((uy == 0) | (ux == 0))):
        # fully rectilinear: pure prefix-sum engine, O((n+q) log n)
        # with no exact-rational work at all
        return _rect_windings(segs, q_pos, with_clip, ctx)
    n_pairs = int((Qp0[hi_all] - Qp0[lo_all]).sum())
    if n_pairs <= max(4_000_000, 16 * max(len(segs), nq)):
        return _pair_windings(segs, mx, my, q_pos, with_clip, ctx)
    y_max = max(float(np.abs(segs.ay).max()),
                float(np.abs(segs.by).max()), 1.0)
    rep_budget = 8 * max(len(segs), nq)
    uy_max = float(np.abs(uy).max()) if len(uy) else 1.0
    threshold = None
    if len(spans):
        for qtile in (1.0, 0.999, 0.99):
            thr = int(spans.max()) if qtile >= 1.0 else \
                int(np.quantile(spans, qtile))
            sm = spans <= thr
            s_ux = ux[sm & (ux > 0)]
            U = float(s_ux.max()) if len(s_ux) else 1.0
            # two-part exact key: |num| <= 2*y_max*U + uy_max*2*U
            if (2.0 * U * (y_max + uy_max) < 2.0 ** 62
                    and int(counts_all[sm].sum()) <= rep_budget):
                threshold = thr
                break
    if threshold is None:
        if nq > 2048:
            # replication over budget or keys overflow: the segment-tree
            # sweep handles dense-column workloads in O(n log^2 n)
            return _tree_windings(segs, mx, my, q_pos, with_clip, ctx)
        threshold = int(np.quantile(spans, 0.99)) if len(spans) > 64 \
            else int(spans.max())
    long_mask = spans > threshold
    long_idx = np.flatnonzero(long_mask)

    def add_pairwise(q0, q1, cols):
        qmx = mx[q_pos[q0:q1], None]
        qmy = my[q_pos[q0:q1], None]
        cover = (tax2[None, cols] <= qmx) & (qmx < tbx2[None, cols])
        # strictly under: cross((b-a), (m - 2a)) > 0
        cr = ux[None, cols] * (qmy - 2 * segs.ay[None, cols]) - \
            uy[None, cols] * (qmx - 2 * segs.ax[None, cols])
        under = cover & (cr > 0)
        bot_subj[q0:q1] += under @ segs.subj[cols]
        if with_clip:
            bot_clip[q0:q1] += under @ segs.clip[cols]

    # ---- column-prefix fast path over the short segments ----
    short = np.flatnonzero(~long_mask)
    done_fast = False
    if len(short):
        s_ux = ux[short]
        nz = s_ux > 0
        U = float(s_ux[nz].max()) if nz.any() else 1.0
        lo = lo_all[short]
        counts = counts_all[short]
        total = int(counts.sum())
        if 2.0 * U * (y_max + uy_max) < 2.0 ** 62 and total <= rep_budget:
            rep = np.repeat(np.arange(len(short), dtype=np.int64), counts)
            offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
            rep_col = np.arange(total, dtype=np.int64) \
                - np.repeat(offs, counts) + np.repeat(lo, counts)
            g = short[rep]
            x2 = X[rep_col]
            den = ux[g]
            dx2 = x2 - tax2[g]
            # FLOAT keys, split as exact-int + rational-correction (the
            # error bound must track the correction, not the full key —
            # plain num/den loses it to cancellation); only runs where
            # a query lands within the combined float error of a
            # segment key get the exact two-part rational re-sort.
            # Seg-vs-seg order inside a tie run never moves a query's
            # prefix count, and the exact keys + tag tiebreak resolve
            # every seg-vs-query relation exactly (truncated fraction
            # ties put the query first, which IS the strict-below
            # answer), so no Fraction pass is needed here.
            t2 = (uy[g] * dx2) / den
            fkey = 2 * segs.ay[g] + t2
            errb = (np.abs(t2) + np.abs(fkey)) * 2.0 ** -50
            errb[(uy[g] == 0) | (dx2 == 0)] = 0.0
            q_col = np.searchsorted(X, qmx_all)

            col_all = np.concatenate((rep_col, q_col))
            tag = np.concatenate((np.ones(total, np.int8),
                                  np.zeros(nq, np.int8)))
            s_all = np.concatenate((segs.subj[g], np.zeros(nq, np.int64)))
            c_all = np.concatenate((segs.clip[g], np.zeros(nq, np.int64))) \
                if with_clip else None
            if not errb.any() and y_max < 2.0 ** 30 \
                    and len(X) < (1 << 29) \
                    and (nq == 0 or np.abs(qmy_all).max() < (1 << 31)):
                # every key exactly integral (rectilinear scenes:
                # uy == 0 or the query column is the segment start):
                # pack (col, doubled-y, tag) into one int64 and replace
                # the 3-key lexsort with a single sort; the tag bit
                # keeps queries before equal-keyed segments (equal =
                # passes through the stab point = not strictly below).
                # Gated on doubled-y fitting 32 bits and the column id
                # fitting the remaining 29.
                ki = np.empty(total + nq, np.int64)
                ki[:total] = fkey.astype(np.int64)
                ki[total:] = qmy_all
                key = (col_all << np.int64(34)) \
                    | ((ki + np.int64(1 << 31)) << np.int64(1)) \
                    | tag
                order = np.argsort(key, kind="stable")
                col_s = col_all[order]
                amb = np.zeros(0, dtype=bool)
            else:
                f_all = np.concatenate((fkey, qmy_all.astype(np.float64)))
                e_all = np.concatenate((errb, np.zeros(nq)))
                order = np.lexsort((tag, f_all, col_all))
                col_s = col_all[order]
                f_s = f_all[order]
                e_s = e_all[order]
                es_sum = e_s[1:] + e_s[:-1]
                amb = (col_s[1:] == col_s[:-1]) \
                    & (np.abs(f_s[1:] - f_s[:-1]) <= es_sum) \
                    & (es_sum > 0)
            if amb.any():
                tag_s = tag[order]
                bounds_r = np.flatnonzero(
                    np.concatenate(([True], ~amb)))
                L = len(order)
                run_len = np.diff(np.concatenate((bounds_r, [L])))
                qry_any = np.add.reduceat(
                    (tag_s == 0).astype(np.int64), bounds_r) > 0
                seg_any = np.add.reduceat(
                    (tag_s == 1).astype(np.int64), bounds_r) > 0
                flagged = np.flatnonzero(
                    (run_len > 1) & qry_any & seg_any)
                if len(flagged):
                    starts = bounds_r[flagged]
                    lens = run_len[flagged]
                    tot = int(lens.sum())
                    offs2 = np.concatenate(([0], np.cumsum(lens)))[:-1]
                    pos = np.arange(tot, dtype=np.int64) \
                        - np.repeat(offs2, lens) + np.repeat(starts, lens)
                    rid = np.repeat(
                        np.arange(len(flagged), dtype=np.int64), lens)
                    rows = order[pos]
                    is_seg = rows < total
                    k1_r = np.empty(tot, np.int64)
                    k2_r = np.zeros(tot, np.int64)
                    sr = rows[is_seg]
                    num_sr = 2 * segs.ay[g[sr]] * den[sr] \
                        + uy[g[sr]] * dx2[sr]
                    k1_r[is_seg] = num_sr // den[sr]
                    rem = num_sr - k1_r[is_seg] * den[sr]
                    k2_r[is_seg] = (rem << 31) // den[sr]
                    qr = rows[~is_seg] - total
                    k1_r[~is_seg] = qmy_all[qr]
                    sub = np.lexsort((tag[rows], k2_r, k1_r, rid))
                    order[pos] = rows[sub]
            run_start = np.concatenate(
                ([True], col_s[1:] != col_s[:-1]))
            # forward-fill each row's column-start index (indices are
            # monotone, unlike the signed cumsum)
            start_rows = np.maximum.accumulate(
                np.where(run_start, np.arange(len(order)), 0))
            # positions of query rows in the sorted order
            inv = np.empty(len(order), np.int64)
            inv[order] = np.arange(len(order))
            q_rows = inv[total:]
            excl_s = np.cumsum(s_all[order]) - s_all[order]
            bot_subj[:] = excl_s[q_rows] - excl_s[start_rows[q_rows]]
            if with_clip:
                excl_c = np.cumsum(c_all[order]) - c_all[order]
                bot_clip[:] = excl_c[q_rows] - excl_c[start_rows[q_rows]]
            done_fast = True

    if done_fast:
        # add the long tail exactly, block-pairwise, windowed to the
        # long segments whose x-span actually intersects each block
        if len(long_idx):
            l_ord = long_idx[np.argsort(tax2[long_idx], kind="stable")]
            l_tax2 = tax2[l_ord]
            l_tbx2_max = np.maximum.accumulate(tbx2[l_ord])
            for q0 in range(0, nq, 4096):
                q1 = min(nq, q0 + 4096)
                qlo = int(qmx_all[q0:q1].min())
                qhi = int(qmx_all[q0:q1].max())
                c1 = int(np.searchsorted(l_tax2, qhi, side="right"))
                # candidates start where the running max bx2 first
                # exceeds qlo (sorted by ax2; spans vary, so use the
                # prefix-max of bx2 as a conservative left bound)
                c0 = int(np.searchsorted(l_tbx2_max[:c1], qlo,
                                         side="right"))
                sel = l_ord[c0:c1]
                sel = sel[tbx2[sel] > qlo]
                if len(sel):
                    add_pairwise(q0, q1, sel)
        return bot_subj, bot_clip

    # ---- exact pairwise fallback (windowed by the span threshold) ----
    for q0 in range(0, nq, block):
        q1 = min(nq, q0 + block)
        qmx = qmx_all[q0:q1]
        qlo = int(qmx.min())
        qhi = int(qmx.max())
        c0 = int(np.searchsorted(tax2, qlo - threshold, side="left"))
        c1 = int(np.searchsorted(tax2, qhi, side="right"))
        extra = long_idx[(long_idx < c0) | (long_idx >= c1)] \
            if len(long_idx) else long_idx
        if len(extra):
            add_pairwise(q0, q1, np.concatenate((extra,
                                                 np.arange(c0, c1))))
        else:
            add_pairwise(q0, q1, slice(c0, c1))

    return bot_subj, bot_clip


def compute_fills(segs: Segments, fill_rule: int,
                  block: int = 256) -> np.ndarray:
    """4-bit SUBJ/CLIP top/bottom fill mask per split segment."""
    if len(segs) == 0:
        return np.zeros(0, dtype=np.uint8)
    # subject-only scenes (e.g. Spiral): skip all clip-side winding
    # accumulation — bot_clip is identically zero
    with_clip = bool(segs.clip.any())
    bot_subj, bot_clip = bottom_windings(segs, block, with_clip=with_clip)
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
