"""Tile-distributed boolean overlay — BIT-EXACT with the single kernel.

Round-2 re-architecture following the reference's fragment model
(split/solver_fragment.rs:107-178, split/grid_layout.rs): segments are
NEVER cut at strip borders. Instead:

1. SPLIT: every whole parent segment is REPLICATED into each x-bin its
   half-open span [ax, bx) covers (the `Fragment` analog: same segment,
   per-bin membership). Each bin classifies its local pairs with the
   exact cross solver on the WHOLE segments, so every mark point is the
   same integer the single kernel computes; a pair sharing several bins
   emits identical duplicate marks, deduplicated by the sort+dedup in
   `_apply_marks` (split/solver.rs:158-251 does the same). Marks apply
   to PARENT segments globally (the cross-bin "mark shuffle"), and the
   snap-radius loop iterates exactly like `split_segments`. A vertical
   segment lying exactly ON a border replicates one bin LEFT as well —
   the `on_border_split` case (solver_fragment.rs:180-218): segments
   ending at that border live only in the left bin, and their endpoints
   can split the vertical.
   => `binned_split` produces the IDENTICAL segment set as
   `kernel.split_segments` (asserted in tests on random scenes).

2. FILL: each split segment is replicated to every strip its span
   covers; the strip containing its doubled-midpoint x OWNS it and
   computes its winding stab from all local replicas — the local cover
   set equals the global cover set for that x, so fills are bit-equal
   to `compute_fills` (the "winding carry-in" from SURVEY 7.2 realized
   as replication instead of a prefix-sum shuffle).

3. EXTRACT: included boundary edges (region-on-left oriented) are owned
   by the strip of their TAIL point; all outgoing edges of a node
   therefore live in the node's strip. A strip walks chains with the
   leftmost-turn successor rule, breaking at any node that has REMOTE
   incoming edges (local_in < local_out detects this exactly). Chains
   end/start at TRUE nodes — no synthetic border vertices — so stitched
   rings carry exactly the single kernel's boundary geometry.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .extract import join_holes, _left_bottom_segment
from .kernel import (FILL_RULE_NAMES, RULE_NAMES, Segments,
                     _apply_marks, _candidate_pair_blocks, _cat_marks,
                     _classify_pairs,
                     bottom_windings, build_segments, is_fill_top,
                     rule_include_mask, sort_merge)

Point = Tuple[int, int]

DEFAULT_STRIP_W = 256


# ---------------------------------------------------------------------------
# Phase 1: bit-exact binned split
# ---------------------------------------------------------------------------

def bin_membership(segs: Segments, strip_w: int):
    """(bin_ids, seg_idx) replication arrays: every bin a segment's
    half-open x-span [ax, bx) covers; verticals exactly on a border also
    join the LEFT bin (the on_border_split analog)."""
    n = len(segs)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    i0 = segs.ax // strip_w
    i1 = np.where(segs.bx > segs.ax, (segs.bx - 1) // strip_w, i0)
    counts = (i1 - i0 + 1).astype(np.int64)
    seg_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
    bins = np.arange(len(seg_idx), dtype=np.int64) - np.repeat(offs, counts) \
        + np.repeat(i0, counts)
    # vertical-on-border: replicate one bin left so left-bin segments
    # ending at the border can mark the vertical's interior
    vob = (segs.ax == segs.bx) & (segs.ax % strip_w == 0)
    if vob.any():
        extra = np.flatnonzero(vob)
        bins = np.concatenate([bins, i0[extra] - 1])
        seg_idx = np.concatenate([seg_idx, extra])
    return bins, seg_idx


def _find_marks_binned(segs: Segments, radius: int, strip_w: int):
    """Per-bin pair classification over WHOLE segments. The mark set is
    the same as the global list path's (duplicates from shared bins are
    deduped in _apply_marks), because any crossing pair shares at least
    one bin and marks depend only on the two whole segments."""
    bins, seg_idx = bin_membership(segs, strip_w)
    order = np.argsort(bins, kind="stable")  # stable: keeps (a,b) order
    bins = bins[order]
    seg_idx = seg_idx[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], bins[1:] != bins[:-1])))
    bounds = np.concatenate((starts, [len(bins)]))

    m_idx: list = []
    m_px: list = []
    m_py: list = []
    any_round = False
    for k in range(len(starts)):
        lo, hi = bounds[k], bounds[k + 1]
        idx = seg_idx[lo:hi]
        if len(idx) < 2:
            continue
        # subset preserves the global (a, b) sort order
        loc = segs.take(idx)
        lm_idx: list = []
        lm_px: list = []
        lm_py: list = []
        for ii, jj in _candidate_pair_blocks(loc):
            r = _classify_pairs(loc, ii, jj, radius, lm_idx, lm_px, lm_py)
            any_round |= r
        if lm_idx:
            m_idx.append(idx[_cat_marks(lm_idx)])
            m_px.append(_cat_marks(lm_px))
            m_py.append(_cat_marks(lm_py))
    return (_cat_marks(m_idx), _cat_marks(m_px), _cat_marks(m_py),
            any_round)


def binned_split(segs: Segments, strip_w: int = DEFAULT_STRIP_W,
                 max_rounds: int = 1000) -> Segments:
    """Distributed-shape split: same fixed point as
    kernel.split_segments, with candidate generation per x-bin and
    marks applied to whole parents each round."""
    segs = sort_merge(segs)
    if len(segs) < 2:
        return segs
    exp = 0
    for _ in range(max_rounds):
        radius = 1 << exp
        m_idx, m_px, m_py, any_round = _find_marks_binned(
            segs, radius, strip_w)
        if len(m_idx) == 0:
            return segs
        segs = _apply_marks(segs, m_idx, m_px, m_py)
        exp = min(60, exp + 1)
        if not any_round or len(segs) < 2:
            if not any_round:
                return segs
    return segs


# ---------------------------------------------------------------------------
# Phase 2: per-strip fill (owner = doubled-midpoint strip)
# ---------------------------------------------------------------------------

def strip_membership(segs: Segments, strip_w: int):
    """(strips, seg_idx, owner_mask) replication for the fill phase.
    A segment joins every strip its half-open span covers (verticals:
    the strip of their x); it is OWNED by the strip containing its
    doubled-midpoint x, which is always one of its covered strips."""
    n = len(segs)
    i0 = segs.ax // strip_w
    i1 = np.where(segs.bx > segs.ax, (segs.bx - 1) // strip_w, i0)
    counts = (i1 - i0 + 1).astype(np.int64)
    seg_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
    strips = np.arange(len(seg_idx), dtype=np.int64) \
        - np.repeat(offs, counts) + np.repeat(i0, counts)
    owner_strip = (segs.ax + segs.bx) // (2 * strip_w)
    owner = strips == owner_strip[seg_idx]
    return strips, seg_idx, owner


def strip_fills(segs: Segments, fill_rule: int,
                strip_w: int = DEFAULT_STRIP_W) -> np.ndarray:
    """Bit-equal to kernel.compute_fills, computed strip-locally: each
    strip stabs its OWNED segments' midpoints against all local
    replicas (the local cover set equals the global one)."""
    n = len(segs)
    fills = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return fills
    strips, seg_idx, owner = strip_membership(segs, strip_w)
    order = np.argsort(strips, kind="stable")
    strips, seg_idx, owner = strips[order], seg_idx[order], owner[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], strips[1:] != strips[:-1])))
    bounds = np.concatenate((starts, [len(strips)]))
    from .kernel import fills_from_windings
    for k in range(len(starts)):
        lo, hi = bounds[k], bounds[k + 1]
        idx = seg_idx[lo:hi]
        own = owner[lo:hi]
        if not own.any():
            continue
        loc = segs.take(idx)
        q = np.flatnonzero(own)
        bot_subj, bot_clip = bottom_windings_subset(loc, q)
        g = idx[q]
        fills[g] = fills_from_windings(segs.subj[g], segs.clip[g],
                                       bot_subj, bot_clip, fill_rule)
    return fills


def bottom_windings_subset(segs: Segments, q_idx: np.ndarray,
                           block: int = 256):
    """bottom_windings for a subset of query rows against ALL rows of
    ``segs`` (already sorted by ax); long-tail-aware windowing shared
    with the kernel."""
    from .kernel import _stab_windings
    mx = segs.ax + segs.bx
    my = segs.ay + segs.by
    return _stab_windings(segs, mx, my, np.asarray(q_idx, np.int64), block)


# ---------------------------------------------------------------------------
# Phase 3: oriented edges, per-strip chain walk, stitch
# ---------------------------------------------------------------------------

def oriented_edges(segs: Segments, fills: np.ndarray, rule: int,
                   return_flags: bool = False):
    """Included boundary edges oriented region-on-left (fill above ->
    travel a->b). Returns (tx, ty, hx, hy) int64 arrays — the bit-exact
    comparison surface against the single kernel. With
    ``return_flags`` also returns the per-edge is_fill_top bit (the
    kernel's per-link hole flag, needed by the junction correction)."""
    mask = rule_include_mask(fills, rule)
    idx = np.flatnonzero(mask)
    f = fills[idx]
    from .extract import _is_fill_top_arr
    top = np.asarray(_is_fill_top_arr(f, rule), dtype=bool)
    ax, ay = segs.ax[idx], segs.ay[idx]
    bx, by = segs.bx[idx], segs.by[idx]
    tx = np.where(top, ax, bx)
    ty = np.where(top, ay, by)
    hx = np.where(top, bx, ax)
    hy = np.where(top, by, ay)
    if return_flags:
        return tx, ty, hx, hy, top
    return tx, ty, hx, hy


def _face_successor(vix: int, viy: int, cands, head: Point) -> int:
    """Left-face tracing successor: the outgoing edge CLOCKWISE-most
    from the reversed incoming direction (= LARGEST positive CCW angle).
    At a 4-valent pinch node (e.g. every XOR crossing) this keeps the
    walk on the SAME face — the sharpest-left variant would jump into
    the diagonally-touching region and merge two faces into one pinched
    ring (the standard DCEL face-next around a vertex)."""
    import math
    best = None
    best_ang = None
    for ci, w in cands:
        vx, vy = w[0] - head[0], w[1] - head[1]
        cross = vix * vy - viy * vx
        dot = vix * vx + viy * vy
        ang = math.atan2(cross, dot)
        if ang <= 0:
            ang += 2 * math.pi
        if best_ang is None or ang > best_ang:
            best_ang = ang
            best = ci
    return best


def strip_walk(edges: List[Tuple[Point, Point]], strip: int,
               strip_w: int):
    """Walk edges owned by one strip (ownership = strip of tail point).

    Returns (rings, chains): rings close locally through non-break
    nodes; chains break at nodes with remote incoming edges (detected
    as local_in < local_out — all OUT edges at a local node are local
    by the ownership rule) or heads outside the strip.

    Junction pairing here uses the face rule; the correction stage
    (correct_junction_rings / _correct_rings_ds) repairs the flag-
    dependent divergences afterwards. r5 NOTE: per-ring kernel-faithful
    LOCAL pairing is UNSOUND — a locally-complete ring walked with its
    own left-top flag can diverge when the kernel ring containing
    those links starts remotely with a different rotation (concrete
    counterexample: test_randomized_bit_parity seed 1012, xor,
    strip_w=128 — a strip-local pinch triangle whose enclosing kernel
    ring starts two strips away; see NOTES.md r5) — so the face walk +
    correction split is retained by design, and cross-strip junction
    pairing is kernel-exact in the FINAL stitch
    (stitch_rings_faithful)."""
    lo = strip * strip_w
    hi = (strip + 1) * strip_w

    outgoing: Dict[Point, List[int]] = {}
    in_count: Dict[Point, int] = {}
    for ei, (t, h) in enumerate(edges):
        outgoing.setdefault(t, []).append(ei)
        if lo <= h[0] < hi:
            in_count[h] = in_count.get(h, 0) + 1

    def is_break(p: Point) -> bool:
        outs = outgoing.get(p)
        if outs is None:
            return True       # head outside this strip's node set
        return in_count.get(p, 0) < len(outs)

    used = [False] * len(edges)

    def successor(ei: int) -> int | None:
        t, h = edges[ei]
        cands = [(c, edges[c][1]) for c in outgoing.get(h, ())
                 if not used[c]]
        if not cands:
            return None
        if len(cands) == 1:
            return cands[0][0]
        return _face_successor(t[0] - h[0], t[1] - h[1], cands, h)

    rings: List[List[Point]] = []
    chains: List[List[Point]] = []

    # chains start at break nodes
    for p, outs in outgoing.items():
        if not is_break(p):
            continue
        for start in outs:
            if used[start]:
                continue
            used[start] = True
            path = [edges[start][0], edges[start][1]]
            cur = start
            while True:
                h = edges[cur][1]
                if not (lo <= h[0] < hi) or is_break(h):
                    break
                nxt = successor(cur)
                if nxt is None:
                    break
                used[nxt] = True
                path.append(edges[nxt][1])
                cur = nxt
            chains.append(path)

    # leftovers: cycles wholly through non-break local nodes. On
    # return to the start point the face rule STILL decides: at a
    # pinch node (walk started on one of its edges) the DCEL
    # face-next may continue through the node rather than close —
    # unconditional closure would split one pinched face into two
    # rings depending on scan order.
    for start in range(len(edges)):
        if used[start]:
            continue
        used[start] = True
        path = [edges[start][0], edges[start][1]]
        cur = start
        closed = False
        while True:
            h = edges[cur][1]
            if h == path[0]:
                cands = [(c, edges[c][1]) for c in outgoing.get(h, ())
                         if not used[c]]
                if not cands:
                    closed = True
                    break
                t = edges[cur][0]
                pick = _face_successor(t[0] - h[0], t[1] - h[1],
                                       cands + [(-2, path[1])], h)
                if pick == -2:
                    closed = True
                    break
                nxt = pick
            else:
                nxt = successor(cur)
                if nxt is None:
                    break
            used[nxt] = True
            path.append(edges[nxt][1])
            cur = nxt
        if closed:
            rings.append(path[:-1])
    return rings, chains


def strip_walk_arrays(tx, ty, hx, hy, strip: int, strip_w: int):
    """``strip_walk`` over coordinate arrays with a vectorized
    pure-cycle pre-pass: cycles whose every node is simple (out==1,
    in==1, in-strip, non-break) are ranked by pointer doubling — they
    can't touch chains or multi-out nodes, so the Python walker only
    sees the residue. Output is BIT-IDENTICAL to strip_walk (same ring
    start vertices and order: rings sort by their minimal edge index,
    the walker's discovery key)."""
    rings_mix, chains = _strip_walk_mix(tx, ty, hx, hy, strip, strip_w)
    rings = [
        [tuple(p) for p in P.tolist()] if isinstance(P, np.ndarray)
        else P
        for _, P in rings_mix]
    return rings, chains


def _strip_walk_mix(tx, ty, hx, hy, strip: int, strip_w: int):
    """Shared walk core: ``(start_key, ring)`` pairs sorted by
    discovery key (ring = (L,2) ndarray for pure cycles, point list
    for walker residue) plus the open chains."""
    n = len(tx)
    if n == 0:
        return [], []
    lo = strip * strip_w
    hi = (strip + 1) * strip_w
    tx = np.asarray(tx, np.int64)
    ty = np.asarray(ty, np.int64)
    hx = np.asarray(hx, np.int64)
    hy = np.asarray(hy, np.int64)
    OFF = np.int64(1 << 30)
    pt = ((tx + OFF) << np.int64(31)) | (ty + OFF)
    ph = ((hx + OFF) << np.int64(31)) | (hy + OFF)
    nodes, inv = np.unique(np.concatenate((pt, ph)),
                           return_inverse=True)
    t_id = inv[:n]
    h_id = inv[n:]
    nn = len(nodes)
    out_deg = np.bincount(t_id, minlength=nn)
    in_strip = (hx >= lo) & (hx < hi)
    in_deg = np.bincount(h_id[in_strip], minlength=nn)
    # break nodes per strip_walk.is_break: no local out edges, or
    # fewer local in edges than out edges
    node_break = (out_deg == 0) | (in_deg < out_deg)
    # unique out edge per out_deg==1 node
    order_t = np.argsort(t_id, kind="stable")
    first_of = np.minimum(
        np.searchsorted(t_id[order_t], np.arange(nn)), n - 1)
    single_out = np.where(out_deg == 1, order_t[first_of], -1)
    simple_head = in_strip & (~node_break[h_id]) \
        & (out_deg[h_id] == 1) & (in_deg[h_id] == 1)
    succ = np.where(simple_head, single_out[h_id], np.int64(-1))
    claimed = np.zeros(n, dtype=bool)
    pure = []   # (start_edge, P) in start order
    alive = np.flatnonzero(succ >= 0)
    if len(alive):
        # min-edge-index label doubling over the compacted survivors
        sv = alive
        m = len(sv)
        nxt = succ[sv]
        pos = np.searchsorted(sv, nxt)
        okp = pos < m
        pos_c = np.minimum(pos, m - 1)
        okp &= sv[pos_c] == nxt
        jump0 = np.where(okp, pos_c, np.int64(-1))
        jump = jump0.copy()
        mn = sv.copy()
        rounds = max(1, int(m).bit_length())
        for _ in range(rounds):
            v = np.flatnonzero(jump >= 0)
            if not len(v):
                break
            t = jump[v]
            mn[v] = np.minimum(mn[v], mn[t])
            jump[v] = jump[t]
        on_cycle = jump >= 0
        if on_cycle.any():
            # rank within each cycle: break before the min edge,
            # distance doubling (the extract.py pointer-doubling plan)
            starts = np.unique(mn[on_cycle])
            d0p = np.searchsorted(sv, starts)
            pred = np.full(m, -1, dtype=np.int64)
            svn = np.flatnonzero(jump0 >= 0)
            pred[jump0[svn]] = svn
            jump2 = jump0
            jump2[pred[d0p]] = -1
            dist = np.ones(m, dtype=np.int64)
            for _ in range(rounds):
                v = np.flatnonzero(jump2 >= 0)
                if not len(v):
                    break
                t = jump2[v]
                dist[v] += dist[t]
                jump2[v] = jump2[t]
            reached = on_cycle & (jump2 == -1)
            red = np.flatnonzero(reached)
            rk = mn[red]
            o2 = np.argsort(rk, kind="stable")
            red = red[o2]
            rk = rk[o2]
            bnd = np.flatnonzero(np.concatenate(([True],
                                                 rk[1:] != rk[:-1])))
            ends = np.concatenate((bnd[1:], [len(red)]))
            for bi in range(len(bnd)):
                eds = red[bnd[bi]:ends[bi]]
                L = len(eds)
                start = int(rk[bnd[bi]])
                if dist[eds].max() != L:
                    continue    # inconsistent: leave to the walker
                rank = L - dist[eds]
                full_eds = sv[eds]
                P = np.empty((L, 2), dtype=np.int64)
                P[rank, 0] = tx[full_eds]
                P[rank, 1] = ty[full_eds]
                claimed[full_eds] = True
                pure.append((start, P))

    rest = np.flatnonzero(~claimed)
    rings_mix: list = list(pure)
    chains: List[List[Point]] = []
    if len(rest):
        edges = [((int(tx[i]), int(ty[i])), (int(hx[i]), int(hy[i])))
                 for i in rest.tolist()]
        r_rings, chains = _strip_walk_indexed(edges, rest, strip,
                                              strip_w)
        rings_mix.extend(r_rings)
    rings_mix.sort(key=lambda it: it[0])
    return rings_mix, chains


def strip_walk_flat(tx, ty, hx, hy, strip: int, strip_w: int):
    """``strip_walk_arrays`` with FLAT ring buffers: returns
    ``(offsets, values, chains)`` where ``values`` is the interleaved
    [x0,y0,x1,y1,...] int64 buffer of all rings in the bit-identical
    discovery order and ``offsets`` (len = nrings+1, in VALUE units)
    delimits them — ready for a zero-copy
    ``pa.ListArray.from_arrays``. Skips the per-point tuple
    materialization of the list form (the walk stage's dominant cost
    on dense scenes: millions of tuples built only to be re-flattened
    into Arrow)."""
    rings_mix, chains = _strip_walk_mix(tx, ty, hx, hy, strip, strip_w)
    if not rings_mix:
        return (np.zeros(1, np.int64), np.zeros(0, np.int64), chains)
    parts = []
    lens = np.empty(len(rings_mix), np.int64)
    for i, (_, P) in enumerate(rings_mix):
        if isinstance(P, np.ndarray):
            flat = P.reshape(-1)
        else:
            flat = np.asarray(P, np.int64).reshape(-1)
        parts.append(flat)
        lens[i] = len(flat)
    values = np.concatenate(parts)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return offsets, values, chains


def _strip_walk_indexed(edges, orig_idx, strip: int, strip_w: int):
    """strip_walk that also reports each ring's ORIGINAL start edge
    index (for order-merging with the vectorized pure cycles)."""
    rings, chains = strip_walk(edges, strip, strip_w)
    # recover start indices: strip_walk discovers rings in ascending
    # local start order; map local scan order back through orig_idx.
    # strip_walk itself doesn't return indices, so re-derive: ring i's
    # first point is the tail of its start edge — the walker scans
    # edges in order, so ring starts are increasing in local index;
    # find each ring's start edge by matching first two points.
    pos = {}
    for li, (t, h) in enumerate(edges):
        pos.setdefault((t, h), li)
    out = []
    for ring in rings:
        key = (ring[0], ring[1])
        out.append((int(orig_idx[pos[key]]), ring))
    return out, chains


def stitch_chains(chains: List[List[Point]],
                  totals: Dict[Point, tuple] | None = None):
    """Join chains into closed rings by matching endpoints; junctions
    (several chains at one node) resolve with the same leftmost-turn
    rule as the strip walk.

    With ``totals`` (global per-point (starts, ends) chain-endpoint
    counts), ONLY globally-forced joins run: a point with exactly one
    start and one end has a unique continuation everywhere, so joining
    it locally can never disagree with the global face walk. Junction
    points (several starters/arrivals — where a local decision with an
    absent remote arrival could consume the wrong starter) defer to
    the final task; leftover open chains are returned separately:
    (rings, leftover_chains). Without ``totals``, all chains are
    assumed present (single final stitch) and junction pairing runs
    with EXACT kernel semantics (stitch_rings_faithful, r5) — only
    rings are returned.
    """
    if totals is None:
        return stitch_rings_faithful(chains)
    by_tail: Dict[Point, List[int]] = {}
    for ci, ch in enumerate(chains):
        by_tail.setdefault(ch[0], []).append(ci)
    used = [False] * len(chains)
    rings: List[List[Point]] = []
    out_chains: List[List[Point]] = []

    def can_join(p: Point) -> bool:
        if totals is None:
            return True
        return totals.get(p) == (1, 1)

    for start in range(len(chains)):
        if used[start]:
            continue
        used[start] = True
        ring = list(chains[start])
        closed = False
        while True:
            p = ring[-1]
            closing = p == ring[0]
            if not can_join(p):
                break       # junction: defer to the final task
            cands = [(c, chains[c][1]) for c in by_tail.get(p, ())
                     if not used[c]]
            if closing:
                # the face rule decides between closing (the ring's own
                # first segment as a virtual candidate) and continuing
                # through a pinch junction — unconditional closure
                # would split one pinched face by scan order
                if not cands:
                    closed = True
                    break
                pick = _face_successor(ring[-2][0] - p[0],
                                       ring[-2][1] - p[1],
                                       cands + [(-2, ring[1])], p)
                if pick == -2:
                    closed = True
                    break
                nxt = pick
            else:
                if not cands:
                    break
                if len(cands) == 1:
                    nxt = cands[0][0]
                else:
                    nxt = _face_successor(ring[-2][0] - p[0],
                                          ring[-2][1] - p[1], cands, p)
            used[nxt] = True
            ring.extend(chains[nxt][1:])
        if closed:
            rings.append(ring[:-1])
        else:
            out_chains.append(ring)
    if totals is None:
        return rings
    return rings, out_chains


def _ring_area2(ring: List[Point]) -> int:
    s = 0
    for i in range(len(ring)):
        x0, y0 = ring[i - 1]
        x1, y1 = ring[i]
        s += x0 * y1 - x1 * y0
    return s


def bind_tags(ring_entries: List[tuple], anchor_entries: List[tuple]):
    """Scan-line hole binding that RETURNS tags instead of mutating a
    shape list (the distributed form of extract.join_holes: each bind
    partition runs this over its local anchors + replicated rings and a
    tiny global pass resolves hole->hole chains).

    ring_entries: [(contour_points, tag)] — hulls and holes that overlap
    this partition's x-window (contours in CCW-hull / CW-hole region-on-
    left order, i.e. counter-clockwise convention of join_holes).
    anchor_entries: [(anchor_vseg, hole_tag)] for holes anchored here.
    Returns {hole_tag: best_tag_under_anchor} (best_tag may be another
    hole's tag -> resolve transitively; None when nothing is under).
    """
    import functools

    from .extract import (_append_id_segments, _cmp_by_angle,
                          _sort_runs_by_angle, _vseg_cmp)
    if not anchor_entries:
        return {}
    anchors = sorted(anchor_entries, key=lambda it: it[0][0])
    anchors = _sort_runs_by_angle(anchors)
    x_min = anchors[0][0][0][0]
    x_max = anchors[-1][0][0][0]

    segments: list = []
    for contour, tag in ring_entries:
        _append_id_segments(contour, segments, tag, x_min, x_max,
                            clockwise=False)
    segments.sort(key=functools.cmp_to_key(
        lambda u, v: (-1 if u[0][0] < v[0][0] else 1) if u[0][0] != v[0][0]
        else _cmp_by_angle(u[0], v[0])))

    # comparator-bisected status line (the join_holes structure):
    # output edges never cross, so the pairwise order of
    # co-overlapping segments is static and bisection is valid —
    # O((n+q) log n) instead of the per-anchor full rescan
    import heapq
    out: dict = {}
    status: list = []
    expiry: list = []
    seq = 0

    def locate(vseg) -> int:
        lo, hi = 0, len(status)
        while lo < hi:
            mid = (lo + hi) // 2
            if _vseg_cmp(status[mid][0], vseg) < 0:
                lo = mid + 1
            else:
                hi = mid
        return lo

    j = 0
    for anchor_vseg, hole_tag in anchors:
        p = anchor_vseg[0]
        while expiry and expiry[0][0] < p[0]:
            _, _, vseg = heapq.heappop(expiry)
            pos = locate(vseg)
            while pos < len(status) and status[pos][0] != vseg:
                pos += 1
            if pos < len(status):
                del status[pos]
        while j < len(segments):
            vseg, tag = segments[j]
            if vseg[0] > anchor_vseg[0] or (
                    vseg[0] == anchor_vseg[0]
                    and _cmp_by_angle(vseg, anchor_vseg) > 0):
                break
            if vseg[1][0] > p[0]:
                status.insert(locate(vseg), (vseg, tag))
                heapq.heappush(expiry, (vseg[1][0], seq, vseg))
                seq += 1
            j += 1
        # greatest entry strictly under the anchor that is NOT the
        # hole's own ring (its bottom edges can sit right below its
        # own anchor)
        pos = locate(anchor_vseg) - 1
        while pos >= 0 and status[pos][1] == hole_tag:
            pos -= 1
        out[hole_tag] = status[pos][1] if pos >= 0 else None
    return out


def assemble_shapes(rings: List[List[Point]]) -> List[list]:
    """CCW rings are hulls, CW rings are holes (region-on-left
    orientation); bind holes to hulls with the scan-line join."""
    shapes: List[list] = []
    holes: List[List[Point]] = []
    for ring in rings:
        if len(ring) < 3:
            continue
        a2 = _ring_area2(ring)
        if a2 == 0:
            continue  # degenerate sliver
        if a2 > 0:
            shapes.append([ring])
        else:
            holes.append(ring)
    anchors = [(_left_bottom_segment(h), ("hole", i))
               for i, h in enumerate(holes)]
    join_holes(shapes, holes, anchors, clockwise=False,
               anchors_sorted=False)
    return shapes


# ---------------------------------------------------------------------------
# Worker-local full pipeline (the Ray version runs each phase as a
# dataset stage — pipelines/tiled_overlay.py)
# ---------------------------------------------------------------------------

def auto_strip_w(x_min: int, x_max: int, n_strips: int = 64) -> int:
    """Power-of-two strip width targeting ~n_strips strips over the
    scene's x-extent. Bin/strip replication cost scales with
    extent/strip_w, NOT with data — a fixed small width on a
    wide-coordinate scene (fixture case 135 spans ±3.7e8) replicates
    a handful of segments into millions of bins."""
    extent = max(1, int(x_max) - int(x_min))
    target = max(1, extent // max(1, n_strips))
    return 1 << max(4, (target - 1).bit_length())


def tiled_overlay(subj: Sequence, clip: Sequence, rule, fill_rule,
                  strip_w: int | None = None) -> List[list]:
    """Strip-distributed boolean overlay, bit-exact with overlay()
    boundary geometry (ring decomposition may differ at touch points
    of degenerate self-intersecting inputs — NOTES.md round-5 lead #1;
    the reference fixture corpus is full-ring-set clean). strip_w=None
    auto-sizes to the scene extent (any explicit width remains
    bit-exact, but a width tiny relative to the extent explodes the
    bin replication)."""
    if isinstance(rule, str):
        rule = RULE_NAMES[rule.lower().replace("_", "")]
    if isinstance(fill_rule, str):
        fill_rule = FILL_RULE_NAMES[fill_rule.lower().replace("_", "")]
    segs = build_segments(subj, clip)
    if strip_w is None:
        strip_w = DEFAULT_STRIP_W if len(segs) == 0 else auto_strip_w(
            int(segs.ax.min()), int(segs.bx.max()))
    segs = binned_split(segs, strip_w)
    if len(segs) == 0:
        return []
    fills = strip_fills(segs, fill_rule, strip_w)
    tx, ty, hx, hy = oriented_edges(segs, fills, rule)
    if len(tx) == 0:
        return []
    tstrip = tx // strip_w
    order = np.argsort(tstrip, kind="stable")
    tstrip = tstrip[order]
    tx, ty, hx, hy = tx[order], ty[order], hx[order], hy[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], tstrip[1:] != tstrip[:-1])))
    bounds = np.concatenate((starts, [len(tstrip)]))
    rings: List[List[Point]] = []
    chains: List[List[Point]] = []
    for k in range(len(starts)):
        lo, hi = bounds[k], bounds[k + 1]
        edges = [((int(tx[i]), int(ty[i])), (int(hx[i]), int(hy[i])))
                 for i in range(lo, hi)]
        r, c = strip_walk(edges, int(tstrip[lo]), strip_w)
        rings.extend(r)
        chains.extend(c)
    rings.extend(stitch_chains(chains))
    # cross-strip junction pairing is kernel-exact in the final stitch
    # (stitch_rings_faithful); the correction stage remains for LOCAL
    # flag-dependent junction pairing (see strip_walk docstring — a
    # native local faithful walk is refuted by counterexample)
    rings = correct_junction_rings(rings)
    return assemble_shapes(rings)


# ---------------------------------------------------------------------------
# Kernel-faithful correction of pinch-junction ring pairing
# ---------------------------------------------------------------------------

def _faithful_component_rings(edges):
    """Kernel-faithful ring decomposition of ONE pooled junction
    component: mirrors extract.py's walk (_find_left_top_link /
    _next_link / _find_contour, themselves ports of
    core/extract.rs + core/nearest_vector.rs) over the component's
    links, with per-ring rotation from the left-top link's
    is_fill_top flag — the piece the strip walker's fixed face rule
    lacks (NOTES round-5 lead #1).

    ``edges``: directed (tail, head) point pairs in the tiled travel
    orientation. The per-link is_fill_top flag is RECOVERED from the
    orientation itself: oriented_edges travels a->b exactly when the
    flag is set and canonical segments satisfy a < b, so
    flag == (tail < head) (verified against oriented_edges
    return_flags on fixtures + soup). Returns rings in the same travel
    orientation (clockwise=False conventions, matching overlay()'s
    default)."""
    n = len(edges)
    la, lb, lflag = [], [], []
    for (t, h) in edges:
        if t <= h:
            la.append(t)
            lb.append(h)
            lflag.append(t < h)
        else:
            la.append(h)
            lb.append(t)
            lflag.append(False)
    order = sorted(range(n), key=lambda i: (la[i], lb[i]))
    la = [la[i] for i in order]
    lb = [lb[i] for i in order]
    lflag = [lflag[i] for i in order]

    node_of: dict = {}
    a_id = [0] * n
    b_id = [0] * n
    for i in range(n):
        a_id[i] = node_of.setdefault(la[i], len(node_of))
        b_id[i] = node_of.setdefault(lb[i], len(node_of))
    nodes: list = [[] for _ in range(len(node_of))]
    for i in range(n):
        nodes[a_id[i]].append(i)
        if b_id[i] != a_id[i]:
            nodes[b_id[i]].append(i)

    def other(i, nid):
        return lb[i] if a_id[i] == nid else la[i]

    def is_cw(p0, p1, p2):
        return (p1[0] - p0[0]) * (p2[1] - p0[1]) \
            - (p1[1] - p0[1]) * (p2[0] - p0[0]) < 0

    visited = [False] * n

    def find_left_top(idx):
        # extract.py _find_left_top_link (core/extract.rs:400-470)
        node = nodes[a_id[idx]]
        if len(node) == 2:
            i0, i1 = node
            return i0 if is_cw(la[i0], lb[i0], lb[i1]) else i1
        top = idx
        top_a, top_b = la[idx], lb[idx]
        for i in node:
            if i == idx or la[i] >= lb[i] or visited[i]:
                continue
            if is_cw(top_a, top_b, lb[i]):
                continue
            top = i
            top_b = lb[i]
        return top

    def next_link(link_id, nid, clockwise):
        # extract.py _next_link selection core (exact integers)
        node = nodes[nid]
        if len(node) == 2:
            return node[1] if node[0] == link_id else node[0]
        first = -1
        second = -1
        pos = 0
        for i, li in enumerate(node):
            if not visited[li]:
                if first < 0:
                    first = li
                else:
                    second = li
                    pos = i
                    break
        if first < 0:
            return link_id
        if second < 0:
            return first
        if a_id[link_id] == nid:
            c, a = la[link_id], lb[link_id]
        else:
            c, a = lb[link_id], la[link_id]
        vax, vay = a[0] - c[0], a[1] - c[1]
        bpt = other(first, nid)
        vbx, vby = bpt[0] - c[0], bpt[1] - c[1]
        rot = 1 if clockwise else -1
        cr = vax * vby - vay * vbx
        more_180 = (cr >= 0) if clockwise else (cr <= 0)
        best = first

        def add(p, pid):
            nonlocal vbx, vby, more_180, best
            vpx, vpy = p[0] - c[0], p[1] - c[1]
            ap_more = (vax * vpy - vay * vpx) * rot >= 0
            if more_180 == ap_more:
                if (vpx * vby - vpy * vbx) * rot < 0:
                    vbx, vby = vpx, vpy
                    best = pid
            elif more_180:
                more_180 = False
                vbx, vby = vpx, vpy
                best = pid

        add(other(second, nid), second)
        for li in node[pos + 1:]:
            if not visited[li]:
                add(other(li, nid), li)
        return best

    rings = []
    for idx in range(n):
        if visited[idx]:
            continue
        lt = find_left_top(idx)
        hole = bool(lflag[lt])
        direction = (hole == False)  # noqa: E712  (clockwise=False)
        if direction:
            begin, nid, last_nid = lb[lt], a_id[lt], b_id[lt]
        else:
            begin, nid, last_nid = la[lt], b_id[lt], a_id[lt]
        link_id = lt
        visited[link_id] = True
        points = [begin]
        last_link = next_link(lt, last_nid, not direction)
        guard = 0
        while link_id != last_link and guard <= n:
            guard += 1
            link_id = next_link(link_id, nid, direction)
            if a_id[link_id] == nid:
                points.append(la[link_id])
                nid = b_id[link_id]
            else:
                points.append(lb[link_id])
                nid = a_id[link_id]
            visited[link_id] = True
        rings.append(points)
    return rings


# ---------------------------------------------------------------------------
# Kernel-faithful strip walk + final stitch (r5: retires the
# correction stage — junction pairing is kernel-exact by construction)
# ---------------------------------------------------------------------------

def _is_cw(p0, p1, p2):
    return (p1[0] - p0[0]) * (p2[1] - p0[1]) \
        - (p1[1] - p0[1]) * (p2[0] - p0[0]) < 0


def stitch_rings_faithful(chains: List[List[Point]]):
    """Final stitch with EXACT kernel semantics
    (iOverlay core/extract.rs:189-221 + core/nearest_vector.rs) over
    CONTRACTED chains. Each chain is a directed point path whose
    interior nodes are globally forced (simple + complete — the strip
    walk breaks at junctions and strip exits, and the block stitch
    joins only totals==(1,1) points), so the kernel's per-segment walk
    collapses to a walk over chain STUBS:

    - a stub = one chain end; its geometry is the chain's first
      segment from that node — exactly the segment the kernel would
      evaluate as a candidate there;
    - ring starts come from the globally-minimal unused member
      segment (the kernel's sorted-link scan); the selected chain is
      SPLIT around that segment first, so the left-top refinement and
      the begin/stop-probe bookkeeping run at true segment
      granularity and the ring re-enters the remainder at its end,
      exactly like the kernel's link walk;
    - per-ring rotation comes from the left-top segment's travel flag
      (flag == tail < head, the oriented_edges is_fill_top recovery
      verified on fixtures + soup), with the stop probe using the
      OPPOSITE rotation;
    - traversing any stub consumes the whole chain (its interior is
      forced), matching segment-by-segment visited marking.
    """
    import heapq

    def seg_key(p, q):
        return (p, q) if p <= q else (q, p)

    paths: dict = {}
    alive: dict = {}
    mins: dict = {}
    heap: list = []
    serial = 0
    # node -> list of (stub_key, chain_id, end) kept sorted (the
    # kernel's sorted-order node lists); dead chains stay listed, the
    # live scans filter — mirroring the static node lists of
    # _faithful_component_rings
    ends: dict = {}

    def adj_of(path, end):
        return path[1] if end == 0 else path[-2]

    def end_pt(path, end):
        return path[0] if end == 0 else path[-1]

    def add_chain(path):
        nonlocal serial
        ci = serial
        serial += 1
        paths[ci] = path
        alive[ci] = True
        best, best_j = None, -1
        for j in range(len(path) - 1):
            k = seg_key(path[j], path[j + 1])
            if best is None or k < best:
                best, best_j = k, j
        mins[ci] = (best, best_j)
        heapq.heappush(heap, (best, ci))
        import bisect
        for e in (0, 1):
            v = end_pt(path, e)
            sk = seg_key(v, adj_of(path, e))
            lst = ends.setdefault(v, [])
            bisect.insort(lst, (sk, ci, e))
        return ci

    def drop_chain(ci):
        # removed only when splitting a live chain (dead chains stay
        # listed like the kernel's visited links)
        path = paths[ci]
        alive[ci] = False
        for e in (0, 1):
            v = end_pt(path, e)
            sk = seg_key(v, adj_of(path, e))
            lst = ends.get(v, [])
            try:
                lst.remove((sk, ci, e))
            except ValueError:
                pass

    def split_chain(ci, j):
        """Replace live chain ci with pieces [0..j], [j..j+1],
        [j+1..end]; returns the id of the middle segment piece."""
        path = paths[ci]
        drop_chain(ci)
        if j > 0:
            add_chain(path[:j + 1])
        seg_id = add_chain(path[j:j + 2])
        if j + 2 < len(path):
            add_chain(path[j + 1:])
        return seg_id

    for c in chains:
        if len(c) >= 2:
            add_chain(list(c))

    total_pts = sum(len(p) for p in paths.values())

    def live_stubs(v):
        return [(sk, ci, e) for (sk, ci, e) in ends.get(v, ())
                if alive[ci]]

    def knext(cur_ci, cur_end, cur_adj, v, clockwise):
        """kernel _next_link over the stubs at node v. cur_ci/cur_end
        identify the arriving stub; cur_adj is the far point of the
        arriving segment (the chain's adjacent point at v)."""
        node = ends.get(v, ())
        if len(node) == 2:
            (k0, c0, e0), (k1, c1, e1) = node
            return (c1, e1) if (c0, e0) == (cur_ci, cur_end) \
                else (c0, e0)
        live = [(ci, e) for (sk, ci, e) in node if alive[ci]]
        if not live:
            return None
        if len(live) == 1:
            return live[0]
        vax, vay = cur_adj[0] - v[0], cur_adj[1] - v[1]
        first = live[0]
        bpt = adj_of(paths[first[0]], first[1])
        vbx, vby = bpt[0] - v[0], bpt[1] - v[1]
        rot = 1 if clockwise else -1
        cr = vax * vby - vay * vbx
        more_180 = (cr >= 0) if clockwise else (cr <= 0)
        best = first
        for e in live[1:]:
            p = adj_of(paths[e[0]], e[1])
            vpx, vpy = p[0] - v[0], p[1] - v[1]
            ap_more = (vax * vpy - vay * vpx) * rot >= 0
            if more_180 == ap_more:
                if (vpx * vby - vpy * vbx) * rot < 0:
                    vbx, vby = vpx, vpy
                    best = e
            elif more_180:
                more_180 = False
                vbx, vby = vpx, vpy
                best = e
        return best

    rings: List[List[Point]] = []

    while heap:
        k, ci = heapq.heappop(heap)
        if not alive[ci] or mins[ci][0] != k:
            continue
        # start selection: explode the min-key chain to segment
        # granularity around its minimal member segment
        if len(paths[ci]) > 2:
            split_chain(ci, mins[ci][1])
            continue        # pieces re-queued with their keys
        v = k[0]            # ring-minimal vertex (canonical a of lt)
        # kernel _find_left_top_link over the stubs at v
        node = ends.get(v, ())
        if len(node) == 2:
            (k0, c0, e0), (k1, c1, e1) = node
            p0 = adj_of(paths[c0], e0)
            p1 = adj_of(paths[c1], e1)
            # the kernel compares canonical b points (max endpoint)
            b0 = max(v, p0)
            b1 = max(v, p1)
            lt = (c0, e0) if _is_cw(min(v, p0), b0, b1) else (c1, e1)
        else:
            lt = (ci, 0 if paths[ci][0] == v else 1)
            top_a = v
            top_b = max(v, adj_of(paths[ci], lt[1]))
            for (sk, eci, eend) in node:
                if (eci, eend) == lt or not alive[eci]:
                    continue
                pb = max(v, adj_of(paths[eci], eend))
                if sk[0] >= sk[1]:
                    continue
                if _is_cw(top_a, top_b, pb):
                    continue
                lt = (eci, eend)
                top_b = pb
        lt_ci, lt_end = lt
        # lt must be a single segment for the kernel's begin/probe
        # bookkeeping; split the chosen chain if it is longer
        if len(paths[lt_ci]) > 2:
            jj = 0 if lt_end == 0 else len(paths[lt_ci]) - 2
            split_chain(lt_ci, jj)
            if alive[ci]:
                heapq.heappush(heap, (mins[ci][0], ci))
            continue        # retry with segment-granular start
        t, h = paths[lt_ci][0], paths[lt_ci][-1]
        flag = t < h        # is_fill_top recovered from travel
        direction = not flag
        sla, slb = seg_key(t, h)
        if direction:
            begin, nid_pt, last_pt = slb, sla, slb
        else:
            begin, nid_pt, last_pt = sla, slb, sla
        lt_end_at_nid = 0 if paths[lt_ci][0] == nid_pt else 1
        lt_end_at_last = 1 - lt_end_at_nid
        alive[lt_ci] = False
        points = [begin]
        last = knext(lt_ci, lt_end_at_last, nid_pt, last_pt,
                     not direction)
        cur_ci, cur_end, cur_adj = lt_ci, lt_end_at_nid, last_pt
        guard = 0
        while (last is None or cur_ci != last[0]) and \
                guard <= total_pts + 8:
            guard += 1
            nx = knext(cur_ci, cur_end, cur_adj, nid_pt, direction)
            if nx is None or not alive.get(nx[0], False):
                break       # defective input; drop sub-3-point later
            eci, eend = nx
            epath = paths[eci]
            if eend == 0:
                points.extend(epath[:-1])
                nid_pt = epath[-1]
                cur_adj = epath[-2]
                cur_end = 1
            else:
                points.extend(reversed(epath[1:]))
                nid_pt = epath[0]
                cur_adj = epath[1]
                cur_end = 0
            alive[eci] = False
            cur_ci = eci
        if len(points) >= 3:
            rings.append(points)
    return rings


def correct_junction_rings(rings):
    """Re-extract ring components touching shared/repeated vertices
    with the kernel-faithful walk (flags recovered from edge
    orientation). Components of a single simple ring pass through
    untouched (the overwhelmingly common case)."""
    # union-find over rings via shared vertices
    owner: dict = {}
    parent = list(range(len(rings)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    self_touch = set()
    for ri, ring in enumerate(rings):
        seen = set()
        for p in ring:
            if p in seen:
                self_touch.add(ri)
            seen.add(p)
            if p in owner:
                ra, rb = find(owner[p]), find(ri)
                if ra != rb:
                    parent[rb] = ra
            else:
                owner[p] = ri
    groups: dict = {}
    for ri in range(len(rings)):
        groups.setdefault(find(ri), []).append(ri)

    out = []
    for members in groups.values():
        if len(members) == 1 and members[0] not in self_touch:
            out.append(rings[members[0]])
            continue
        edges = []
        for ri in members:
            ring = rings[ri]
            for i in range(len(ring)):
                edges.append((ring[i - 1], ring[i]))
        out.extend(_faithful_component_rings(edges))
    return out
