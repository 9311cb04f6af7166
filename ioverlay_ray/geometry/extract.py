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
    """Filtered link table: point pairs + node ids + fill (core/link.rs).

    Backed by numpy arrays when built by build_links; the Python
    tuple-list views (a, b, fill, a_id, b_id) used by the sequential
    walks are materialized LAZILY — fully-vectorized extractions
    (pure-cycle plans, stats) never pay for them."""

    __slots__ = ("_a", "_b", "_a_id", "_b_id", "_fill", "_n", "_nodes",
                 "_node_arrays", "_np", "_np_ids", "_np_fill",
                 "pair_cw", "pair_ccw")

    def __init__(self, a: List[Point] | None, b: List[Point] | None,
                 fill: List[int] | None, n: int | None = None):
        self._a = a
        self._b = b
        self._fill = fill
        self._n = len(a) if n is None else n
        self._a_id = [0] * self._n if a is not None else None
        self._b_id = [0] * self._n if a is not None else None
        self._nodes: List[List[int]] | None = []
        self._node_arrays = None  # (n_nodes, bounds, link_sorted)
        self._np = None  # (ax, ay, bx, by) int64 arrays when available
        self._np_ids = None  # (a_id, b_id) int64 arrays
        self._np_fill = None  # fills as int64 array
        self.pair_cw = None  # all-unvisited NearestVector tables
        self.pair_ccw = None

    def __len__(self):
        return self._n

    @property
    def a(self) -> List[Point]:
        if self._a is None:
            ax, ay, _, _ = self._np
            self._a = list(zip(ax.tolist(), ay.tolist()))
        return self._a

    @property
    def b(self) -> List[Point]:
        if self._b is None:
            _, _, bx, by = self._np
            self._b = list(zip(bx.tolist(), by.tolist()))
        return self._b

    @property
    def fill(self) -> List[int]:
        if self._fill is None:
            self._fill = self._np_fill.tolist()
        return self._fill

    @property
    def a_id(self) -> List[int]:
        if self._a_id is None:
            self._a_id = self._np_ids[0].tolist() if self._np_ids \
                else [0] * self._n
        return self._a_id

    @a_id.setter
    def a_id(self, value) -> None:
        self._a_id = value

    @property
    def b_id(self) -> List[int]:
        if self._b_id is None:
            self._b_id = self._np_ids[1].tolist() if self._np_ids \
                else [0] * self._n
        return self._b_id

    @b_id.setter
    def b_id(self, value) -> None:
        self._b_id = value

    @property
    def nodes(self) -> List[List[int]]:
        """Per-node link-index lists; materialized lazily from the
        vectorized arrays (most walks never need them thanks to the
        precomputed pair tables)."""
        if self._nodes is None:
            n_nodes, bounds, link_sorted = self._node_arrays
            ls = link_sorted.tolist()
            bl = bounds.tolist()
            self._nodes = [ls[bl[v]:bl[v + 1]] for v in range(n_nodes)]
        return self._nodes

    @nodes.setter
    def nodes(self, value) -> None:
        self._nodes = value


def build_links(segs: Segments, fills: np.ndarray, mask: np.ndarray) -> Links:
    idx = np.flatnonzero(mask)
    links = Links(None, None, None, n=len(idx))
    links._np = (segs.ax[idx], segs.ay[idx], segs.bx[idx], segs.by[idx])
    links._np_fill = fills[idx]
    return links


_PACK_BIAS = 1 << 30


def _pack_pts(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x, y) -> one sortable int64 key; |coords| < 2^30 (the kernel
    bound) so the biased halves fit 31/32 bits and the packed order
    equals lexicographic."""
    return ((x + _PACK_BIAS) << 32) | (y + _PACK_BIAS)


def connect_nodes(links: Links) -> None:
    """Assign node ids: rank of each endpoint in the sorted distinct
    point set (= the reference's two-pointer merge, build/graph.rs:
    19-107, vectorized). Node index lists keep a-group entries first
    (by link index) then b-group entries (by link index) — the same
    order the sequential merge produced."""
    n = len(links)
    if n == 0:
        return
    if links._np is None:
        _connect_nodes_seq(links)
        return
    ax, ay, bx, by = links._np
    keys = np.concatenate((_pack_pts(ax, ay), _pack_pts(bx, by)))
    uniq, inv = np.unique(keys, return_inverse=True)
    a_id = inv[:n]
    b_id = inv[n:]
    links._a_id = None   # lazy: materialized from _np_ids on demand
    links._b_id = None
    # group (node, side, link) with a-side first, stable by link index
    side = np.concatenate((np.zeros(n, np.int8), np.ones(n, np.int8)))
    link = np.concatenate((np.arange(n), np.arange(n)))
    lb = int(n).bit_length()
    if 2 * lb + 2 <= 63:
        # pack the 3 keys into one int64 (keys are unique, so plain
        # argsort replaces the 3-pass lexsort — ~2x on big tables)
        packed = (inv << np.int64(lb + 1)) \
            | (side.astype(np.int64) << np.int64(lb)) | link
        order = np.argsort(packed)
    else:
        order = np.lexsort((link, side, inv))
    node_sorted = inv[order]
    link_sorted = link[order]
    bounds = np.searchsorted(node_sorted, np.arange(len(uniq) + 1))
    links._np_ids = (a_id, b_id)
    links._node_arrays = (len(uniq), bounds, link_sorted)
    links._nodes = None  # built lazily from the arrays


def _connect_nodes_seq(links: Links) -> None:
    """Sequential two-pointer merge (manual Links without numpy)."""
    n = len(links)
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

def ensure_pair_tables(links: Links) -> None:
    """Precompute, for every directed edge (link, exit-side), the
    NearestVector successor assuming ALL links unvisited — vectorized
    per node degree.  The selection in ``_next_link`` is an argmin over
    a total circular-angle order from the incoming vector, so whenever
    the precomputed winner is still unvisited it equals the sequential
    result exactly; ``_next_link`` falls back to the exact scan
    otherwise.  Degree-2 partners are stored offset by ``len(links)``:
    they are returned unconditionally (the sequential degree-2 branch
    ignores visited state)."""
    if links.pair_cw is not None or links._node_arrays is None \
            or links._np_ids is None:
        return
    n = len(links)
    if n < 512:
        return  # table build overhead beats the walk's savings
    n_nodes, bounds, link_sorted = links._node_arrays
    a_id, b_id = links._np_ids
    ax, ay, bx, by = links._np
    deg = np.diff(bounds)
    pair_cw = np.full(2 * n, -1, dtype=np.int64)
    pair_ccw = pair_cw  # shared until a degree>2 node needs rotation

    d2 = np.flatnonzero(deg == 2)
    if len(d2):
        s = bounds[d2]
        l0 = link_sorted[s]
        l1 = link_sorted[s + 1]
        o0 = np.where(a_id[l0] == d2, 0, 1)
        o1 = np.where(a_id[l1] == d2, 0, 1)
        pair_cw[2 * l0 + o0] = l1 + n
        pair_cw[2 * l1 + o1] = l0 + n

    hi = np.unique(deg[deg > 2])
    if len(hi):
        pair_ccw = pair_cw.copy()
        for d in hi.tolist():
            vs = np.flatnonzero(deg == d)
            start = bounds[vs]
            L = link_sorted[start[:, None] + np.arange(d)]  # (m, d)
            aside = a_id[L] == vs[:, None]
            ox = np.where(aside, bx[L], ax[L])
            oy = np.where(aside, by[L], ay[L])
            cx = np.where(aside[:, 0], ax[L[:, 0]], bx[L[:, 0]])
            cy = np.where(aside[:, 0], ay[L[:, 0]], by[L[:, 0]])
            vx = ox - cx[:, None]
            vy = oy - cy[:, None]
            for rot, tbl in ((1, pair_cw), (-1, pair_ccw)):
                for j in range(d):
                    vax = vx[:, j]
                    vay = vy[:, j]
                    cand = [k for k in range(d) if k != j]
                    k0 = cand[0]
                    vbx = vx[:, k0].copy()
                    vby = vy[:, k0].copy()
                    best = L[:, k0].copy()
                    more = (vax * vby - vay * vbx) * rot >= 0
                    for k in cand[1:]:
                        vpx = vx[:, k]
                        vpy = vy[:, k]
                        ap_more = (vax * vpy - vay * vpx) * rot >= 0
                        upd2 = more & ~ap_more
                        upd = upd2 | ((more == ap_more) &
                                      ((vpx * vby - vpy * vbx) * rot < 0))
                        vbx = np.where(upd, vpx, vbx)
                        vby = np.where(upd, vpy, vby)
                        best = np.where(upd, L[:, k], best)
                        more = more & ~upd2
                    o = np.where(aside[:, j], 0, 1)
                    tbl[2 * L[:, j] + o] = best

    links.pair_cw = pair_cw.tolist()
    links.pair_ccw = pair_ccw.tolist() if pair_ccw is not pair_cw \
        else links.pair_cw


def _is_fill_top_arr(fill: np.ndarray, rule: int) -> np.ndarray:
    """Vectorized ``kernel.is_fill_top`` over a fill array."""
    from . import kernel as K
    if rule == K.XOR:
        t = fill & K.BOTH_TOP
        return (t == K.SUBJ_TOP) | (t == K.CLIP_TOP)
    return is_fill_top(fill, rule)


def _build_succ2(links: Links) -> np.ndarray:
    """Directed-edge successor through degree-2 nodes only.

    Directed edge ``2*l + o`` = link ``l`` exiting at its a-node
    (``o=0``) or b-node (``o=1``); ``-1`` where the exit node has
    degree != 2.  Injective on its domain, so the functional graph is
    disjoint cycles plus dead-ending chains."""
    n = len(links)
    _, bounds, link_sorted = links._node_arrays
    a_id, _ = links._np_ids
    deg = np.diff(bounds)
    succ = np.full(2 * n, -1, dtype=np.int64)
    d2 = np.flatnonzero(deg == 2)
    if len(d2):
        s = bounds[d2]
        l0 = link_sorted[s]
        l1 = link_sorted[s + 1]
        a0 = a_id[l0] == d2
        a1 = a_id[l1] == d2
        # edge (l0 exit at v) -> next link l1 entered at v, exiting at
        # its other end; the next edge's o is 1 when l1 was entered on
        # its a side (exit = b side ... o encodes exit side a=0/b=1)
        succ[2 * l0 + np.where(a0, 0, 1)] = 2 * l1 + np.where(a1, 1, 0)
        succ[2 * l1 + np.where(a1, 0, 1)] = 2 * l0 + np.where(a0, 1, 0)
    return succ


# Pipeline-injected distributed walk wave for giant components:
# fn(jump, link_of, cand, base, label, off, anchor_id) -> (nxt_a,
# alen, amin) or None (None = caller runs the in-process walk).
# Installed by pipelines/parallel_fill.parallel_fill; the kernel
# itself stays numpy-pure.
PARALLEL_LAYOUT = None


def _walk_wave(jump: np.ndarray, link_of: np.ndarray, cand: np.ndarray,
               base: int, label: np.ndarray, off: np.ndarray,
               anchor_id: np.ndarray, record: bool = False):
    """One lockstep walk wave: every anchor in ``cand`` walks forward
    until it reaches the next anchor.  Writes each visited non-anchor
    edge's owning walker + step offset into ``label``/``off`` (or
    returns them as arrays when ``record`` — the task-shard form, which
    must not mutate shared object-store buffers) and returns per-walker
    (next anchor id, arc length, arc min label)."""
    k = len(cand)
    nxt_a = np.full(k, -1, dtype=np.int64)
    alen = np.zeros(k, dtype=np.int64)
    amin = link_of[cand].copy()
    wmin = amin.copy()
    cur = jump[cand]
    wid = np.arange(k, dtype=np.int64)
    step = 1
    rec_e = []
    rec_w = []
    rec_o = []
    while len(cur):
        hit_a = anchor_id[cur]
        hit = hit_a >= 0
        if hit.any():
            hw = wid[hit]
            nxt_a[hw] = hit_a[hit]
            alen[hw] = step
            amin[hw] = wmin[hit]
            keep = ~hit
            cur = cur[keep]
            wid = wid[keep]
            wmin = wmin[keep]
            if not len(cur):
                break
        if record:
            rec_e.append(cur.copy())
            rec_w.append(base + wid)
            rec_o.append(np.full(len(cur), step, dtype=np.int64))
        else:
            label[cur] = base + wid
            off[cur] = step
        np.minimum(wmin, link_of[cur], out=wmin)
        step += 1
        cur = jump[cur]
    if record:
        cat = (np.concatenate(rec_e) if rec_e else
               np.zeros(0, np.int64),
               np.concatenate(rec_w) if rec_w else
               np.zeros(0, np.int64),
               np.concatenate(rec_o) if rec_o else
               np.zeros(0, np.int64))
        return nxt_a, alen, amin, cat
    return nxt_a, alen, amin


def _perm_cycle_layout(jump: np.ndarray, link_of: np.ndarray,
                       stride: int | None = None):
    """Cycle decomposition of a permutation by a blocked anchor walk.

    Theta(m) total gather work versus Theta(m log m) for pointer
    doubling: B evenly-spaced anchors walk forward in lockstep (one
    ``jump`` gather per step over only the still-active walkers); each
    arc ends at the next anchor reached, so every edge is gathered
    exactly once.  Anchor arcs are then chained into cycles in Python
    (s anchors << m edges).  Cycles that contain no anchor (possible
    for short cycles) stay unlabeled and are re-walked with a denser
    anchor set; the stride shrinks geometrically, so the final round
    has stride 1 and coverage is total.

    Returns ``(cyc, rank, cyc_len, cyc_min, layout, start_off)``:
    ``cyc[e]`` the directed-cycle id of edge ``e``; ``rank[e]`` its
    position along the cycle from that cycle's origin anchor;
    ``cyc_len[c]`` the cycle length; ``cyc_min[c]`` the minimum
    ``link_of`` value on the cycle; ``layout[start_off[c] + r]`` the
    edge at rank ``r`` of cycle ``c``.
    """
    m = len(jump)
    if stride is None:
        stride = max(1, m // 8192)
    label = np.full(m, -1, dtype=np.int64)    # owning anchor per edge
    off = np.zeros(m, dtype=np.int64)         # steps from that anchor
    anchor_id = np.full(m, -1, dtype=np.int64)
    next_parts = []                            # per round: next anchor
    alen_parts = []                            # per round: arc lengths
    amin_parts = []                            # per round: arc min label
    base = 0
    first = True
    while True:
        if first:
            cand = np.arange(0, m, stride, dtype=np.int64)
            first = False
        else:
            unvis = np.flatnonzero(label < 0)
            if not len(unvis):
                break
            stride = max(1, stride // 32)
            cand = np.ascontiguousarray(unvis[::stride])
        k = len(cand)
        aid = base + np.arange(k, dtype=np.int64)
        label[cand] = aid
        off[cand] = 0
        anchor_id[cand] = aid
        res = None
        if PARALLEL_LAYOUT is not None:
            # pipeline-injected task wave (pipelines/parallel_fill.py):
            # anchor_id is fully set BEFORE any walker moves, so
            # walkers are independent (each non-anchor edge belongs to
            # exactly one arc) and shard merging is a disjoint scatter
            res = PARALLEL_LAYOUT(jump, link_of, cand, base,
                                  label, off, anchor_id)
        if res is None:
            res = _walk_wave(jump, link_of, cand, base,
                             label, off, anchor_id)
        nxt_a, alen, amin = res
        next_parts.append(nxt_a)
        alen_parts.append(alen)
        amin_parts.append(amin)
        base += k
    next_a = np.concatenate(next_parts)
    arc_len = np.concatenate(alen_parts)
    arc_min = np.concatenate(amin_parts)
    s = len(next_a)
    # chain anchors into cycles (next_a is a permutation of anchors)
    cyc_of_a = np.full(s, -1, dtype=np.int64)
    prefix_of_a = np.zeros(s, dtype=np.int64)
    cyc_len_l = []
    cyc_min_l = []
    nl = next_a.tolist()
    ll = arc_len.tolist()
    ml = arc_min.tolist()
    c = 0
    for a0 in range(s):
        if cyc_of_a[a0] >= 0:
            continue
        a = a0
        total = 0
        mn = ml[a0]
        while cyc_of_a[a] < 0:
            cyc_of_a[a] = c
            prefix_of_a[a] = total
            total += ll[a]
            if ml[a] < mn:
                mn = ml[a]
            a = nl[a]
        cyc_len_l.append(total)
        cyc_min_l.append(mn)
        c += 1
    cyc_len = np.asarray(cyc_len_l, dtype=np.int64)
    cyc_min = np.asarray(cyc_min_l, dtype=np.int64)
    cyc = cyc_of_a[label]
    rank = prefix_of_a[label] + off
    start_off = np.concatenate(([0], np.cumsum(cyc_len)))
    layout = np.empty(m, dtype=np.int64)
    layout[start_off[cyc] + rank] = np.arange(m, dtype=np.int64)
    return cyc, rank, cyc_len, cyc_min, layout, start_off


_PURE_PLAN_MIN_LINKS = 1024  # below this the walk beats the array setup
_PURE_CYCLE_CAP = 96  # vectorization pays for many short cycles; a few
# long contours are cheaper on the sequential walk


def _pure_cycle_plan(links: Links, rule: int, clockwise: bool,
                     preserve_collinear: bool, min_area: int,
                     materialize: bool = True, as_arrays: bool = False):
    """Vectorized extraction of every contour whose cycle passes only
    through degree-2 nodes ("pure" cycles).

    Pure and impure links never share a node (a degree-2 node's two
    links are cycle-mates, so they are both pure or both impure),
    therefore pure contours never interact with the sequential walk's
    visited state and can be computed up front, bit-exactly, and merged
    back by discovery order (= each cycle's minimal link id).

    Cycles that would need simplification (collinear vertices), fail
    the area filter, are shorter than 3 links or longer than
    ``_PURE_CYCLE_CAP`` are left to the sequential walk.

    Returns ``None`` when unavailable, else ``(visited_init, starts,
    holes, points)`` where ``visited_init`` is a uint8 array with pure
    links pre-marked, ``starts`` is the sorted array of discovery keys
    and ``points[i]`` is the materialized contour for ``starts[i]``.
    """
    if links._np_ids is None or links._np_fill is None:
        return None
    n = len(links)
    if n < _PURE_PLAN_MIN_LINKS:
        return None  # sequential walk is cheaper than the array setup
    succ = _build_succ2(links)
    orig = np.flatnonzero(succ >= 0)
    if not len(orig):
        return None
    a_id, b_id = links._np_ids
    ax, ay, bx, by = links._np
    _, bounds, link_sorted = links._node_arrays
    fills = links._np_fill

    # short stepping only up to K0: tiny cycles (the bulk of dense
    # grids) close within a few steps; everything longer is ranked by
    # ONE pointer-doubling pass over the COMPACTED survivor set (the
    # old design stepped _PURE_CYCLE_CAP times over every long-cycle
    # edge before reaching the doubling — ~0.1 s wasted on Spiral)
    groups = []  # (length, member directed edges | None, starts | None)
    K0 = min(12, _PURE_CYCLE_CAP)
    cur = succ[orig]
    k = 1
    any_closed = False
    while len(orig) and k <= K0:
        closed = cur == orig
        if closed.any():
            any_closed = True
            if k >= 3:
                groups.append((k, orig[closed], None))
            keep = ~closed
            orig = orig[keep]
            cur = cur[keep]
        elif k > 5 and not any_closed:
            # no cycle of length <= 5 exists: this is the long-cycle
            # regime (Spiral-class), where every remaining short step
            # is a wasted full-array gather — the blocked anchor walk
            # below handles any length exactly, so bail early.
            # Grid scenes (quads close at k=4) never take this branch.
            break
        nxt = succ[cur]
        alive = nxt >= 0
        if not alive.all():
            orig = orig[alive]
            nxt = nxt[alive]
        cur = nxt
        k += 1

    long_cycles = []   # (L, starts[1], hole[1], P, M)
    if len(orig) and _PURE_CYCLE_CAP > 0:
        sv = orig                      # sorted survivor edge ids
        m = len(sv)
        full_domain = m == len(succ)
        if full_domain:
            # every directed edge survived: compact ids == edge ids, so
            # the searchsorted re-index is the identity (saves ~1 s on
            # a 3M-edge single component) and succ is already a
            # permutation (no -1 exists)
            jump0 = succ
            perm = True
        else:
            nxt = succ[sv]
            pos = np.searchsorted(sv, nxt)
            okp = pos < m
            pos_c = np.minimum(pos, m - 1)
            okp &= sv[pos_c] == nxt
            jump0 = np.where(okp, pos_c, np.int64(-1))
            perm = bool(okp.all())
        layout_info = None
        if perm:
            # no tails: jump is a permutation (pure cycles only), so
            # the blocked anchor walk decomposes it in Theta(m) gather
            # work — one visit per edge — instead of the doubling's
            # Theta(m log m) full-array rounds
            cycv, rankv, cyc_len, cyc_min, layout, start_off = \
                _perm_cycle_layout(jump0, sv >> 1)
            layout_info = (cycv, rankv, cyc_len, layout, start_off)
            on_cycle = np.ones(m, dtype=bool)
            keys, first_i = np.unique(cyc_min, return_index=True)
            lens = cyc_len[first_i]   # both orientations: equal length
        else:
            jump = jump0.copy()
            mn_l = sv >> 1
            rounds = max(1, int(m).bit_length())
            for _ in range(rounds):
                v = np.flatnonzero(jump >= 0)
                if not len(v):
                    break
                t = jump[v]
                mn_l[v] = np.minimum(mn_l[v], mn_l[t])
                jump[v] = jump[t]
            on_cycle = jump >= 0   # tails hit a -1 within 2^rounds steps
            if on_cycle.any():
                keys, cnts = np.unique(mn_l[on_cycle],
                                       return_counts=True)
                lens = cnts >> 1   # each physical cycle = 2 orientations
            else:
                keys = np.zeros(0, np.int64)
                lens = keys
        if len(keys):
            # mid-length cycles (K0 < L <= CAP): start keys come
            # straight from the min-label pass, grouped by length
            midsel = (lens >= 3) & (lens <= _PURE_CYCLE_CAP)
            if midsel.any():
                mk = keys[midsel]
                ml = lens[midsel]
                o = np.argsort(ml, kind="stable")
                mk = mk[o]
                ml = ml[o]
                bnd_m = np.flatnonzero(
                    np.concatenate(([True], ml[1:] != ml[:-1])))
                ends_m = np.concatenate((bnd_m[1:], [len(ml)]))
                for i in range(len(bnd_m)):
                    groups.append((int(ml[bnd_m[i]]), None,
                                   mk[bnd_m[i]:ends_m[i]]))
            sel = lens > _PURE_CYCLE_CAP
            keys = keys[sel]
            lens = lens[sel]
        else:
            keys = np.zeros(0, np.int64)
            lens = keys
        if len(keys):
            starts_l = keys
            va = a_id[starts_l]
            i0 = link_sorted[bounds[va]]
            i1 = link_sorted[bounds[va] + 1]
            crs = (bx[i0] - ax[i0]) * (by[i1] - ay[i0]) - \
                (by[i0] - ay[i0]) * (bx[i1] - ax[i0])
            left = np.where(crs < 0, i0, i1)
            hole_l = _is_fill_top_arr(fills[left], rule)
            direction = hole_l == clockwise
            d0 = 2 * left + np.where(direction, 0, 1)
            if layout_info is not None:
                # permutation case: the walk already ranked every edge
                # along its cycle, so the chosen orientation's contour
                # is one roll of the cycle's layout slice to start at d0
                cycv, rankv, cyc_len, layout, start_off = layout_info
                if full_domain:
                    d0p = d0
                    d_ok = np.ones(len(d0), dtype=bool)
                else:
                    d0p = np.searchsorted(sv, d0)
                    dpc = np.minimum(d0p, m - 1)
                    d_ok = (d0p < m) & (sv[dpc] == d0)
                    d0p = dpc
                for t_i in range(len(starts_l)):
                    if not d_ok[t_i]:
                        continue    # leave to the sequential walk
                    p = int(d0p[t_i])
                    c2 = int(cycv[p])
                    L = int(lens[t_i])
                    if int(cyc_len[c2]) != L:
                        continue    # inconsistent: sequential walk
                    blk = layout[start_off[c2]:start_off[c2] + L]
                    ordered = np.roll(blk, -int(rankv[p]))
                    full_eds = ordered if full_domain else sv[ordered]
                    ll = full_eds >> 1
                    oo = full_eds & 1
                    P = np.empty((1, L, 2), dtype=np.int64)
                    M = np.empty((1, L), dtype=np.int64)
                    P[0, :, 0] = np.where(oo == 1, ax[ll], bx[ll])
                    P[0, :, 1] = np.where(oo == 1, ay[ll], by[ll])
                    M[0, :] = ll
                    long_cycles.append((L, starts_l[t_i:t_i + 1],
                                        hole_l[t_i:t_i + 1], P, M))
            else:
                # break each CHOSEN orientation's cycle just before d0
                # and measure distance-to-break by doubling (compact
                # space); the reverse orientation stays unbroken and
                # never reaches a -1
                d0p = np.searchsorted(sv, d0)
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
                rk = mn_l[red]
                o2 = np.argsort(rk, kind="stable")
                red = red[o2]
                rk = rk[o2]
                bnd = np.flatnonzero(np.concatenate(([True],
                                                     rk[1:] != rk[:-1])))
                ends = np.concatenate((bnd, [len(red)]))
                run_key = rk[bnd]
                pos_of = np.searchsorted(run_key, starts_l)
                for t_i in range(len(starts_l)):
                    p = pos_of[t_i]
                    if p >= len(run_key) or run_key[p] != starts_l[t_i]:
                        continue    # leave to the sequential walk
                    eds = red[bnd[p]:ends[p + 1]]
                    L = int(lens[t_i])
                    if len(eds) != L:
                        continue    # inconsistent: sequential walk
                    rank = L - dist[eds]
                    full_eds = sv[eds]
                    ll = full_eds >> 1
                    oo = full_eds & 1
                    P = np.empty((1, L, 2), dtype=np.int64)
                    M = np.empty((1, L), dtype=np.int64)
                    P[0, rank, 0] = np.where(oo == 1, ax[ll], bx[ll])
                    P[0, rank, 1] = np.where(oo == 1, ay[ll], by[ll])
                    M[0, rank] = ll
                    long_cycles.append((L, starts_l[t_i:t_i + 1],
                                        hole_l[t_i:t_i + 1], P, M))

    if not groups and not long_cycles:
        return None

    all_starts = []
    all_holes = []
    all_points = []
    visited_init = np.zeros(n, dtype=np.uint8)
    pending = []
    for L, edges, starts0 in groups:
        if starts0 is None:
            # min link id per cycle = discovery key
            cur = edges
            mn = cur >> 1
            for _ in range(L - 1):
                cur = succ[cur]
                mn = np.minimum(mn, cur >> 1)
            starts = np.unique(mn)
        else:
            starts = starts0    # already min-label keys from doubling
        # left-top selection at the start link's a-node (degree 2)
        va = a_id[starts]
        i0 = link_sorted[bounds[va]]
        i1 = link_sorted[bounds[va] + 1]
        crs = (bx[i0] - ax[i0]) * (by[i1] - ay[i0]) - \
            (by[i0] - ay[i0]) * (bx[i1] - ax[i0])
        left = np.where(crs < 0, i0, i1)
        hole = _is_fill_top_arr(fills[left], rule)
        direction = hole == clockwise
        d0 = 2 * left + np.where(direction, 0, 1)
        m = len(starts)
        P = np.empty((m, L, 2), dtype=np.int64)
        M = np.empty((m, L), dtype=np.int64)
        P[:, 0, 0] = np.where(direction, bx[left], ax[left])
        P[:, 0, 1] = np.where(direction, by[left], ay[left])
        M[:, 0] = left
        cur = d0
        for step in range(1, L):
            cur = succ[cur]
            l = cur >> 1
            o = cur & 1
            P[:, step, 0] = np.where(o == 1, ax[l], bx[l])
            P[:, step, 1] = np.where(o == 1, ay[l], by[l])
            M[:, step] = l
        pending.append((L, starts, hole, P, M))

    # long cycles: only accept rings the simplification leaves UNCHANGED
    # (mirror the short-cycle `ok` filter). A modified ring would need
    # the walk's is_modified anchor repair (extract.rs:147-163 /
    # extract_shapes below): _flush_pure anchors holes at points[0]/[1]
    # of the simplified ring, so if simplification removed the
    # traversal-start vertex the hole could bind to the wrong hull.
    # Modified/invalid rings stay UNVISITED and fall to the sequential
    # walk, which recomputes the anchor correctly.
    for L, starts, hole, P, M in long_cycles:
        ring = P[0]
        if not preserve_collinear:
            Pm = np.roll(ring, 1, axis=0)
            Pp = np.roll(ring, -1, axis=0)
            cr = (ring[:, 0] - Pm[:, 0]) * (Pp[:, 1] - Pm[:, 1]) \
                - (ring[:, 1] - Pm[:, 1]) * (Pp[:, 0] - Pm[:, 0])
            if (cr == 0).any():
                continue    # modified → sequential walk handles it
        if len(ring) < 3:
            continue
        if min_area:
            x0 = ring[:, 0]
            y0 = ring[:, 1]
            a2 = int((x0 * np.roll(ring[:, 1], -1)
                      - np.roll(ring[:, 0], -1) * y0).sum())
            if (abs(a2) >> 1) < min_area:
                continue
        visited_init[M.reshape(-1)] = np.uint8(
            HOLE_VISITED if hole[0] else HULL_VISITED)
        all_starts.append(starts)
        all_holes.append(hole)
        if not materialize:
            all_points.append(ring[None, :, :])
        elif as_arrays:
            all_points.append(ring)
        else:
            all_points.append([tuple(p) for p in ring.tolist()])

    for L, starts, hole, P, M in pending:
        m = len(starts)
        # validity: no degenerate vertices (unless preserved), area bar
        ok = np.ones(m, dtype=bool)
        if not preserve_collinear:
            Pm = np.roll(P, 1, axis=1)
            Pp = np.roll(P, -1, axis=1)
            cr = (P[:, :, 0] - Pm[:, :, 0]) * (Pp[:, :, 1] - Pm[:, :, 1]) \
                - (P[:, :, 1] - Pm[:, :, 1]) * (Pp[:, :, 0] - Pm[:, :, 0])
            ok &= ~(cr == 0).any(axis=1)
        if min_area:
            x0 = P[:, :, 0]
            y0 = P[:, :, 1]
            x1 = np.roll(x0, -1, axis=1)
            y1 = np.roll(y0, -1, axis=1)
            area2 = (x0 * y1 - x1 * y0).sum(axis=1)
            ok &= (np.abs(area2) >> 1) >= min_area
        if not ok.all():
            starts = starts[ok]
            hole = hole[ok]
            P = P[ok]
            M = M[ok]
        if not len(starts):
            continue
        visited_init[M.reshape(-1)] = np.where(
            hole, HOLE_VISITED, HULL_VISITED).astype(
                np.uint8).repeat(L)
        all_starts.append(starts)
        all_holes.append(hole)
        if not materialize:
            all_points.append(P)
        elif as_arrays:
            all_points.extend(P[j] for j in range(len(P)))
        else:
            # materialize tuples once, batched
            pl = P.tolist()
            all_points.extend(
                ([tuple(p) for p in row] for row in pl))
    if not all_starts:
        return None
    if not materialize:
        return (visited_init, all_starts, all_holes, all_points)
    starts = np.concatenate(all_starts)
    holes = np.concatenate(all_holes)
    order = np.argsort(starts, kind="stable")
    pts_ordered = [all_points[i] for i in order.tolist()]
    return (visited_init, starts[order].tolist(), holes[order].tolist(),
            pts_ordered)

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
    tbl = links.pair_cw if clockwise else links.pair_ccw
    if tbl is not None:
        y = tbl[2 * link_id + (0 if links.a_id[link_id] == node_id else 1)]
        if y >= 0:
            n = len(links.a)
            if y >= n:
                return y - n  # degree-2 partner: unconditional
            if visited[y] == UNVISITED:
                return y
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
        n = len(pts)
        # scan-only fast path: most contours need no simplification
        p0 = pts[-2]
        p1 = pts[-1]
        for i in range(n):
            p2 = pts[i]
            if (p1[0] - p0[0]) * (p2[1] - p0[1]) == \
                    (p1[1] - p0[1]) * (p2[0] - p0[0]):
                changed = True
                break
            p0 = p1
            p1 = p2
        if not changed:
            break
        modified = True
        out = []
        for i in range(n):
            if _cross(pts[i - 1], pts[i], pts[(i + 1) % n]) != 0:
                out.append(pts[i])
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
    import heapq
    segments.sort(key=functools.cmp_to_key(
        lambda u, v: (-1 if u[0][0] < v[0][0] else 1) if u[0][0] != v[0][0]
        else _cmp_by_angle(u[0], v[0])))

    parent_for_child = [-1] * len(holes)

    # status line sorted by the under-order: output edges never cross,
    # so the pairwise _vseg_cmp order of co-overlapping segments is
    # static and bisection is valid — O((n+q) log n) comparisons
    # instead of the per-anchor full rescan (O(n^2) on deep nesting:
    # 2048 concentric frames went 11 s -> ~0.1 s)
    status: list = []       # [(vseg, tag)] ascending by _vseg_cmp
    expiry: list = []       # heap of (end_x, seq, vseg)
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
    for anchor_vseg, (_, child_index) in anchors:
        p = anchor_vseg[0]
        # expire FIRST so every comparison below is between segments
        # whose x-spans overlap at p.x (same kept set as the original
        # admit-then-purge: admitted segments always end past p.x)
        while expiry and expiry[0][0] < p[0]:
            _, _, vseg = heapq.heappop(expiry)
            pos = locate(vseg)
            while pos < len(status) and status[pos][0] != vseg:
                pos += 1    # defensive: equal-comparing neighbors
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

        # greatest segment strictly under the anchor
        pos = locate(anchor_vseg)
        best_tag = status[pos - 1][1] if pos else None

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
                   nest_holes: bool = True,
                   as_arrays: bool = False) -> List[list]:
    """Walk the filtered link graph into shapes-with-holes.

    Returns [[contour, hole, hole, ...], ...]; hull direction CCW unless
    ``clockwise``; holes opposite. ``nest_holes=False`` is the flat
    variant (extract_contours_into, core/extract.rs:223-276): every
    contour comes back top-level in discovery order, holes unbound.
    """
    n = len(links)
    plan = _pure_cycle_plan(links, rule, clockwise,
                            preserve_output_collinear, min_output_area,
                            as_arrays=as_arrays)
    all_pure = False
    if plan is not None:
        vis_init, p_starts, p_holes, p_points = plan
        all_pure = bool(vis_init.all())
        visited = bytearray(vis_init.tobytes())
    else:
        p_starts = []
        visited = bytearray(n)
    if not all_pure:
        # pair tables feed _next_link only — when the plan covered
        # every link the sequential walk never runs, and the 2x-tolist
        # table build (~1.4 s on a 3M-edge component) is pure waste
        ensure_pair_tables(links)
    shapes: List[list] = []
    holes: List[List[Point]] = []
    anchors: List[tuple] = []
    anchors_sorted = True
    pp = 0
    np_starts = len(p_starts)

    def _flush_pure(limit: int) -> None:
        nonlocal pp
        while pp < np_starts and p_starts[pp] <= limit:
            points = p_points[pp]
            if p_holes[pp]:
                # anchors/join_holes compare tuple points
                if isinstance(points, np.ndarray):
                    points = [tuple(p) for p in points.tolist()]
                left_bottom = points[1] if clockwise else points[0]
                v_seg = _left_bottom_segment_from(points, left_bottom)
                anchors.append((v_seg, ("hole", len(holes))))
                holes.append(points)
            else:
                shapes.append([points])
            pp += 1

    link_index = n if all_pure else 0
    while link_index < n:
        if visited[link_index] != UNVISITED:
            if pp < np_starts:
                _flush_pure(link_index)
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

    _flush_pure(n)
    if not nest_holes:
        return [[c] for shape in shapes for c in shape] + \
               [[h] for h in holes]
    if holes:
        # hole binding scans hull contours as tuple points
        for s in shapes:
            if isinstance(s[0], np.ndarray):
                s[0] = [tuple(p) for p in s[0].tolist()]
    join_holes(shapes, holes, anchors, clockwise, anchors_sorted)
    return shapes


def extract_stats(links: Links, rule: int, clockwise: bool = False,
                  preserve_output_collinear: bool = False,
                  min_output_area: int = 0):
    """Per-contour (anchor_x, signed area2, is_hole) WITHOUT
    materializing Python point lists — the stats surface for packed
    fleets of small jobs (counting/area reductions).  Pure cycles stay
    as numpy matrices; only impure contours fall back to the walk.
    Signed area follows traversal direction: hulls positive, holes
    negative (clockwise=False)."""
    n = len(links)
    plan = _pure_cycle_plan(links, rule, clockwise,
                            preserve_output_collinear, min_output_area,
                            materialize=False)
    xs_parts = []
    a2_parts = []
    hole_parts = []
    all_pure = False
    if plan is not None:
        vis_init, g_starts, g_holes, g_P = plan
        all_pure = bool(vis_init.all())
        if not all_pure:
            ensure_pair_tables(links)
        visited = bytearray(vis_init.tobytes())
        for starts, hole, P in zip(g_starts, g_holes, g_P):
            x0 = P[:, :, 0]
            y0 = P[:, :, 1]
            x1 = np.roll(x0, -1, axis=1)
            y1 = np.roll(y0, -1, axis=1)
            a2 = (x0 * y1 - x1 * y0).sum(axis=1)
            xs_parts.append(P[:, 0, 0])
            a2_parts.append(a2)
            hole_parts.append(hole)
    else:
        ensure_pair_tables(links)
        visited = bytearray(n)

    sq_x = []
    sq_a2 = []
    sq_h = []
    link_index = n if all_pure else 0
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
        points, is_valid, _ = validate_contour(
            points, min_output_area, preserve_output_collinear)
        if not is_valid:
            link_index += 1
            continue
        a2 = 0
        npts = len(points)
        for i in range(npts):
            p0 = points[i - 1]
            p1 = points[i]
            a2 += p0[0] * p1[1] - p1[0] * p0[1]
        sq_x.append(points[0][0])
        sq_a2.append(a2)
        sq_h.append(hole)
    if sq_x:
        xs_parts.append(np.asarray(sq_x, np.int64))
        a2_parts.append(np.asarray(sq_a2, np.int64))
        hole_parts.append(np.asarray(sq_h, bool))
    if not xs_parts:
        z = np.zeros(0, np.int64)
        return z, z.copy(), np.zeros(0, bool)
    return (np.concatenate(xs_parts), np.concatenate(a2_parts),
            np.concatenate(hole_parts))


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
    """OGC-valid variant of extract_shapes (options.ogc).

    Pure (degree-2-only) cycles take the vectorized plan fast path: at
    degree-2 nodes the rotation flag never matters, so a pure cycle's
    OGC contour is bit-identical to the plain-extract contour (hull
    start data uses direction = not clockwise in both; hole start data
    uses direction = clockwise in both) and a pure hull can never
    pinch off interior loops. Only the two-pass assembly order and the
    hole_count bookkeeping differ, which the flush pointers replicate.
    """
    n = len(links)
    plan = _pure_cycle_plan(links, rule, clockwise,
                            preserve_output_collinear, min_output_area)
    if plan is not None:
        vis_init, p_starts, p_holes, p_points = plan
        if not vis_init.all():
            ensure_pair_tables(links)
        visited = bytearray(vis_init.tobytes())
        pure_mask = vis_init != 0
        hull_q = [(s, p) for s, h, p in zip(p_starts, p_holes, p_points)
                  if not h]
        hole_q = [(s, p) for s, h, p in zip(p_starts, p_holes, p_points)
                  if h]
    else:
        ensure_pair_tables(links)
        visited = bytearray(n)
        pure_mask = None
        hull_q = []
        hole_q = []
    shapes: List[list] = []
    traversal = not clockwise
    hole_count = len(hole_q)
    hp = 0          # pass-1 flush pointer over pure hulls

    def _flush_hulls(limit: int) -> None:
        nonlocal hp
        while hp < len(hull_q) and hull_q[hp][0] <= limit:
            shapes.append([hull_q[hp][1]])
            hp += 1

    link_index = 0
    while link_index < n:
        if visited[link_index] != UNVISITED:
            _flush_hulls(link_index)
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
    _flush_hulls(n)

    if hole_count:
        # second pass: only hole edges stay walkable (pure holes are
        # already extracted by the plan — keep them skipped)
        for i in range(n):
            visited[i] = UNVISITED if visited[i] == HOLE_VISITED else SKIPPED
        if pure_mask is not None:
            for i in np.flatnonzero(pure_mask).tolist():
                visited[i] = SKIPPED
        holes: List[List[Point]] = []
        anchors: List[tuple] = []
        anchors_sorted = True
        qp = 0      # pass-2 flush pointer over pure holes

        def _flush_holes(limit: int) -> None:
            nonlocal qp
            while qp < len(hole_q) and hole_q[qp][0] <= limit:
                points = hole_q[qp][1]
                left_bottom = points[1] if clockwise else points[0]
                v_seg = _left_bottom_segment_from(points, left_bottom)
                anchors.append((v_seg, ("hole", len(holes))))
                holes.append(points)
                qp += 1

        link_index = 0
        while link_index < n:
            if visited[link_index] != UNVISITED:
                _flush_holes(link_index)
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
        _flush_holes(n)
        join_holes(shapes, holes, anchors, clockwise, anchors_sorted)
    return shapes
