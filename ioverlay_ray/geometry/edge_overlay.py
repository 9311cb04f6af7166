"""Boolean overlay at raw-edge granularity with user data propagation.

Re-expresses EdgeOverlay + the OverlayEdgeData UDF surface
(core/edge_overlay.rs:18-130, core/edge_data.rs:5-45): every input edge
carries an opaque user payload that rides THROUGH the pipeline —
flipped on direction normalization, split when the edge is subdivided
at an intersection, merged by a user callback when identical edges
collapse. In the Ray engine this is the hook for provenance ids, layer
ids or weights travelling with geometry columns inside map_batches.

The segment table stays the numpy kernel's; data lives in a parallel
Python list, touched only on the (rare) merge/split rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Sequence, Tuple

import numpy as np

from .kernel import (FILL_RULE_NAMES, RULE_NAMES, Segments, _apply_marks,
                     _find_marks, _order_sub_marks, compute_fills,
                     rule_include_mask)

Point = Tuple[int, int]


@dataclass
class EdgeDataOps:
    """User callbacks (OverlayEdgeData trait, core/edge_data.rs:5-20).

    - reversed(d): payload for the direction-flipped edge (default id)
    - split((a, p, b), d): payload pair for the two halves (default copy)
    - merge(lhs_d, lhs_counts, rhs_d, rhs_counts, out_counts): combine
      payloads of identical overlapping edges (required)
    """
    merge: Callable[[Any, tuple, Any, tuple, tuple], Any]
    reversed: Callable[[Any], Any] = staticmethod(lambda d: d)
    split: Callable[[tuple, Any], Tuple[Any, Any]] = \
        staticmethod(lambda ctx, d: (d, d))


def build_edge_segments(subj_edges: Sequence, clip_edges: Sequence,
                        ops: EdgeDataOps):
    """edges = (a, b, data) triples -> (Segments, data list)."""
    ax, ay, bx, by, subj, clip, data = [], [], [], [], [], [], []
    for edges, is_subj in ((subj_edges, True), (clip_edges, False)):
        for a, b, d in edges:
            a = tuple(a)
            b = tuple(b)
            if a == b:
                continue
            if a < b:
                w = 1
            else:
                a, b, w = b, a, -1
                d = ops.reversed(d)
            ax.append(a[0]); ay.append(a[1])
            bx.append(b[0]); by.append(b[1])
            subj.append(w if is_subj else 0)
            clip.append(0 if is_subj else w)
            data.append(d)
    return Segments(ax, ay, bx, by, subj, clip), data


def sort_merge_with_data(segs: Segments, data: List[Any],
                         ops: EdgeDataOps):
    """kernel.sort_merge with the user merge callback on duplicate runs
    (segm/merge.rs:26-87 with EdgeDataMerge)."""
    n = len(segs)
    if n == 0:
        return segs, data
    order = np.lexsort((segs.by, segs.bx, segs.ay, segs.ax))
    s = segs.take(order)
    d = [data[i] for i in order.tolist()]
    out_idx: List[int] = []
    out_subj: List[int] = []
    out_clip: List[int] = []
    out_data: List[Any] = []
    i = 0
    while i < n:
        j = i + 1
        while j < n and s.ax[j] == s.ax[i] and s.ay[j] == s.ay[i] and \
                s.bx[j] == s.bx[i] and s.by[j] == s.by[i]:
            j += 1
        su = int(s.subj[i]); cl = int(s.clip[i]); dd = d[i]
        for k in range(i + 1, j):
            nsu = su + int(s.subj[k])
            ncl = cl + int(s.clip[k])
            dd = ops.merge(dd, (su, cl), d[k],
                           (int(s.subj[k]), int(s.clip[k])), (nsu, ncl))
            su, cl = nsu, ncl
        if su != 0 or cl != 0:
            out_idx.append(i)
            out_subj.append(su)
            out_clip.append(cl)
            out_data.append(dd)
        i = j
    g = np.asarray(out_idx, np.int64)
    return Segments(s.ax[g], s.ay[g], s.bx[g], s.by[g],
                    out_subj, out_clip), out_data


def _apply_marks_with_data(segs: Segments, data, m_idx, m_px, m_py,
                           ops: EdgeDataOps):
    """kernel._apply_marks threading data through subdivision
    (split/solver.rs:158-251 with OverlayEdgeData::split)."""
    idx = np.asarray(m_idx, dtype=np.int64)
    px = np.asarray(m_px, dtype=np.int64)
    py = np.asarray(m_py, dtype=np.int64)
    order = np.lexsort((py, px, idx))
    idx, px, py = idx[order], px[order], py[order]
    if len(idx) > 1:
        dup = (idx[1:] == idx[:-1]) & (px[1:] == px[:-1]) & (py[1:] == py[:-1])
        keep = np.concatenate(([True], ~dup))
        idx, px, py = idx[keep], px[keep], py[keep]

    marked = set(idx.tolist())
    out_ax, out_ay, out_bx, out_by = [], [], [], []
    out_subj, out_clip, out_data = [], [], []

    def emit(p, q, su, cl, dd):
        if p < q:
            out_ax.append(p[0]); out_ay.append(p[1])
            out_bx.append(q[0]); out_by.append(q[1])
            out_subj.append(su); out_clip.append(cl)
            out_data.append(dd)
        else:
            out_ax.append(q[0]); out_ay.append(q[1])
            out_bx.append(p[0]); out_by.append(p[1])
            out_subj.append(-su); out_clip.append(-cl)
            out_data.append(ops.reversed(dd))

    idx_l = idx.tolist(); px_l = px.tolist(); py_l = py.tolist()
    pos = 0
    n_marks = len(idx_l)
    while pos < n_marks:
        start = pos
        seg_i = idx_l[pos]
        pos += 1
        while pos < n_marks and idx_l[pos] == seg_i:
            pos += 1
        pts = [(px_l[k], py_l[k]) for k in range(start, pos)]
        a = (int(segs.ax[seg_i]), int(segs.ay[seg_i]))
        b = (int(segs.bx[seg_i]), int(segs.by[seg_i]))
        if len(pts) > 1:
            pts = _order_sub_marks(pts, a, b)
        su = int(segs.subj[seg_i]); cl = int(segs.clip[seg_i])
        dd = data[seg_i]
        prev = a
        for p in pts:
            left, dd = ops.split((a, p, b), dd)
            emit(prev, p, su, cl, left)
            prev = p
        emit(prev, b, su, cl, dd)

    for i in range(len(segs)):
        if i not in marked:
            out_ax.append(int(segs.ax[i])); out_ay.append(int(segs.ay[i]))
            out_bx.append(int(segs.bx[i])); out_by.append(int(segs.by[i]))
            out_subj.append(int(segs.subj[i])); out_clip.append(int(segs.clip[i]))
            out_data.append(data[i])

    return sort_merge_with_data(
        Segments(out_ax, out_ay, out_bx, out_by, out_subj, out_clip),
        out_data, ops)


def split_segments_with_data(segs: Segments, data, ops: EdgeDataOps,
                             max_rounds: int = 1000):
    segs, data = sort_merge_with_data(segs, data, ops)
    if len(segs) < 2:
        return segs, data
    exp = 0
    for _ in range(max_rounds):
        radius = 1 << exp
        m_idx, m_px, m_py, any_round = _find_marks(segs, radius)
        if len(m_idx) == 0:
            return segs, data
        segs, data = _apply_marks_with_data(segs, data, m_idx, m_px, m_py,
                                            ops)
        exp = min(60, exp + 1)
        if not any_round or len(segs) < 2:
            if not any_round:
                return segs, data
    return segs, data


def edge_overlay(subj_edges: Sequence, clip_edges: Sequence, rule,
                 fill_rule, ops: EdgeDataOps) -> List[tuple]:
    """Full edge-granularity boolean overlay with data propagation:
    returns (ax, ay, bx, by, fill, data) for every rule-included edge
    (EdgeOverlay::build_vectors)."""
    if isinstance(rule, str):
        rule = RULE_NAMES[rule.lower()]
    if isinstance(fill_rule, str):
        fill_rule = FILL_RULE_NAMES[fill_rule.lower().replace("_", "")]
    segs, data = build_edge_segments(subj_edges, clip_edges, ops)
    segs, data = split_segments_with_data(segs, data, ops)
    if len(segs) == 0:
        return []
    fills = compute_fills(segs, fill_rule)
    mask = rule_include_mask(fills, rule)
    out = []
    for i in np.flatnonzero(mask).tolist():
        out.append((int(segs.ax[i]), int(segs.ay[i]), int(segs.bx[i]),
                    int(segs.by[i]), int(fills[i]), data[i]))
    return out
