"""Single-pair boolean overlay API (the per-task kernel).

End-to-end integer pipeline mirroring Overlay::overlay
(core/overlay.rs:354-372): build segments -> split -> fill -> filter ->
graph -> extract. This is the worker-local kernel that Ray Data stages
apply per polygon pair or per tile; it never touches Ray itself.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from . import kernel
from .kernel import (EVEN_ODD, NON_ZERO, RULE_NAMES, FILL_RULE_NAMES,
                     Segments, build_segments, compute_fills,
                     rule_include_mask, sort_merge, split_segments)
from .extract import Links, build_links, connect_nodes, extract_shapes

Contour = List[tuple]
Shape = List[Contour]
Shapes = List[Shape]


def _as_rule(rule) -> int:
    if isinstance(rule, str):
        return RULE_NAMES[rule.lower()]
    return int(rule)


def _as_fill_rule(fill_rule) -> int:
    if isinstance(fill_rule, str):
        return FILL_RULE_NAMES[fill_rule.lower()]
    return int(fill_rule)


class OverlayGraph:
    """Split + filled segment table reusable across overlay rules
    (Overlay::build_graph_view, core/overlay.rs:303-313)."""

    def __init__(self, segs: Segments, fills: np.ndarray, *,
                 clockwise: bool, preserve_output_collinear: bool,
                 min_output_area: int, ogc: bool = False):
        self.segs = segs
        self.fills = fills
        self.clockwise = clockwise
        self.preserve_output_collinear = preserve_output_collinear
        self.min_output_area = min_output_area
        self.ogc = ogc

    def extract(self, rule) -> Shapes:
        rule = _as_rule(rule)
        mask = rule_include_mask(self.fills, rule)
        links = build_links(self.segs, self.fills, mask)
        connect_nodes(links)
        if self.ogc:
            from .extract import extract_shapes_ogc
            return extract_shapes_ogc(
                links, rule, clockwise=self.clockwise,
                preserve_output_collinear=self.preserve_output_collinear,
                min_output_area=self.min_output_area)
        return extract_shapes(
            links, rule, clockwise=self.clockwise,
            preserve_output_collinear=self.preserve_output_collinear,
            min_output_area=self.min_output_area)


def build_graph(subj: Sequence[Contour], clip: Sequence[Contour],
                fill_rule=NON_ZERO, *, clockwise: bool = False,
                preserve_input_collinear: bool = False,
                preserve_output_collinear: bool = False,
                min_output_area: int = 0,
                ogc: bool = False) -> Optional[OverlayGraph]:
    fill_rule = _as_fill_rule(fill_rule)
    segs = build_segments(subj, clip, preserve_input_collinear)
    segs = split_segments(segs)
    if len(segs) == 0:
        return None
    fills = compute_fills(segs, fill_rule)
    return OverlayGraph(
        segs, fills, clockwise=clockwise,
        preserve_output_collinear=preserve_output_collinear,
        min_output_area=min_output_area, ogc=ogc)


def overlay(subj: Sequence[Contour], clip: Sequence[Contour], rule,
            fill_rule=NON_ZERO, **options) -> Shapes:
    """One boolean op on subject+clip multipolygon contour lists.

    rule: subject|clip|intersect|union|difference|inverse_difference|xor.
    fill_rule: evenodd|nonzero|positive|negative.
    """
    graph = build_graph(subj, clip, fill_rule, **options)
    if graph is None:
        return []
    return graph.extract(rule)


def overlay_pack(jobs: Sequence[tuple], rule, fill_rule=NON_ZERO,
                 margin: int = 4, **options) -> list:
    """Run MANY small independent overlay jobs in ONE kernel invocation.

    jobs: sequence of (subj_contours, clip_contours). Each job is
    translated into its own disjoint x-band (power-of-two stride), the
    combined segment table goes through a single split/fill pass, and
    outputs are routed back to jobs by x-band. Valid because every
    kernel stage prunes by x (candidate pairs, winding stab, node
    build, hole-bind scan) — disjoint bands never interact. This is the
    batching lever for fleets of tiny geometries: vectorized stages
    amortize over thousands of segments instead of dozens.

    Returns a list of Shapes, one entry per job (same order).
    """
    packs = overlay_pack_all(jobs, [rule], fill_rule, margin, **options)
    rule_key = _as_rule(rule)
    return [per_job[rule_key] for per_job in packs]


def overlay_pack_all(jobs: Sequence[tuple], rules, fill_rule=NON_ZERO,
                     margin: int = 4, **options) -> list:
    """overlay_pack for several rules: one packed split/fill pass, one
    extract per rule. Returns, per job, {rule_code: Shapes}."""
    rule_codes = [_as_rule(r) for r in rules]
    n_jobs = len(jobs)
    if n_jobs == 0:
        return []

    spans = []
    mins = []
    for subj, clip in jobs:
        xs = [p[0] for cs in (subj, clip) for c in cs for p in c]
        if not xs:
            spans.append(0)
            mins.append(0)
        else:
            spans.append(max(xs) - min(xs))
            mins.append(min(xs))
    stride = 1 << max(1, (max(spans) + 2 * margin)).bit_length()
    if stride * n_jobs >= (1 << 29):
        # halve the pack if it would overflow the safe coordinate range
        mid = max(1, n_jobs // 2)
        if mid == n_jobs:
            raise ValueError("single job exceeds the coordinate range")
        return (overlay_pack_all(jobs[:mid], rules, fill_rule, margin,
                                 **options) +
                overlay_pack_all(jobs[mid:], rules, fill_rule, margin,
                                 **options))

    all_subj, all_clip = [], []
    for k, (subj, clip) in enumerate(jobs):
        dx = k * stride + margin - mins[k]
        all_subj.extend([[(x + dx, y) for x, y in c] for c in subj])
        all_clip.extend([[(x + dx, y) for x, y in c] for c in clip])

    graph = build_graph(all_subj, all_clip, fill_rule, **options)
    out = [{code: [] for code in rule_codes} for _ in range(n_jobs)]
    for code in rule_codes:
        shapes = graph.extract(code) if graph else []
        for shape in shapes:
            k = shape[0][0][0] // stride
            dx = k * stride + margin - mins[k]
            out[k][code].append([[(x - dx, y) for x, y in c]
                                 for c in shape])
    return out


def overlay_all(subj, clip, fill_rule=NON_ZERO, rules=None, **options) -> dict:
    """Build the graph once, extract several rules (graph-view pattern)."""
    if rules is None:
        rules = list(RULE_NAMES)[:5] + ["xor"]
    graph = build_graph(subj, clip, fill_rule, **options)
    if graph is None:
        return {r: [] for r in rules}
    return {r: graph.extract(r) for r in rules}


def simplify_shape(contours: Sequence[Contour], fill_rule=NON_ZERO,
                   **options) -> Shapes:
    """Resolve self-intersections / merge overlapping contours of one
    multipolygon (core/simplify.rs semantics via Subject rule); doubles
    as N-way union/dissolve."""
    return overlay(contours, [], "subject", fill_rule, **options)


def extract_contours(subj, clip, rule, fill_rule=NON_ZERO,
                     **options) -> Shapes:
    """Flat contour extraction, no hole nesting
    (extract_contours_into, core/extract.rs:223-276)."""
    graph = build_graph(subj, clip, fill_rule, **options)
    if graph is None:
        return []
    rule = _as_rule(rule)
    mask = rule_include_mask(graph.fills, rule)
    links = build_links(graph.segs, graph.fills, mask)
    connect_nodes(links)
    flat = extract_shapes(links, rule, clockwise=graph.clockwise,
                          preserve_output_collinear=graph.preserve_output_collinear,
                          min_output_area=graph.min_output_area,
                          nest_holes=False)
    return [shape[0] for shape in flat]


def extract_vectors(subj, clip, rule, fill_rule=NON_ZERO):
    """Edge-level extraction (build_shape_vectors /
    vector/extract.rs:28-175): the rule-filtered split segments with
    their 4-bit fill masks as an edge table — (ax, ay, bx, by, fill)
    tuples — instead of walked contours."""
    graph = build_graph(subj, clip, fill_rule)
    if graph is None:
        return []
    mask = rule_include_mask(graph.fills, _as_rule(rule))
    idx = np.flatnonzero(mask)
    s = graph.segs
    return list(zip(s.ax[idx].tolist(), s.ay[idx].tolist(),
                    s.bx[idx].tolist(), s.by[idx].tolist(),
                    graph.fills[idx].tolist()))


def extract_separate_vectors(subj, clip, fill_rule=NON_ZERO):
    """All resolved segments with fills, no rule filter
    (build_separate_vectors, core/overlay.rs:260-298)."""
    graph = build_graph(subj, clip, fill_rule)
    if graph is None:
        return []
    s = graph.segs
    return list(zip(s.ax.tolist(), s.ay.tolist(), s.bx.tolist(),
                    s.by.tolist(), graph.fills.tolist()))


def decompose_contours(contours: Sequence[Contour],
                       min_area: int = 0) -> list:
    """Split self-touching contours into simple loops at repeated
    points (ContourDecomposition, core/divide.rs:34-119)."""
    from .string_ops import _split_loops
    out = []
    for contour in contours:
        pts = [tuple(p) for p in contour]
        if pts and pts[0] != pts[-1]:
            pts = pts + [pts[0]]  # walk must revisit the start to close
        loops = _split_loops(pts, min_area)
        out.extend(loop for loop in loops if len(loop) >= 3)
    return out
