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
