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
                 min_output_area: int):
        self.segs = segs
        self.fills = fills
        self.clockwise = clockwise
        self.preserve_output_collinear = preserve_output_collinear
        self.min_output_area = min_output_area

    def extract(self, rule) -> Shapes:
        rule = _as_rule(rule)
        mask = rule_include_mask(self.fills, rule)
        links = build_links(self.segs, self.fills, mask)
        connect_nodes(links)
        return extract_shapes(
            links, rule, clockwise=self.clockwise,
            preserve_output_collinear=self.preserve_output_collinear,
            min_output_area=self.min_output_area)


def build_graph(subj: Sequence[Contour], clip: Sequence[Contour],
                fill_rule=NON_ZERO, *, clockwise: bool = False,
                preserve_input_collinear: bool = False,
                preserve_output_collinear: bool = False,
                min_output_area: int = 0) -> Optional[OverlayGraph]:
    fill_rule = _as_fill_rule(fill_rule)
    segs = build_segments(subj, clip, preserve_input_collinear)
    segs = split_segments(segs)
    if len(segs) == 0:
        return None
    fills = compute_fills(segs, fill_rule)
    return OverlayGraph(
        segs, fills, clockwise=clockwise,
        preserve_output_collinear=preserve_output_collinear,
        min_output_area=min_output_area)


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
