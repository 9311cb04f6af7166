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

    def extract(self, rule, as_arrays: bool = False) -> Shapes:
        """as_arrays: pure-cycle contours come back as int64 (n, 2)
        arrays (tuple lists otherwise) — the float API dequantizes them
        vectorized without the int-tuple round trip."""
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
            min_output_area=self.min_output_area, as_arrays=as_arrays)

    def extract_stats(self, rule):
        """(anchor_x, signed area2, is_hole) arrays — no Python-point
        materialization (see extract.extract_stats)."""
        from .extract import extract_stats
        rule = _as_rule(rule)
        mask = rule_include_mask(self.fills, rule)
        links = build_links(self.segs, self.fills, mask)
        connect_nodes(links)
        return extract_stats(
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


def build_graph_from_segments(segs, fill_rule=NON_ZERO, *,
                              clockwise: bool = False,
                              preserve_output_collinear: bool = False,
                              min_output_area: int = 0,
                              ogc: bool = False) -> Optional[OverlayGraph]:
    """build_graph over a pre-built Segments table (the flat columnar
    interchange path: callers construct segments with
    kernel.build_segments_flat from Arrow offsets+coords)."""
    from .kernel import split_segments as _split, compute_fills as _fills
    fill_rule = _as_fill_rule(fill_rule)
    segs = _split(segs)
    if len(segs) == 0:
        return None
    fills = _fills(segs, fill_rule)
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


def overlay_pack_stats(jobs: Sequence[tuple], rule, fill_rule=NON_ZERO,
                       margin: int = 4, **options):
    """overlay_pack that returns only per-job (polygon_count, area2)
    int64 arrays — the packed STATS surface: no Python geometry is ever
    materialized (counts come from hull contours; area2 = hulls minus
    holes via traversal-signed shoelace)."""
    n_jobs = len(jobs)
    n_polys = np.zeros(n_jobs, dtype=np.int64)
    area2 = np.zeros(n_jobs, dtype=np.int64)
    if n_jobs == 0:
        return n_polys, area2

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
        mid = max(1, n_jobs // 2)
        if mid == n_jobs:
            raise ValueError("single job exceeds the coordinate range")
        c1, a1 = overlay_pack_stats(jobs[:mid], rule, fill_rule, margin,
                                    **options)
        c2, a2_ = overlay_pack_stats(jobs[mid:], rule, fill_rule, margin,
                                     **options)
        return np.concatenate((c1, c2)), np.concatenate((a1, a2_))

    all_subj, all_clip = [], []
    for k, (subj, clip) in enumerate(jobs):
        dx = k * stride + margin - mins[k]
        all_subj.extend([[(x + dx, y) for x, y in c] for c in subj])
        all_clip.extend([[(x + dx, y) for x, y in c] for c in clip])

    graph = build_graph(all_subj, all_clip, fill_rule, **options)
    if graph is None:
        return n_polys, area2
    xs, a2, holes = graph.extract_stats(_as_rule(rule))
    if len(xs):
        job = xs // stride
        np.add.at(n_polys, job[~holes], 1)
        np.add.at(area2, job, a2)
    return n_polys, area2


def overlay_pack_stats_all_flat(xs, ys, offsets, job_of_contour,
                                subj_flags, rules, fill_rule=NON_ZERO,
                                margin: int = 4,
                                n_jobs: int | None = None, **options):
    """overlay_pack_stats_flat for SEVERAL rules: one packed split/fill
    pass, one stats extract per rule (the graph-view pattern). Returns
    {rule_code: (n_polys, area2)}."""
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    job = np.asarray(job_of_contour, dtype=np.int64)
    subj_flags = np.asarray(subj_flags, dtype=bool)
    nc = len(offsets) - 1
    if n_jobs is None:
        n_jobs = int(job.max()) + 1 if nc else 0
    rule_codes = [_as_rule(r) for r in rules]
    out = {code: (np.zeros(n_jobs, dtype=np.int64),
                  np.zeros(n_jobs, dtype=np.int64))
           for code in rule_codes}
    if nc == 0:
        return out
    lens = np.diff(offsets)
    cmin = np.minimum.reduceat(xs, offsets[:-1])
    cmax = np.maximum.reduceat(xs, offsets[:-1])
    big = np.int64(1) << 62
    jmin = np.full(n_jobs, big, dtype=np.int64)
    jmax = np.full(n_jobs, -big, dtype=np.int64)
    np.minimum.at(jmin, job, cmin)
    np.maximum.at(jmax, job, cmax)
    span_max = int((jmax - jmin)[jmax >= jmin].max()) if nc else 0
    stride = 1 << max(1, (span_max + 2 * margin)).bit_length()
    per_pack = max(1, ((1 << 29) // stride) - 1)
    from .kernel import build_segments_flat
    for j0 in range(0, n_jobs, per_pack):
        j1 = min(n_jobs, j0 + per_pack)
        c0 = int(np.searchsorted(job, j0, side="left"))
        c1 = int(np.searchsorted(job, j1, side="left"))
        if c0 == c1:
            continue
        v0 = int(offsets[c0])
        v1 = int(offsets[c1])
        sub_off = offsets[c0:c1 + 1] - v0
        jb = job[c0:c1]
        dx = (jb - j0) * stride + margin - jmin[jb]
        x_t = xs[v0:v1] + np.repeat(dx, lens[c0:c1])
        segs = build_segments_flat(x_t, ys[v0:v1], sub_off,
                                   subj_flags[c0:c1])
        graph = build_graph_from_segments(segs, fill_rule, **options)
        if graph is None:
            continue
        for code in rule_codes:
            sx, a2v, holes = graph.extract_stats(code)
            if len(sx):
                out_job = sx // stride + j0
                n_polys, area2 = out[code]
                np.add.at(n_polys, out_job[~holes], 1)
                np.add.at(area2, out_job, a2v)
    return out


def overlay_pack_stats_flat(xs, ys, offsets, job_of_contour, subj_flags,
                            rule, fill_rule=NON_ZERO, margin: int = 4,
                            n_jobs: int | None = None, **options):
    """``overlay_pack_stats`` over FLAT columnar contours: vertex
    coords + contour offsets + per-contour job id (ascending) and
    subject flag.  No Python geometry anywhere — the end-to-end flat
    interchange path for packed stats fleets."""
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    job = np.asarray(job_of_contour, dtype=np.int64)
    subj_flags = np.asarray(subj_flags, dtype=bool)
    nc = len(offsets) - 1
    if n_jobs is None:
        n_jobs = int(job.max()) + 1 if nc else 0
    n_polys = np.zeros(n_jobs, dtype=np.int64)
    area2 = np.zeros(n_jobs, dtype=np.int64)
    if nc == 0:
        return n_polys, area2
    lens = np.diff(offsets)
    cmin = np.minimum.reduceat(xs, offsets[:-1])
    cmax = np.maximum.reduceat(xs, offsets[:-1])
    big = np.int64(1) << 62
    jmin = np.full(n_jobs, big, dtype=np.int64)
    jmax = np.full(n_jobs, -big, dtype=np.int64)
    np.minimum.at(jmin, job, cmin)
    np.maximum.at(jmax, job, cmax)
    span_max = int((jmax - jmin)[jmax >= jmin].max()) if nc else 0
    stride = 1 << max(1, (span_max + 2 * margin)).bit_length()
    per_pack = max(1, ((1 << 29) // stride) - 1)
    from .kernel import build_segments_flat
    rule_code = _as_rule(rule)
    for j0 in range(0, n_jobs, per_pack):
        j1 = min(n_jobs, j0 + per_pack)
        c0 = int(np.searchsorted(job, j0, side="left"))
        c1 = int(np.searchsorted(job, j1, side="left"))
        if c0 == c1:
            continue
        v0 = int(offsets[c0])
        v1 = int(offsets[c1])
        sub_off = offsets[c0:c1 + 1] - v0
        jb = job[c0:c1]
        dx = (jb - j0) * stride + margin - jmin[jb]
        x_t = xs[v0:v1] + np.repeat(dx, lens[c0:c1])
        segs = build_segments_flat(x_t, ys[v0:v1], sub_off,
                                   subj_flags[c0:c1])
        graph = build_graph_from_segments(segs, fill_rule, **options)
        if graph is None:
            continue
        sx, a2v, holes = graph.extract_stats(rule_code)
        if len(sx):
            out_job = sx // stride + j0
            np.add.at(n_polys, out_job[~holes], 1)
            np.add.at(area2, out_job, a2v)
    return n_polys, area2


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
