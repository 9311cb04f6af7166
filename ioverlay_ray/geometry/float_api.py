"""Float facade over the integer kernel (the reference's float layer).

Mirrors FloatOverlay / FloatPointAdapter semantics (float/overlay.rs:
140-175, float/scale.rs:52-54): one pass over all points finds the
bounding rect, a power-of-two scale maps the longer span into the safe
integer range (|c| < 2^29 so the exact kernel never overflows), then
x_int = round((x - offset) * scale). A caller-fixed scale gives
cross-call consistency (FixedScaleFloatRelate, float/scale.rs:394+) —
the default in distributed pipelines so every tile agrees on the grid:
with a fixed scale the offsets are snapped onto multiples of 1/scale,
so every fixed-scale adapter quantizes onto the SAME global lattice
regardless of its local bounding box.

A caller-fixed scale that would push quantized bounds past the safe
range raises ValueError, mirroring the reference's
FixedScaleOverlayError::ScaleTooLarge (float/scale.rs:14-47).
"""

from __future__ import annotations

import math
from typing import List, Sequence

from . import string_ops
from .overlay import overlay as int_overlay
from .overlay import simplify_shape as int_simplify
from .relate import Relation

SAFE_SPAN = 1 << 29


class FloatPointAdapter:
    """Affine float<->int quantizer with power-of-two scale."""

    def __init__(self, x_min: float, y_min: float, x_max: float,
                 y_max: float, scale: float | None = None):
        self.offset_x = (x_min + x_max) / 2.0
        self.offset_y = (y_min + y_max) / 2.0
        if scale is None:
            span = max(x_max - x_min, y_max - y_min, 1e-9)
            # largest power of two that keeps coordinates within 2^29
            k = math.floor(math.log2(SAFE_SPAN / span))
            scale = float(2 ** k)
        else:
            scale = float(scale)
            if not (scale > 0 and math.isfinite(scale)):
                raise ValueError(f"invalid fixed scale {scale}")
            # fixed scale => shared global lattice: snap the offsets to
            # multiples of 1/scale so two adapters with the same scale
            # but different bounding boxes agree on every grid point
            self.offset_x = round(self.offset_x * scale) / scale
            self.offset_y = round(self.offset_y * scale) / scale
            # ScaleTooLarge check: quantized bounds must stay safe
            half = max(abs(x_max - self.offset_x), abs(x_min - self.offset_x),
                       abs(y_max - self.offset_y), abs(y_min - self.offset_y))
            if half * scale > SAFE_SPAN / 2:
                raise ValueError(
                    f"fixed scale {scale} quantizes span {2 * half} past the "
                    f"safe integer range 2^29 (ScaleTooLarge)")
        self.scale = float(scale)
        self.inv_scale = 1.0 / self.scale

    @classmethod
    def from_contours(cls, *contour_groups, scale: float | None = None
                      ) -> "FloatPointAdapter":
        xs, ys = [], []
        for group in contour_groups:
            for contour in group:
                for p in contour:
                    xs.append(float(p[0]))
                    ys.append(float(p[1]))
        if not xs:
            return cls(0.0, 0.0, 1.0, 1.0, scale)
        return cls(min(xs), min(ys), max(xs), max(ys), scale)

    def to_int_contour(self, contour) -> list:
        return [(int(round((float(p[0]) - self.offset_x) * self.scale)),
                 int(round((float(p[1]) - self.offset_y) * self.scale)))
                for p in contour]

    def to_int(self, contours) -> list:
        return [self.to_int_contour(c) for c in contours]

    def to_float_point(self, p) -> tuple:
        return (p[0] * self.inv_scale + self.offset_x,
                p[1] * self.inv_scale + self.offset_y)

    def to_float_contour(self, contour) -> list:
        import numpy as np
        if len(contour) < 16:
            return [self.to_float_point(p) for p in contour]
        a = np.asarray(contour, dtype=np.float64)
        xs = a[:, 0] * self.inv_scale + self.offset_x
        ys = a[:, 1] * self.inv_scale + self.offset_y
        return list(zip(xs.tolist(), ys.tolist()))

    def to_float_shapes(self, shapes) -> list:
        return [[self.to_float_contour(contour) for contour in shape]
                for shape in shapes]


def _clean_float_contour(pts: list, despike_only: bool) -> list:
    """Float-space output cleaning (float/overlay.rs:359-366; i_shape
    DeSpikeContour / SimplifyContour semantics): dequantization can
    collapse distinct int vertices onto one float point or line, so
    remove duplicates + spikes (cross==0, reversal) and — unless
    collinear output is preserved — collinear midpoints, iterating to
    a fixed point."""
    def degen(p0, p1, p2) -> bool:
        cr = (p1[0] - p0[0]) * (p2[1] - p0[1]) \
            - (p1[1] - p0[1]) * (p2[0] - p0[0])
        if cr != 0.0:
            return False
        if not despike_only:
            return True
        dot = (p1[0] - p0[0]) * (p2[0] - p1[0]) \
            + (p1[1] - p0[1]) * (p2[1] - p1[1])
        return dot < 0.0

    # running-stack removal (a removed vertex re-exposes its neighbors
    # in the same pass), then seam fixups for the closed loop
    changed = True
    while changed and len(pts) >= 3:
        changed = False
        out: list = []
        for p in pts:
            if out and p == out[-1]:
                changed = True
                continue
            out.append(p)
            while len(out) >= 3 and degen(out[-3], out[-2], out[-1]):
                del out[-2]
                changed = True
                if len(out) >= 2 and out[-1] == out[-2]:
                    del out[-1]
        while len(out) >= 3 and degen(out[-2], out[-1], out[0]):
            del out[-1]
            changed = True
        while len(out) >= 3 and degen(out[-1], out[0], out[1]):
            del out[0]
            changed = True
        if len(out) >= 2 and out[0] == out[-1]:
            del out[-1]
            changed = True
        pts = out
    return pts


def _contour_is_clean(contour: list, despike_only: bool) -> bool:
    """Vectorized precheck: True when _clean_float_contour would be a
    no-op (no adjacent duplicates, no degenerate cyclic triples) — the
    common case, so the stack loop is skipped entirely."""
    import numpy as np
    a = np.asarray(contour, dtype=np.float64)
    x = a[:, 0]
    y = a[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    if ((x == xn) & (y == yn)).any():
        return False
    xp = np.roll(x, 1)
    yp = np.roll(y, 1)
    cr = (x - xp) * (yn - yp) - (y - yp) * (xn - xp)
    z = cr == 0.0
    if not z.any():
        return True
    if not despike_only:
        return False
    dot = (x - xp) * (xn - x) + (y - yp) * (yn - y)
    return not (z & (dot < 0.0)).any()


def clean_float_shapes(shapes: List[list], preserve_collinear: bool
                       ) -> List[list]:
    """Apply clean_result to dequantized shapes; drops contours that
    degenerate below 3 points (and shapes whose hull degenerates)."""
    out = []
    for shape in shapes:
        cleaned = []
        for k, contour in enumerate(shape):
            if len(contour) >= 16 and _contour_is_clean(
                    contour, preserve_collinear):
                cleaned.append(list(contour))
                continue
            c = _clean_float_contour(list(contour), preserve_collinear)
            if len(c) >= 3:
                cleaned.append(c)
            elif k == 0:
                cleaned = None
                break
        if cleaned:
            out.append(cleaned)
    return out


def _contours_as_arrays(groups) -> list | None:
    """Each group as a list of float64 (n,2) arrays, or None when a
    contour isn't plain coordinate pairs (custom point classes fall
    back to the per-point path)."""
    import numpy as np
    out = []
    try:
        for group in groups:
            arrs = []
            for contour in group:
                a = np.asarray(contour, dtype=np.float64)
                if a.ndim != 2 or a.shape[1] != 2:
                    return None
                arrs.append(a)
            out.append(arrs)
    except (TypeError, ValueError):
        return None
    return out


def float_overlay(subj: Sequence, clip: Sequence, rule,
                  fill_rule="evenodd", scale: float | None = None,
                  clean_result: bool = True,
                  out_arrays: bool = False, **options) -> List[list]:
    """Boolean overlay on float contours (SingleFloatOverlay::overlay).

    ``clean_result`` mirrors OverlayOptions::clean_result (default true
    for the f64 -> int64 engine, float/overlay.rs:454): the dequantized
    output is de-spiked (or fully simplified when collinear output is
    not preserved).

    Plain coordinate-pair contours take a fully vectorized path:
    numpy bounds + quantization straight into the flat segment builder
    (build_segments_flat), no per-point Python."""
    import numpy as np
    groups = _contours_as_arrays((subj, clip))
    if groups is not None:
        sa, ca = groups
        allc = sa + ca
        if not allc or not any(len(a) for a in allc):
            adapter = FloatPointAdapter(0.0, 0.0, 1.0, 1.0, scale)
            shapes: List[list] = []
        else:
            x_min = min(float(a[:, 0].min()) for a in allc if len(a))
            x_max = max(float(a[:, 0].max()) for a in allc if len(a))
            y_min = min(float(a[:, 1].min()) for a in allc if len(a))
            y_max = max(float(a[:, 1].max()) for a in allc if len(a))
            adapter = FloatPointAdapter(x_min, y_min, x_max, y_max, scale)
            lens = np.array([len(a) for a in allc], dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(lens)))
            pts = np.concatenate(allc, axis=0) if allc else \
                np.zeros((0, 2))
            xs = np.rint((pts[:, 0] - adapter.offset_x)
                         * adapter.scale).astype(np.int64)
            ys = np.rint((pts[:, 1] - adapter.offset_y)
                         * adapter.scale).astype(np.int64)
            flags = np.concatenate((np.ones(len(sa), dtype=bool),
                                    np.zeros(len(ca), dtype=bool)))
            from .kernel import build_segments_flat
            from .overlay import build_graph_from_segments
            opts = dict(options)
            keep_in = opts.pop("preserve_input_collinear", False)
            segs = build_segments_flat(xs, ys, offsets, flags, keep_in)
            graph = build_graph_from_segments(segs, fill_rule, **opts)
            # pure-cycle contours come back as int64 arrays: dequantize
            # + clean-precheck run vectorized, float tuples materialize
            # exactly once (no int-tuple round trip)
            shapes = [] if graph is None else \
                graph.extract(rule, as_arrays=True)
        return _dequantize_clean(
            adapter, shapes, clean_result,
            options.get("preserve_output_collinear", False),
            as_arrays=out_arrays)
    adapter = FloatPointAdapter.from_contours(subj, clip, scale=scale)
    shapes = int_overlay(adapter.to_int(subj), adapter.to_int(clip),
                         rule, fill_rule, **options)
    shapes = adapter.to_float_shapes(shapes)
    if clean_result:
        shapes = clean_float_shapes(
            shapes, options.get("preserve_output_collinear", False))
    if out_arrays:
        import numpy as np
        shapes = [[np.asarray(c, dtype=np.float64).reshape(-1, 2)
                   for c in shape] for shape in shapes]
    return shapes


def _dequantize_clean(adapter: FloatPointAdapter, shapes: List[list],
                      clean: bool, preserve_collinear: bool,
                      as_arrays: bool = False) -> List[list]:
    """to_float_shapes + clean_float_shapes fused for mixed array/tuple
    contours: identical float math and drop semantics, but array
    contours dequantize vectorized and materialize tuples once.

    ``as_arrays`` returns each contour as a float64 (n, 2) array
    instead of a list of tuples — same values, no per-point Python
    objects (the reference's Vec<P> output is equally columnar)."""
    import numpy as np
    out = []
    for shape in shapes:
        cleaned: list | None = []
        for k, contour in enumerate(shape):
            a = np.asarray(contour, dtype=np.float64)
            if a.ndim != 2:             # empty contour edge case
                a = a.reshape(0, 2)
            xs = a[:, 0] * adapter.inv_scale + adapter.offset_x
            ys = a[:, 1] * adapter.inv_scale + adapter.offset_y
            if clean and len(xs) >= 16:
                fa = np.column_stack((xs, ys))
                if _contour_is_clean(fa, preserve_collinear):
                    cleaned.append(fa if as_arrays else
                                   list(zip(xs.tolist(), ys.tolist())))
                    continue
            pts = list(zip(xs.tolist(), ys.tolist()))
            if not clean:
                cleaned.append(np.column_stack((xs, ys)) if as_arrays
                               else pts)
                continue
            c = _clean_float_contour(pts, preserve_collinear)
            if len(c) >= 3:
                cleaned.append(np.asarray(c, dtype=np.float64)
                               if as_arrays else c)
            elif k == 0:
                cleaned = None
                break
        if cleaned is not None and (cleaned or not clean):
            out.append(cleaned)
    return out


def float_simplify(contours: Sequence, fill_rule="nonzero",
                   scale: float | None = None, **options) -> List[list]:
    """Float SimplifyShape (float/simplify.rs)."""
    adapter = FloatPointAdapter.from_contours(contours, scale=scale)
    shapes = int_simplify(adapter.to_int(contours), fill_rule, **options)
    return adapter.to_float_shapes(shapes)


def float_clip_paths(shape_contours: Sequence, paths: Sequence,
                     fill_rule="evenodd", invert: bool = False,
                     boundary_included: bool = False,
                     scale: float | None = None) -> List[list]:
    """FloatClip (float/clip.rs): quantize -> int clip -> dequantize."""
    adapter = FloatPointAdapter.from_contours(shape_contours, paths,
                                              scale=scale)
    out = string_ops.clip_paths(adapter.to_int(shape_contours),
                                adapter.to_int(paths), fill_rule,
                                invert, boundary_included)
    return [[adapter.to_float_point(p) for p in path] for path in out]


def float_slice_by_paths(shape_contours: Sequence, paths: Sequence,
                         fill_rule="evenodd",
                         scale: float | None = None) -> List[list]:
    """FloatSlice (float/slice.rs)."""
    adapter = FloatPointAdapter.from_contours(shape_contours, paths,
                                              scale=scale)
    shapes = string_ops.slice_by_paths(adapter.to_int(shape_contours),
                                       adapter.to_int(paths), fill_rule)
    return adapter.to_float_shapes(shapes)


def float_relate(subj: Sequence, clip: Sequence, predicate: str,
                 fill_rule="evenodd", scale: float | None = None) -> bool:
    """FloatRelate / FixedScaleFloatRelate: predicates after (fixed or
    auto) quantization."""
    adapter = FloatPointAdapter.from_contours(subj, clip, scale=scale)
    r = Relation(adapter.to_int(subj), adapter.to_int(clip), fill_rule)
    return getattr(r, predicate)()
