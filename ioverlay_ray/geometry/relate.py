"""Spatial predicates (boolean-only relations) over polygon pairs.

Re-expresses the reference's PredicateOverlay (core/relate.rs:37-172) and
its fill handlers (core/predicate.rs:14-330) as vectorized masks over the
split+fill segment table instead of an early-exit sweep: the semantics
are identical, the execution is numpy over the whole table (the Ray-side
early exit is the bbox prefilter in the join stage).

Definitions (DE-9IM-ish, from the handler docs):
- intersects: share any point (interior overlap, shared edge, or vertex)
- interiors_intersect: both fill the same side of some segment
- touches: boundary contact without interior overlap
- point_intersects: vertex contact only (no shared edges, no interiors)
- within: subject filled => clip filled on the same side, subject nonempty
- covers: within with roles swapped (float/relate.rs:242-330)
- disjoint: not intersects
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .kernel import (BOTH_BOTTOM, BOTH_TOP, CLIP_BOTH, CLIP_BOTTOM, CLIP_TOP,
                     EVEN_ODD, FILL_RULE_NAMES, SUBJ_BOTH, SUBJ_BOTTOM,
                     SUBJ_TOP, build_segments, compute_fills, split_segments)


def _as_fill_rule(fill_rule) -> int:
    if isinstance(fill_rule, str):
        return FILL_RULE_NAMES[fill_rule.lower().replace("_", "")]
    return int(fill_rule)


class Relation:
    """All pairwise predicates computed from one split+fill pass
    (the analog of reusing PredicateOverlay across predicate calls)."""

    __slots__ = ("_interior", "_shared", "_coincide", "_subj_present",
                 "_clip_present", "_within_violation", "_covers_violation")

    def __init__(self, subj_contours: Sequence, clip_contours: Sequence,
                 fill_rule="evenodd"):
        fr = _as_fill_rule(fill_rule)
        segs = split_segments(build_segments(subj_contours, clip_contours))
        fills = compute_fills(segs, fr)
        self._init_from(segs, fills)

    @classmethod
    def _from_slice(cls, segs, fills) -> "Relation":
        r = cls.__new__(cls)
        r._init_from(segs, fills)
        return r

    def _init_from(self, segs, fills):
        has_subj = (fills & SUBJ_BOTH) != 0
        has_clip = (fills & CLIP_BOTH) != 0
        self._subj_present = bool(has_subj.any())
        self._clip_present = bool(has_clip.any())
        self._interior = bool((((fills & BOTH_TOP) == BOTH_TOP) |
                               ((fills & BOTH_BOTTOM) == BOTH_BOTTOM)).any())
        self._shared = bool((has_subj & has_clip).any())

        # endpoint coincidence between boundary-only subj and clip
        # segments (PointCoincidenceChecker, core/predicate.rs:18-101):
        # skip interior segments, empty fills and shared edges
        subj_interior = (fills & SUBJ_BOTH) == SUBJ_BOTH
        clip_interior = (fills & CLIP_BOTH) == CLIP_BOTH
        eligible = (fills != 0) & ~subj_interior & ~clip_interior & \
                   (has_subj != has_clip)
        s_sel = eligible & has_subj
        c_sel = eligible & has_clip
        if s_sel.any() and c_sel.any():
            # pack (x, y) into one int128-ish key via object-free encoding:
            # coordinates are < 2^30, so x * 2^32 + y fits int64 after bias
            def keys(mask):
                xs = np.concatenate([segs.ax[mask], segs.bx[mask]])
                ys = np.concatenate([segs.ay[mask], segs.by[mask]])
                return (xs << 32) ^ (ys & 0xFFFFFFFF)
            self._coincide = bool(
                np.isin(keys(s_sel), keys(c_sel), assume_unique=False).any())
        else:
            self._coincide = False

        st = (fills & SUBJ_TOP) != 0
        sb = (fills & SUBJ_BOTTOM) != 0
        ct = (fills & CLIP_TOP) != 0
        cb = (fills & CLIP_BOTTOM) != 0
        self._within_violation = bool(((st & ~ct) | (sb & ~cb)).any())
        self._covers_violation = bool(((ct & ~st) | (cb & ~sb)).any())

    def intersects(self) -> bool:
        return self._shared or self._interior or self._coincide

    def disjoint(self) -> bool:
        return not self.intersects()

    def interiors_intersect(self) -> bool:
        return self._interior

    def touches(self) -> bool:
        return (not self._interior) and (self._shared or self._coincide)

    def point_intersects(self) -> bool:
        return (not self._interior) and (not self._shared) and self._coincide

    def within(self) -> bool:
        """subject within clip (WithinHandler, core/predicate.rs:278-330)."""
        return self._subj_present and not self._within_violation

    def covers(self) -> bool:
        """subject covers clip = clip within subject."""
        return self._clip_present and not self._covers_violation


def relate(subj_contours, clip_contours, predicate: str,
           fill_rule="evenodd") -> bool:
    """One-shot predicate evaluation by name."""
    r = Relation(subj_contours, clip_contours, fill_rule)
    return getattr(r, predicate)()


def relate_pack(jobs: Sequence[tuple], fill_rule="evenodd") -> list:
    """Evaluate predicates for MANY small (subj, clip) jobs in ONE
    split+fill pass (the packed-kernel batching lever, same x-band
    translation trick as overlay.overlay_pack).

    Each job is shifted into a disjoint power-of-two x-band; every kernel
    stage prunes by x, so bands never interact and the combined segment
    table is sliced back per band for flag computation. Returns one
    ``Relation`` per job (same order)."""
    fr = _as_fill_rule(fill_rule)
    n_jobs = len(jobs)
    if n_jobs == 0:
        return []
    spans, mins = [], []
    for subj, clip in jobs:
        xs = [p[0] for cs in (subj, clip) for c in cs for p in c]
        spans.append((max(xs) - min(xs)) if xs else 0)
        mins.append(min(xs) if xs else 0)
    margin = 4
    stride = 1 << max(1, (max(spans) + 2 * margin)).bit_length()
    if stride * n_jobs >= (1 << 29):
        mid = max(1, n_jobs // 2)
        if mid == n_jobs:
            raise ValueError("single job exceeds the coordinate range")
        return (relate_pack(jobs[:mid], fill_rule) +
                relate_pack(jobs[mid:], fill_rule))

    all_subj, all_clip = [], []
    for k, (subj, clip) in enumerate(jobs):
        dx = k * stride + margin - mins[k]
        all_subj.extend([[(x + dx, y) for x, y in c] for c in subj])
        all_clip.extend([[(x + dx, y) for x, y in c] for c in clip])

    segs = split_segments(build_segments(all_subj, all_clip))
    fills = compute_fills(segs, fr)
    # segments come out sorted by ax -> bands are contiguous runs
    band_of = segs.ax // stride
    # all seven flags are per-band ANY-reductions — one bincount per
    # flag over the whole packed table instead of a Python loop of
    # small-array slices per job
    def band_any(mask: np.ndarray) -> np.ndarray:
        return np.bincount(band_of[mask], minlength=n_jobs) > 0

    has_subj = (fills & SUBJ_BOTH) != 0
    has_clip = (fills & CLIP_BOTH) != 0
    interior_v = (((fills & BOTH_TOP) == BOTH_TOP) |
                  ((fills & BOTH_BOTTOM) == BOTH_BOTTOM))
    st = (fills & SUBJ_TOP) != 0
    sb = (fills & SUBJ_BOTTOM) != 0
    ct = (fills & CLIP_TOP) != 0
    cb = (fills & CLIP_BOTTOM) != 0

    f_subj = band_any(has_subj)
    f_clip = band_any(has_clip)
    f_interior = band_any(interior_v)
    f_shared = band_any(has_subj & has_clip)
    f_within_v = band_any((st & ~ct) | (sb & ~cb))
    f_covers_v = band_any((ct & ~st) | (cb & ~sb))

    subj_interior = (fills & SUBJ_BOTH) == SUBJ_BOTH
    clip_interior = (fills & CLIP_BOTH) == CLIP_BOTH
    eligible = (fills != 0) & ~subj_interior & ~clip_interior & \
               (has_subj != has_clip)
    s_sel = eligible & has_subj
    c_sel = eligible & has_clip
    f_coincide = np.zeros(n_jobs, dtype=bool)
    if s_sel.any() and c_sel.any():
        # band offsets are baked into x, so endpoint keys can only
        # collide within one band: a single global isin suffices
        def keys(mask):
            xs = np.concatenate([segs.ax[mask], segs.bx[mask]])
            ys = np.concatenate([segs.ay[mask], segs.by[mask]])
            return (xs << 32) ^ (ys & 0xFFFFFFFF)
        sk = keys(s_sel)
        matched = np.isin(sk, keys(c_sel))
        if matched.any():
            s_bands = np.concatenate([band_of[s_sel]] * 2)
            f_coincide = np.bincount(s_bands[matched],
                                     minlength=n_jobs) > 0

    out = []
    for k in range(n_jobs):
        r = Relation.__new__(Relation)
        r._subj_present = bool(f_subj[k])
        r._clip_present = bool(f_clip[k])
        r._interior = bool(f_interior[k])
        r._shared = bool(f_shared[k])
        r._coincide = bool(f_coincide[k])
        r._within_violation = bool(f_within_v[k])
        r._covers_violation = bool(f_covers_v[k])
        out.append(r)
    return out


def bbox_may_intersect(a_min, a_max, b_min, b_max) -> bool:
    """Cheap rejection used before the exact predicate (the float layer's
    bounding-rect test, float/relate.rs:242-270)."""
    return not (a_max[0] < b_min[0] or b_max[0] < a_min[0] or
                a_max[1] < b_min[1] or b_max[1] < a_min[1])
