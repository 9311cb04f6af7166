"""Flat columnar interchange + stats extraction vs the full pipeline.

The flat surfaces (kernel.build_segments_flat, overlay.extract_stats,
overlay.overlay_pack_stats[_flat]) must agree exactly with the
materializing path on counts and areas.
"""

import numpy as np
import pytest

from ioverlay_ray.geometry.kernel import build_segments, build_segments_flat
from ioverlay_ray.geometry.overlay import (overlay_pack, overlay_pack_stats,
                                           overlay_pack_stats_flat)
from ioverlay_ray.stages.geo_arrow import shapes_area2


def _rand_poly(rng, cx, cy):
    r = int(rng.integers(8, 40))
    k = int(rng.integers(3, 8))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    pts = [(int(cx + r * np.cos(a)), int(cy + r * np.sin(a))) for a in ang]
    return pts if len(set(pts)) >= 3 else _rand_poly(rng, cx, cy)


def _flat(contours):
    xs, ys, offs = [], [], [0]
    for c in contours:
        xs.extend(p[0] for p in c)
        ys.extend(p[1] for p in c)
        offs.append(len(xs))
    return (np.asarray(xs, np.int64), np.asarray(ys, np.int64),
            np.asarray(offs, np.int64))


def test_build_segments_flat_matches_lists():
    rng = np.random.default_rng(11)
    subj = [_rand_poly(rng, 50, 50) for _ in range(7)]
    clip = [_rand_poly(rng, 60, 40) for _ in range(5)]
    # include a degenerate contour to exercise the fallback
    subj.append([(0, 0), (10, 0), (20, 0), (20, 20), (0, 20)])
    ref = build_segments(subj, clip)
    xs, ys, offs = _flat(subj + clip)
    flags = np.array([True] * len(subj) + [False] * len(clip))
    got = build_segments_flat(xs, ys, offs, flags)
    # same multiset of segments: compare sorted tuples
    def key(segs):
        return sorted(zip(segs.ax.tolist(), segs.ay.tolist(),
                          segs.bx.tolist(), segs.by.tolist(),
                          segs.subj.tolist(), segs.clip.tolist()))
    assert key(got) == key(ref)


@pytest.mark.parametrize("rule", ["intersect", "union", "difference", "xor"])
def test_pack_stats_matches_pack(rule):
    rng = np.random.default_rng(23)
    jobs = []
    for _ in range(120):
        subj = [_rand_poly(rng, 50, 50)]
        clip = [_rand_poly(rng, int(rng.integers(30, 70)),
                           int(rng.integers(30, 70)))]
        jobs.append((subj, clip))
    packed = overlay_pack(jobs, rule, "nonzero")
    cnt_ref = np.array([len(p) for p in packed])
    a2_ref = np.array([shapes_area2(p) for p in packed])
    cnt, a2 = overlay_pack_stats(jobs, rule, "nonzero")
    assert np.array_equal(cnt, cnt_ref)
    assert np.array_equal(a2, a2_ref)


def test_pack_stats_flat_matches_pack():
    rng = np.random.default_rng(31)
    jobs = []
    for _ in range(80):
        subj = [_rand_poly(rng, 50, 50)]
        clip = [_rand_poly(rng, int(rng.integers(30, 70)),
                           int(rng.integers(30, 70)))]
        jobs.append((subj, clip))
    packed = overlay_pack(jobs, "xor", "nonzero")
    cnt_ref = np.array([len(p) for p in packed])
    a2_ref = np.array([shapes_area2(p) for p in packed])

    xs, ys, offs, job, flags = [], [], [0], [], []
    for k, (subj, clip) in enumerate(jobs):
        for is_s, group in ((True, subj), (False, clip)):
            for c in group:
                xs.extend(p[0] for p in c)
                ys.extend(p[1] for p in c)
                offs.append(len(xs))
                job.append(k)
                flags.append(is_s)
    cnt, a2 = overlay_pack_stats_flat(
        np.asarray(xs, np.int64), np.asarray(ys, np.int64),
        np.asarray(offs, np.int64), np.asarray(job, np.int64),
        np.asarray(flags, bool), "xor", "nonzero")
    assert np.array_equal(cnt, cnt_ref)
    assert np.array_equal(a2, a2_ref)


def test_pack_stats_holes():
    # shape with a hole: area2 must net out the hole (signed shoelace)
    outer = [(0, 0), (100, 0), (100, 100), (0, 100)]
    inner = [(40, 40), (60, 40), (60, 60), (40, 60)]
    jobs = [([outer], [inner])]
    packed = overlay_pack(jobs, "difference", "nonzero")
    a2_ref = shapes_area2(packed[0])
    cnt, a2 = overlay_pack_stats(jobs, "difference", "nonzero")
    assert cnt[0] == len(packed[0])
    assert a2[0] == a2_ref


def test_overlay_stats_stage_matches_overlay_stage(ray_session):
    import ray.data
    from ioverlay_ray.pipelines import flagship
    ds = flagship.images_dataset(96)
    full = flagship.tile_summary(
        flagship.overlay_join(ds, "intersect")).to_pandas() \
        .sort_values("tile_id").reset_index(drop=True)
    stats = flagship.tile_summary(
        flagship.overlay_join_stats(ds, "intersect")).to_pandas() \
        .sort_values("tile_id").reset_index(drop=True)
    assert full.equals(stats)


def test_pure_cycle_plan_matches_sequential_walk():
    # extraction with the vectorized pure-cycle plan must be
    # BIT-IDENTICAL (order, rotation, holes) to the sequential walk
    import ioverlay_ray.geometry.extract as E
    from ioverlay_ray.geometry.overlay import overlay

    rng = np.random.default_rng(77)
    scenes = []
    for s in range(6):
        polys = []
        for _ in range(40):
            cx, cy = rng.integers(0, 2000, 2)
            r = int(rng.integers(4, 300))
            k = int(rng.integers(3, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            pts = [(int(cx + r * np.cos(a)), int(cy + r * np.sin(a)))
                   for a in ang]
            if len(set(pts)) >= 3:
                polys.append(pts)
        scenes.append((polys[:20], polys[20:]))

    cap = E._PURE_CYCLE_CAP
    gate = E._PURE_PLAN_MIN_LINKS
    try:
        E._PURE_PLAN_MIN_LINKS = 8   # force the plan on small scenes
        for subj, clip in scenes:
            for rule in ("union", "xor", "difference", "intersect"):
                E._PURE_CYCLE_CAP = cap
                with_plan = overlay(subj, clip, rule)
                E._PURE_CYCLE_CAP = 0  # plan disabled -> pure walk
                sequential = overlay(subj, clip, rule)
                assert with_plan == sequential, rule
    finally:
        E._PURE_CYCLE_CAP = cap
        E._PURE_PLAN_MIN_LINKS = gate


def test_multi_rule_stats_matches_multi_rule(ray_session):
    from ioverlay_ray.pipelines import flagship
    cols = ["pair_id", "rule", "n_shapes", "area2"]
    ds = flagship.images_dataset(96)
    full = flagship.overlay_join_all_rules(ds).to_pandas()[cols] \
        .sort_values(["pair_id", "rule"]).reset_index(drop=True)
    stats = flagship.overlay_join_all_rules_stats(ds).to_pandas()[cols] \
        .sort_values(["pair_id", "rule"]).reset_index(drop=True)
    assert full.equals(stats)


def test_ogc_pure_cycle_plan_matches_sequential_walk():
    # OGC extraction with the plan fast path must be BIT-IDENTICAL
    # (two-pass order, anchors, hole binding) to the sequential walk
    import ioverlay_ray.geometry.extract as E
    from ioverlay_ray.geometry.overlay import overlay

    rng = np.random.default_rng(177)
    scenes = []
    for s in range(6):
        polys = []
        for _ in range(40):
            cx, cy = rng.integers(0, 2000, 2)
            r = int(rng.integers(4, 300))
            k = int(rng.integers(3, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            pts = [(int(cx + r * np.cos(a)), int(cy + r * np.sin(a)))
                   for a in ang]
            if len(set(pts)) >= 3:
                polys.append(pts)
        scenes.append((polys[:20], polys[20:]))

    cap = E._PURE_CYCLE_CAP
    gate = E._PURE_PLAN_MIN_LINKS
    try:
        E._PURE_PLAN_MIN_LINKS = 8   # force the plan on small scenes
        for subj, clip in scenes:
            for rule in ("union", "xor", "difference", "intersect"):
                E._PURE_CYCLE_CAP = cap
                with_plan = overlay(subj, clip, rule, ogc=True)
                E._PURE_CYCLE_CAP = 0  # plan disabled -> pure walk
                sequential = overlay(subj, clip, rule, ogc=True)
                assert with_plan == sequential, rule
    finally:
        E._PURE_CYCLE_CAP = cap
        E._PURE_PLAN_MIN_LINKS = gate


def test_long_cycle_plan_matches_sequential_walk():
    # cycles LONGER than _PURE_CYCLE_CAP take the pointer-doubling
    # path; output must be BIT-IDENTICAL to the sequential walk,
    # including in-plan simplification of collinear runs and holes
    import ioverlay_ray.geometry.extract as E
    from ioverlay_ray.geometry.overlay import overlay

    rng = np.random.default_rng(4242)

    def big_ring(cx, cy, r, k, ccw=True, collinear_runs=False):
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        pts = []
        for a in ang:
            pts.append((int(cx + r * np.cos(a)), int(cy + r * np.sin(a))))
        pts = list(dict.fromkeys(pts))
        if collinear_runs:
            # inject midpoints of some edges: exact collinear vertices
            out = []
            for i, p in enumerate(pts):
                out.append(p)
                q = pts[(i + 1) % len(pts)]
                if i % 3 == 0 and (p[0] + q[0]) % 2 == 0 \
                        and (p[1] + q[1]) % 2 == 0:
                    out.append(((p[0] + q[0]) // 2, (p[1] + q[1]) // 2))
            pts = out
        if not ccw:
            pts = pts[::-1]
        return pts

    scenes = [
        # single huge contour, no simplification needed
        ([big_ring(0, 0, 500_000, 800)], []),
        # huge contour with collinear midpoints (plan must simplify)
        ([big_ring(0, 0, 400_000, 500, collinear_runs=True)], []),
        # hull + long-cycle hole
        ([big_ring(0, 0, 600_000, 700),
          big_ring(0, 0, 200_000, 400, ccw=False)], []),
        # ADVICE r2: long-cycle HOLE whose ring simplification removes
        # vertices — the plan must leave it to the sequential walk
        # (which repairs the anchor) rather than anchor at points[0]
        # of the simplified ring
        ([big_ring(0, 0, 600_000, 700),
          big_ring(0, 0, 200_000, 400, ccw=False, collinear_runs=True)],
         []),
    ]
    cap = E._PURE_CYCLE_CAP
    gate = E._PURE_PLAN_MIN_LINKS
    try:
        E._PURE_PLAN_MIN_LINKS = 8
        for subj, clip in scenes:
            for rule in ("subject", "union"):
                E._PURE_CYCLE_CAP = 96
                with_plan = overlay(subj, clip, rule)
                E._PURE_CYCLE_CAP = 0   # force the sequential walk
                sequential = overlay(subj, clip, rule)
                assert with_plan == sequential, rule
                assert len(with_plan) >= 1
    finally:
        E._PURE_CYCLE_CAP = cap
        E._PURE_PLAN_MIN_LINKS = gate
