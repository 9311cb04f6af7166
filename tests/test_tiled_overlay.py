"""Tile-distributed overlay: BIT-PARITY with the single kernel.

Round-2 architecture (geometry/tiled.py): the binned split must produce
the IDENTICAL segment set as kernel.split_segments, strip fills must be
bit-equal to compute_fills, and assembled results must match the single
kernel's area, shape count and hole count on ALL cases — including
random arbitrary-slope scenes, vertical edges on strip borders and the
4-valent XOR pinch nodes.
"""

import numpy as np
import pytest

from ioverlay_ray.geometry.kernel import (build_segments, compute_fills,
                                          split_segments)
from ioverlay_ray.geometry.overlay import overlay
from ioverlay_ray.geometry.tiled import (binned_split, strip_fills,
                                         tiled_overlay)
from ioverlay_ray.stages.geo_arrow import shapes_area2

RULES = ("union", "intersect", "difference", "xor", "subject", "clip")


def rect(x0, y0, w, h):
    return [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]


def diamond(cx, cy, r):
    return [(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r)]


def canon(segs):
    return sorted(zip(segs.ax.tolist(), segs.ay.tolist(),
                      segs.bx.tolist(), segs.by.tolist(),
                      segs.subj.tolist(), segs.clip.tolist()))


def _canon_ring(pts):
    """Rotation-canonical, collinear-simplified ring (strip borders add
    collinear vertices the single kernel never sees)."""
    pts = list(pts)
    changed = True
    while changed and len(pts) >= 3:
        changed = False
        out = []
        n = len(pts)
        for i in range(n):
            p0, p1, p2 = pts[i - 1], pts[i], pts[(i + 1) % n]
            cr = (p1[0] - p0[0]) * (p2[1] - p0[1]) \
                - (p1[1] - p0[1]) * (p2[0] - p0[0])
            if cr == 0:
                changed = True
                continue
            out.append(p1)
        pts = out
    if not pts:
        return ()
    k = min(range(len(pts)), key=lambda i: pts[i])
    return tuple(pts[k:] + pts[:k])


def _ring_multiset(shapes):
    return sorted(_canon_ring([tuple(p) for p in c])
                  for sh in shapes for c in sh)


def assert_bit_parity(subj, clip, strip_w=256, fill_rules=(0, 1)):
    """Split set + fills bit-equal; assembled RING SETS equal to the
    single kernel (rotation-canonical, collinear-simplified)."""
    ref = split_segments(build_segments(subj, clip))
    got = binned_split(build_segments(subj, clip), strip_w)
    assert canon(ref) == canon(got)
    o_ref = np.lexsort((ref.by, ref.bx, ref.ay, ref.ax))
    o_got = np.lexsort((got.by, got.bx, got.ay, got.ax))
    for fr in fill_rules:
        f_ref = compute_fills(ref, fr)
        f_got = strip_fills(got, fr, strip_w)
        assert np.array_equal(f_ref[o_ref], f_got[o_got])
    for rule in RULES:
        s1 = overlay(subj, clip, rule, "nonzero")
        s2 = tiled_overlay(subj, clip, rule, "nonzero", strip_w)
        assert shapes_area2(s1) == shapes_area2(s2), rule
        assert len(s1) == len(s2), rule
        assert sum(len(s) - 1 for s in s1) == sum(len(s) - 1 for s in s2), rule
        assert _ring_multiset(s1) == _ring_multiset(s2), rule


def test_rect_cases():
    subj = [rect(10, 10, 500, 300), rect(400, 200, 300, 300)]
    clip = [rect(200, 50, 400, 400)]
    assert_bit_parity(subj, clip)


def test_cross_border_diamonds():
    subj = [diamond(250, 300, 150)]   # straddles the x=256 border
    clip = [diamond(400, 300, 200)]
    assert_bit_parity(subj, clip)


def test_arbitrary_slope_across_borders():
    # slopes that round at borders — the round-1 floor-cut failure mode
    subj = [[(10, 17), (700, 160), (650, 500), (30, 420)]]
    clip = [[(200, 50), (900, 333), (800, 610), (100, 444)]]
    assert_bit_parity(subj, clip, strip_w=128)


def test_vertical_on_border():
    # vertical edges exactly on x=256 (the on_border_split case): a
    # left-side edge ENDS at the border strictly inside the vertical
    subj = [rect(100, 100, 156, 300)]      # right edge at x=256
    clip = [[(50, 250), (256, 290), (400, 600), (60, 500)]]
    assert_bit_parity(subj, clip)
    # vertical fully on the border crossed by a slanted edge
    subj2 = [rect(256, 0, 200, 500)]
    clip2 = [[(100, 100), (500, 450), (120, 480)]]
    assert_bit_parity(subj2, clip2)


def test_hole_across_border():
    outer = [rect(100, 100, 600, 400)]
    inner = [rect(200, 200, 300, 200)]  # hole spans x=256 border
    s = tiled_overlay(outer, inner, "difference", "nonzero")
    assert len(s) == 1 and len(s[0]) == 2
    assert_bit_parity(outer, inner)


def test_xor_pinch_nodes():
    # corner-touching squares: 4-valent pinch node at (100, 100)
    subj = [rect(0, 0, 100, 100)]
    clip = [rect(100, 100, 100, 100)]
    assert_bit_parity(subj, clip, strip_w=64)


@pytest.mark.parametrize("trial", range(15))
def test_randomized_bit_parity(trial):
    rng = np.random.default_rng(1000 + trial)
    subj, clip = [], []
    for _ in range(int(rng.integers(3, 16))):
        x0, y0 = rng.integers(0, 1500, 2)
        w, h = rng.integers(5, 400, 2)
        subj.append(rect(int(x0), int(y0), int(w), int(h)))
    for _ in range(int(rng.integers(3, 16))):
        cx, cy = rng.integers(100, 1500, 2)
        r = int(rng.integers(5, 300))
        pts = [(int(cx - r), int(cy + rng.integers(-r, r))),
               (int(cx + rng.integers(-r // 2, r // 2 + 1)), int(cy - r)),
               (int(cx + r), int(cy + rng.integers(-r, r))),
               (int(cx + rng.integers(-r // 2, r // 2 + 1)), int(cy + r))]
        clip.append(pts)
    assert_bit_parity(subj, clip, strip_w=int(rng.choice([64, 128, 256])))


def test_ray_pipeline_parity(ray_session):
    from ioverlay_ray.pipelines.tiled_overlay import tiled_overlay_ray
    rng = np.random.default_rng(77)
    subj, clip = [], []
    for _ in range(12):
        x0, y0 = rng.integers(0, 1200, 2)
        w, h = rng.integers(5, 350, 2)
        subj.append(rect(int(x0), int(y0), int(w), int(h)))
        cx, cy = rng.integers(100, 1200, 2)
        r = int(rng.integers(5, 250))
        clip.append(diamond(int(cx), int(cy), r))
    for rule in ("union", "intersect", "difference", "xor"):
        s1 = overlay(subj, clip, rule, "nonzero")
        s2 = tiled_overlay_ray(subj, clip, rule, "nonzero", 256)
        assert shapes_area2(s1) == shapes_area2(s2)
        assert len(s1) == len(s2)
        assert sum(len(s) - 1 for s in s1) == sum(len(s) - 1 for s in s2)


def test_dataset_native_entry_bit_exact(ray_session):
    # r2 VERDICT missing #2 / next-round #3: a scene generated DIRECTLY
    # as a segments Dataset (index math inside map_batches, never
    # driver-resident) must run the tiled pipeline end-to-end and
    # produce bit-identical rings to the driver-list front door.
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ioverlay_ray.geometry.kernel import build_segments
    from ioverlay_ray.pipelines.tiled_overlay import (
        _seg_table, rings_area2, tiled_rings_ds,
        tiled_rings_from_segments_ds)

    def rect_of(i: int, clip: bool):
        # deterministic index-math geometry (mixed sizes, overlapping)
        x0 = (i * 37) % 400 + (13 if clip else 0)
        y0 = (i * 61) % 400 + (7 if clip else 0)
        w = 20 + (i * 11) % 90
        h = 15 + (i * 17) % 70
        return [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]

    n_rects = 48

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        subj = [rect_of(i, False) for i in ids]
        clip = [rect_of(i, True) for i in ids]
        return _seg_table(build_segments(subj, clip))

    ids = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(n_rects, dtype=np.int64))})
    ).repartition(4)
    segs_ds = ids.map_batches(gen, batch_format="pyarrow", batch_size=8)

    native = tiled_rings_from_segments_ds(segs_ds, "xor", "evenodd",
                                          strip_w=64)
    df_n = native.to_pandas()

    subj = [rect_of(i, False) for i in range(n_rects)]
    clip = [rect_of(i, True) for i in range(n_rects)]
    legacy = tiled_rings_ds(subj, clip, "xor", "evenodd", strip_w=64)
    df_l = legacy.to_pandas()

    rings_n = sorted(tuple(p) for p in df_n["pts"])
    rings_l = sorted(tuple(p) for p in df_l["pts"])
    assert rings_n == rings_l
    assert len(rings_n) > 0


def test_distributed_mark_join_matches_driver_broadcast(ray_session):
    # force the hash-partitioned marks<->segments join (cap=0) and
    # require bit-identical rings vs the driver-broadcast path
    import numpy as np

    import ioverlay_ray.pipelines.tiled_overlay as T
    from ioverlay_ray.pipelines.tiled_overlay import tiled_rings_ds

    rng = np.random.default_rng(5150)
    subj, clip = [], []
    for out in (subj, clip):
        for _ in range(25):
            x0, y0 = (int(v) for v in rng.integers(0, 300, 2))
            pts = [(x0, y0), (x0 + int(rng.integers(10, 80)), y0 + 3),
                   (x0 + 40, y0 + int(rng.integers(20, 90)))]
            out.append(pts)
    cap = T.DRIVER_MARKS_CAP
    try:
        rings_b = tiled_rings_ds(subj, clip, "union", "nonzero",
                                 strip_w=64).to_pandas()
        T.DRIVER_MARKS_CAP = 0       # every round takes the join path
        rings_j = tiled_rings_ds(subj, clip, "union", "nonzero",
                                 strip_w=64).to_pandas()
    finally:
        T.DRIVER_MARKS_CAP = cap
    assert sorted(tuple(p) for p in rings_b["pts"]) \
        == sorted(tuple(p) for p in rings_j["pts"])


def test_strip_walk_arrays_matches_strip_walk():
    # the vectorized pure-cycle walker must be BIT-IDENTICAL to the
    # Python walker (ring starts, ring order, chain set) on random
    # oriented-edge soups incl. multi-out pinch nodes
    import numpy as np

    from ioverlay_ray.geometry.tiled import strip_walk, strip_walk_arrays

    rng = np.random.default_rng(808)
    for trial in range(30):
        # random small rectilinear loops + pinch crossings
        edges = []
        for _ in range(rng.integers(3, 40)):
            x0, y0 = (int(v) for v in rng.integers(0, 120, 2))
            w = int(rng.integers(1, 20))
            h = int(rng.integers(1, 20))
            quad = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                    (x0, y0 + h)]
            for i in range(4):
                edges.append((quad[i], quad[(i + 1) % 4]))
        rng.shuffle(edges)
        tx = np.array([e[0][0] for e in edges], np.int64)
        ty = np.array([e[0][1] for e in edges], np.int64)
        hx = np.array([e[1][0] for e in edges], np.int64)
        hy = np.array([e[1][1] for e in edges], np.int64)
        strip, strip_w = 0, 1 << 20     # everything in one strip
        r1, c1 = strip_walk(list(edges), strip, strip_w)
        r2, c2 = strip_walk_arrays(tx, ty, hx, hy, strip, strip_w)
        assert r1 == r2, trial
        assert c1 == c2, trial


def test_block_stitch_matches_single_task(ray_session):
    # force the block-round stitch (cap=0) and require bit-identical
    # rings vs the single-final-task path
    import numpy as np

    import ioverlay_ray.pipelines.tiled_overlay as T
    from ioverlay_ray.pipelines.tiled_overlay import tiled_rings_ds

    rng = np.random.default_rng(31337)
    subj = []
    for _ in range(30):   # wide rects crossing many strips -> chains
        x0, y0 = (int(v) for v in rng.integers(0, 200, 2))
        subj.append([(x0, y0), (x0 + int(rng.integers(100, 400)), y0),
                     (x0 + 250, y0 + int(rng.integers(10, 60)))])
    cap = T.SINGLE_STITCH_CAP
    try:
        single = tiled_rings_ds(subj, [], "subject", "nonzero",
                                strip_w=32).to_pandas()
        T.SINGLE_STITCH_CAP = 0
        block = tiled_rings_ds(subj, [], "subject", "nonzero",
                               strip_w=32).to_pandas()
    finally:
        T.SINGLE_STITCH_CAP = cap

    def canon(flat):
        # stitched rings may start at different chain heads depending
        # on join grouping; canonicalize rotation (same orientation)
        pts = list(zip(flat[0::2], flat[1::2]))
        k = min(range(len(pts)), key=lambda i: pts[i])
        return tuple(pts[k:] + pts[:k])

    assert sorted(canon(p) for p in single["pts"]) \
        == sorted(canon(p) for p in block["pts"])
    assert len(single) > 0


def test_tiled_spiral_area_matches_kernel(ray_session):
    # the named single-component worst case (Spiral) through the FULL
    # tiled pipeline: net area must equal the single kernel's on the
    # same lattice (arbitrary slopes, one giant pure cycle, chains
    # spanning every strip)
    from ioverlay_ray.pipelines.perf_workloads import spiral as spiral_pts
    from ioverlay_ray.geometry.float_api import FloatPointAdapter
    from ioverlay_ray.pipelines.tiled_overlay import (rings_area2,
                                                      tiled_rings_ds)
    from ioverlay_ray.stages.geo_arrow import shapes_area2

    path = spiral_pts(2048)
    xs = np.array([p[0] for p in path])
    ys = np.array([p[1] for p in path])
    ad = FloatPointAdapter(float(xs.min()), float(ys.min()),
                           float(xs.max()), float(ys.max()))
    qx = np.rint((xs - ad.offset_x) * ad.scale).astype(np.int64)
    qy = np.rint((ys - ad.offset_y) * ad.scale).astype(np.int64)
    ipath = list(zip(qx.tolist(), qy.tolist()))
    shapes = overlay([ipath], [], "subject", "nonzero")
    rings = tiled_rings_ds([ipath], [], "subject", "nonzero")
    assert rings_area2(rings) == shapes_area2(shapes)


def test_strip_walk_flat_matches_arrays():
    # the flat-buffer form must reproduce strip_walk_arrays exactly
    # (same rings in the same order, same chains), including narrow
    # strips that leave open chains
    import numpy as np

    from ioverlay_ray.geometry.tiled import strip_walk_arrays, strip_walk_flat

    rng = np.random.default_rng(909)
    for trial in range(20):
        edges = []
        for _ in range(rng.integers(3, 30)):
            x0, y0 = (int(v) for v in rng.integers(0, 120, 2))
            w = int(rng.integers(1, 20))
            h = int(rng.integers(1, 20))
            quad = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                    (x0, y0 + h)]
            for i in range(4):
                edges.append((quad[i], quad[(i + 1) % 4]))
        rng.shuffle(edges)
        tx = np.array([e[0][0] for e in edges], np.int64)
        ty = np.array([e[0][1] for e in edges], np.int64)
        hx = np.array([e[1][0] for e in edges], np.int64)
        hy = np.array([e[1][1] for e in edges], np.int64)
        # one wide strip AND a narrow strip (chains at the borders)
        for strip, strip_w in ((0, 1 << 20), (1, 64)):
            rings, chains = strip_walk_arrays(tx, ty, hx, hy, strip,
                                              strip_w)
            offs, vals, chains2 = strip_walk_flat(tx, ty, hx, hy,
                                                  strip, strip_w)
            assert chains == chains2, trial
            assert len(offs) - 1 == len(rings), trial
            for i, ring in enumerate(rings):
                flat = vals[offs[i]:offs[i + 1]]
                got = list(zip(flat[0::2].tolist(), flat[1::2].tolist()))
                assert got == ring, (trial, i)


def test_distributed_hole_resolve_matches_driver(ray_session):
    # r3 VERDICT next-round #7: force the distributed hole->parent
    # transitive resolve (cap=0: stages/cc.py closure + groupby joins)
    # and require identical (shape_id, role, ring) triples vs the
    # driver-dict path on a hole-dense scene (grid of holes, some
    # nested hole-in-island-in-hole chains).
    import ioverlay_ray.pipelines.tiled_overlay as T
    from ioverlay_ray.pipelines.tiled_overlay import tiled_overlay_ds

    # subject: one big plate; clip: a grid of punches (-> many holes)
    # plus nested rings (island inside a punch, punch inside that
    # island -> hole->hole transitive chains)
    subj = [rect(0, 0, 900, 900)]
    clip = []
    for gy in range(6):
        for gx in range(6):
            clip.append(rect(40 + gx * 140, 40 + gy * 140, 60, 60))
    # nested chain: punch 300x300 at (500,500)... use rings inside the
    # first grid punch region is too small; add a separate tower
    subj.append(rect(1000, 0, 400, 400))
    clip.append(rect(1050, 50, 300, 300))
    subj.append(rect(1100, 100, 200, 200))
    clip.append(rect(1150, 150, 100, 100))

    def canon(df):
        return sorted((int(s), int(r), tuple(p))
                      for s, r, p in zip(df["shape_id"], df["role"],
                                         df["pts"]))

    cap = T.DRIVER_HOLES_CAP
    try:
        a = tiled_overlay_ds(subj, clip, "difference", "nonzero",
                             strip_w=128).to_pandas()
        T.DRIVER_HOLES_CAP = 0       # force the distributed resolve
        b = tiled_overlay_ds(subj, clip, "difference", "nonzero",
                             strip_w=128).to_pandas()
    finally:
        T.DRIVER_HOLES_CAP = cap
    assert (a["role"] == 1).sum() >= 37          # hole-dense indeed
    assert canon(a) == canon(b)


def test_resolve_parents_ds_chains(ray_session):
    # unit gate for the distributed transitive resolve: 3000 holes in
    # 300 chains of depth 10 rooted at hulls, plus unbound holes; the
    # BSP closure must reproduce the driver-dict reference exactly with
    # no driver table proportional to hole count.
    import pyarrow as pa
    import ray.data

    from ioverlay_ray.pipelines.tiled_overlay import _resolve_parents_ds

    rng = np.random.default_rng(99)
    hole_ids, uih, uid = [], [], []
    expect = {}
    hid = 10_000
    for c in range(300):
        hull = 1_000_000 + c
        chain = []
        for d in range(10):
            chain.append(hid)
            hid += 1
        # bottom of chain points at the hull; others at the next hole
        for i, h in enumerate(chain):
            hole_ids.append(h)
            if i == len(chain) - 1:
                uih.append(0)
                uid.append(hull)
            else:
                uih.append(1)
                uid.append(chain[i + 1])
            expect[h] = hull
    for _ in range(50):                       # unbound -> parent 0
        hole_ids.append(hid)
        uih.append(-1)
        uid.append(0)
        expect[hid] = 0
        hid += 1

    perm = rng.permutation(len(hole_ids))
    tags = ray.data.from_arrow(pa.table({
        "hole_id": pa.array(np.asarray(hole_ids)[perm], pa.int64()),
        "under_is_hole": pa.array(np.asarray(uih)[perm], pa.int64()),
        "under_id": pa.array(np.asarray(uid)[perm], pa.int64()),
    })).repartition(8)
    out = _resolve_parents_ds(tags).to_pandas()
    got = dict(zip(out["hole_id"].astype(int), out["parent_id"].astype(int)))
    # hulls may also appear (labelled nodes); holes must all be right
    assert all(got[h] == p for h, p in expect.items())


def _case_points(case):
    return [[tuple(p) for p in path] for path in case["subj"]], \
        [[tuple(p) for p in path] for path in case["clip_paths"]]


def _case_size(case):
    return sum(len(p) for p in case["subj"]) + \
        sum(len(p) for p in case["clip_paths"])


def test_fixture_corpus_tiled_ring_parity():
    """Reference fixture corpus through the TILED path: full ring-set
    parity with the single kernel on a deterministic 40-case sample
    (small cases for runtime; the full 162x4 sweep was verified clean
    once — NOTES.md round-5 lead #1). Guards the pinch-junction ring
    decomposition on the reference's own degenerate geometry."""
    from ioverlay_ray.sources.fixtures import (boolean_case_count,
                                               load_boolean_case)

    n = boolean_case_count()
    cases = sorted(range(n), key=lambda i: _case_size(load_boolean_case(i)))
    for i in cases[:40]:
        case = load_boolean_case(i)
        subj, clip = _case_points(case)
        fr = case["fill_rule"]
        for rule in ("union", "intersect", "difference", "xor"):
            s1 = overlay(subj, clip, rule, fr)
            # auto strip width: wide-coordinate fixture cases (e.g.
            # 135 spans +-3.7e8) must not explode bin replication
            s2 = tiled_overlay(subj, clip, rule, fr, strip_w=None)
            assert _ring_multiset(s1) == _ring_multiset(s2), (i, rule)


def test_arbitrary_soup_invariants():
    """Random SELF-INTERSECTING scenes (the regime the rect/diamond
    gates never generated): the tiled path preserves split set, fills,
    boundary edge multiset, area — and, since correct_junction_rings
    (kernel-faithful re-extraction of pooled junction components),
    the FULL RING MULTISET matches the single kernel too (was 55/120
    scenes divergent before the fix; NOTES.md round-5 lead #1)."""
    from ioverlay_ray.geometry.kernel import (build_segments,
                                              compute_fills,
                                              split_segments)
    from ioverlay_ray.geometry.tiled import (binned_split, oriented_edges,
                                             strip_fills)

    rng = np.random.default_rng(20260819)
    for trial in range(12):
        subj, clip = [], []
        for _ in range(int(rng.integers(3, 10))):
            x0, y0 = rng.integers(0, 1500, 2)
            w, h = rng.integers(3, 400, 2)
            subj.append(rect(int(x0), int(y0), int(w), int(h)))
        for _ in range(int(rng.integers(2, 10))):
            k = int(rng.integers(3, 9))
            pts = rng.integers(0, 1500, size=(k, 2))
            clip.append([(int(x), int(y)) for x, y in pts])
        sw = int(rng.choice([64, 128, 256]))

        ref = split_segments(build_segments(subj, clip))
        got = binned_split(build_segments(subj, clip), sw)
        assert canon(ref) == canon(got)
        o_ref = np.lexsort((ref.by, ref.bx, ref.ay, ref.ax))
        o_got = np.lexsort((got.by, got.bx, got.ay, got.ax))
        for fr in (0, 1):
            f_ref = compute_fills(ref, fr)
            f_got = strip_fills(got, fr, sw)
            assert np.array_equal(f_ref[o_ref], f_got[o_got])
            for rule_name, rule_id in (("union", 3), ("xor", 6)):
                e_ref = oriented_edges(ref, f_ref, rule_id)
                e_got = oriented_edges(got, f_got, rule_id)
                ref_set = sorted(zip(*(a.tolist() for a in e_ref)))
                got_set = sorted(zip(*(a.tolist() for a in e_got)))
                assert ref_set == got_set, (trial, rule_name, fr)
        for rule in RULES:
            s1 = overlay(subj, clip, rule, "nonzero")
            s2 = tiled_overlay(subj, clip, rule, "nonzero", sw)
            assert shapes_area2(s1) == shapes_area2(s2), rule
            assert _ring_multiset(s1) == _ring_multiset(s2), rule


# These EXECUTED fixture cases (self-intersecting contours /
# shared-vertex inner fans) are exactly where the strip walk's fixed
# face rule used to diverge from the kernel's per-ring NearestVector
# rotation; correct_junction_rings (kernel-faithful re-extraction of
# pooled junction components) closes them. Kept as named regression
# cases. History + distributed-path design: NOTES.md round-5 lead #1.
TILED_DIVERGENT_FIXTURES = (138, 139, 141, 142)


def _canon_ring(c):
    from ioverlay_ray.geometry.extract import simplify_contour
    pts = [tuple(p) for p in simplify_contour(list(c))[0]]
    best = None
    for seq in (pts, list(reversed(pts))):
        n = len(seq)
        for r in range(n):
            rot = tuple(seq[r:] + seq[:r])
            if best is None or rot < best:
                best = rot
    return best


def _canon_shapes(shapes):
    """Order/orientation/rotation/collinear-insensitive canonical form
    of a shape list: multiset of (hull, sorted holes) ring tuples."""
    out = []
    for s in shapes:
        rings = [_canon_ring(c) for c in s]
        out.append((rings[0], tuple(sorted(rings[1:]))))
    return sorted(out)


def _golden_one_of(shapes, golden_variants):
    got = _canon_shapes(shapes)
    return any(got == _canon_shapes(v) for v in golden_variants)


@pytest.mark.parametrize("index", TILED_DIVERGENT_FIXTURES)
def test_tiled_divergent_fixture_golden(index):
    from ioverlay_ray.sources import fixtures

    case = fixtures.load_boolean_case(index)
    subj, clip = _case_points(case)
    fr = case["fill_rule"]
    for key in ("union", "difference", "xor"):
        if key not in case:
            continue
        s2 = tiled_overlay(subj, clip, key, fr, strip_w=None)
        assert _golden_one_of(s2, case[key]), (index, key)


def test_tiled_fixture_golden_conformance_sample():
    """Golden conformance of the TILED path on executed fixture cases
    OUTSIDE the known-divergent set: output (either orientation) must
    be an accepted golden variant. Samples every 6th executed case for
    runtime."""
    from ioverlay_ray.sources import fixtures

    executed = list(range(144)) + [150, 151, 152]

    for index in executed[::6]:
        case = fixtures.load_boolean_case(index)
        subj, clip = _case_points(case)
        fr = case["fill_rule"]
        for key in ("union", "intersect", "difference", "xor"):
            if key not in case:
                continue
            s2 = tiled_overlay(subj, clip, key, fr, strip_w=None)
            assert _golden_one_of(s2, case[key]), (index, key)


def test_distributed_pinch_correction(ray_session):
    """The DISTRIBUTED pipeline's pinch correction: previously-divergent
    fixture scenes (shared-vertex fans, self-intersecting contours) run
    through tiled_rings_ds and must reproduce the single kernel's FULL
    ring multiset; a junction-free scene exercises the fast path."""
    from ioverlay_ray.pipelines.tiled_overlay import tiled_rings_ds
    from ioverlay_ray.sources import fixtures

    def kernel_rings(subj, clip, rule, fr):
        return sorted(_canon_ring([tuple(p) for p in c])
                      for sh in overlay(subj, clip, rule, fr) for c in sh)

    def ds_rings(subj, clip, rule, fr):
        ds = tiled_rings_ds(subj, clip, rule, fr)
        out = []
        for row in ds.take_all():
            flat = row["pts"]
            out.append(_canon_ring(list(zip(flat[0::2], flat[1::2]))))
        return sorted(r for r in out if r)

    for idx in (138, 141):
        case = fixtures.load_boolean_case(idx)
        subj, clip = _case_points(case)
        fr = case["fill_rule"]
        for rule in ("union", "xor"):
            assert ds_rings(subj, clip, rule, fr) == \
                kernel_rings(subj, clip, rule, fr), (idx, rule)

    # junction-free fast path (no self-touching ring -> no pooling)
    subj = [rect(0, 0, 300, 300)]
    clip = [rect(100, 100, 300, 300)]
    assert ds_rings(subj, clip, "xor", "nonzero") == \
        kernel_rings(subj, clip, "xor", "nonzero")


def _soup_scene(rng):
    subj, clip = [], []
    for _ in range(int(rng.integers(3, 10))):
        x0, y0 = rng.integers(0, 1500, 2)
        w, h = rng.integers(3, 400, 2)
        subj.append(rect(int(x0), int(y0), int(w), int(h)))
    for _ in range(int(rng.integers(2, 10))):
        k = int(rng.integers(3, 9))
        pts = rng.integers(0, 1500, size=(k, 2))
        clip.append([(int(x), int(y)) for x, y in pts])
    return subj, clip


def test_distributed_soup_ring_parity(ray_session):
    """Random SELF-INTERSECTING scenes through the DISTRIBUTED tiled
    pipeline: full ring-multiset parity with the single kernel (the
    NOTES round-5 lead-#1 verification — the distributed stitch +
    junction-seeded pinch correction must agree with the kernel on the
    soup regime, not just the fixture corpus)."""
    from ioverlay_ray.pipelines.tiled_overlay import tiled_rings_ds

    from ioverlay_ray.pipelines.tiled_overlay import tiled_overlay_ray

    rng = np.random.default_rng(20260820)
    for trial in range(4):
        subj, clip = _soup_scene(rng)
        for rule in ("union", "xor"):
            s1 = overlay(subj, clip, rule, "nonzero")
            want = sorted(_canon_ring([tuple(p) for p in c])
                          for sh in s1 for c in sh)
            ds = tiled_rings_ds(subj, clip, rule, "nonzero", strip_w=256)
            got = sorted(filter(None, (
                _canon_ring(list(zip(r["pts"][0::2], r["pts"][1::2])))
                for r in ds.take_all())))
            assert got == want, (trial, rule)
        # full shape assembly (hull + hole binding) through the
        # distributed path must also match canonically
        s2 = tiled_overlay_ray(subj, clip, "union", "nonzero", 256)
        assert _canon_shapes(s2) == \
            _canon_shapes(overlay(subj, clip, "union", "nonzero")), trial


def test_distributed_cc_pooling_parity(ray_session, monkeypatch):
    """The DISTRIBUTED component-pooling path (large affected sets:
    CC over shared seed vertices + per-component map_groups
    re-extraction) forced via DRIVER_POOL_CAP=0 must reproduce the
    kernel's full ring multiset on the divergent fixtures and a soup
    scene — i.e. exactly what the driver-pooling path produces."""
    from ioverlay_ray.pipelines import tiled_overlay as mod
    from ioverlay_ray.pipelines.tiled_overlay import tiled_rings_ds
    from ioverlay_ray.sources import fixtures

    monkeypatch.setattr(mod, "DRIVER_POOL_CAP", 0)

    def kernel_rings(subj, clip, rule, fr):
        return sorted(_canon_ring([tuple(p) for p in c])
                      for sh in overlay(subj, clip, rule, fr) for c in sh)

    def ds_rings(subj, clip, rule, fr, sw=None):
        ds = tiled_rings_ds(subj, clip, rule, fr, strip_w=sw)
        return sorted(filter(None, (
            _canon_ring(list(zip(r["pts"][0::2], r["pts"][1::2])))
            for r in ds.take_all())))

    for idx in (138, 141):
        case = fixtures.load_boolean_case(idx)
        subj, clip = _case_points(case)
        fr = case["fill_rule"]
        assert ds_rings(subj, clip, "union", fr) == \
            kernel_rings(subj, clip, "union", fr), idx

    rng = np.random.default_rng(20260822)
    subj, clip = _soup_scene(rng)
    for rule in ("union", "xor"):
        assert ds_rings(subj, clip, rule, "nonzero", 256) == \
            kernel_rings(subj, clip, rule, "nonzero"), rule


def test_distributed_correction_selftouch_fallback(ray_session,
                                                   monkeypatch):
    """Junction-dense fallback branch (SHARED_VERTS_CAP exceeded):
    seeding from self-touching rings only. The walker-merge signature
    (one self-touching ring where the kernel splits two) is still
    corrected; area stays exact regardless."""
    from ioverlay_ray.pipelines import tiled_overlay as mod
    from ioverlay_ray.pipelines.tiled_overlay import tiled_rings_ds

    monkeypatch.setattr(mod, "SHARED_VERTS_CAP", 0)
    rng = np.random.default_rng(20260821)
    for trial in range(2):
        subj, clip = _soup_scene(rng)
        s1 = overlay(subj, clip, "union", "nonzero")
        ds = tiled_rings_ds(subj, clip, "union", "nonzero",
                            strip_w=256).materialize()
        assert mod.rings_area2(ds) == shapes_area2(s1), trial
        # fallback guarantee is AREA exactness only: ring pairing may
        # legitimately differ from the kernel here (a walker merge can
        # produce non-self-touching vertex-sharing rings the
        # self-touch seed cannot see, and simplification makes even
        # edge multisets pairing-dependent at pinch vertices). Normal
        # scenes take the junction-seeded branch, which the soup and
        # corpus parity gates hold to FULL ring parity.
