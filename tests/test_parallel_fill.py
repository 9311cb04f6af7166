"""Sharded (Ray task wave) fill vs the in-process kernel: identical."""

import numpy as np


def test_parallel_fill_identical(ray_session, monkeypatch):
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf
    from ioverlay_ray.pipelines.perf_workloads import spiral

    monkeypatch.setattr(pf, "PARALLEL_MIN_SEGS", 1)

    # single connected component (the regime the decomposition exists
    # for) + a random multi-component rect soup crossing shard borders
    path = spiral(2048)
    seq = float_overlay([path], [], "subject", "nonzero")
    par = pf.parallel_overlay([path], [], "subject", "nonzero",
                              shards=5)
    assert seq == par

    rng = np.random.default_rng(17)
    subj, clip = [], []
    for dst, m in ((subj, 40), (clip, 40)):
        for _ in range(m):
            x0, y0 = (int(v) for v in rng.integers(0, 400, 2))
            w, h = (int(v) for v in rng.integers(1, 120, 2))
            dst.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                        (x0, y0 + h)])
    for rule in ("union", "intersect", "xor", "difference"):
        seq = float_overlay(subj, clip, rule, "evenodd")
        par = pf.parallel_overlay(subj, clip, rule, "evenodd",
                                  shards=7)
        assert seq == par, rule


def test_parallel_fill_fallback_below_threshold(ray_session):
    # below PARALLEL_MIN_SEGS the hook must not pay a task wave; it
    # still returns the identical result through the kernel path
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf

    sq = [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    assert pf.parallel_overlay(sq, [], "subject", "nonzero") == \
        float_overlay(sq, [], "subject", "nonzero")


def test_sharded_marks_identical(ray_session, monkeypatch):
    """find_marks_ray (band-range fan-out) == in-process _find_marks
    after the order-insensitive apply; full overlay parity on a dense
    arbitrary-slope scene that takes the banded regime."""
    import numpy as np

    from ioverlay_ray.geometry import kernel as K
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf

    monkeypatch.setattr(pf, "PARALLEL_MIN_SEGS", 1)

    rng = np.random.default_rng(23)
    # dense crossing soup: many long skewed lines -> banded plan
    subj = []
    for i in range(220):
        x0 = int(rng.integers(0, 2000))
        y0 = int(rng.integers(0, 2000))
        dx = int(rng.integers(500, 3000))
        dy = int(rng.integers(-40, 40))
        subj.append([(x0, y0), (x0 + dx, y0 + dy),
                     (x0 + dx, y0 + dy + 7), (x0, y0 + 7)])
    clip = []
    for i in range(220):
        x0 = int(rng.integers(0, 2000))
        y0 = int(rng.integers(0, 2000))
        dy = int(rng.integers(500, 3000))
        dx = int(rng.integers(-40, 40))
        clip.append([(x0, y0), (x0 + dx, y0 + dy),
                     (x0 + dx + 7, y0 + dy), (x0 + 7, y0)])

    segs = K.sort_merge(K.build_segments(subj, clip))
    mode, B = K._pair_plan(segs)
    assert mode == "banded" and B >= 2, (mode, B)
    seq = K._find_marks(segs, 1)
    shd = pf.find_marks_ray(segs, 1, shards=5)
    assert shd is not None
    # identical mark SETS (apply is order-insensitive: lexsort + dedup)
    def canon(m):
        i, x, y, r = m
        o = np.lexsort((y, x, i))
        return i[o].tolist(), x[o].tolist(), y[o].tolist(), bool(r)
    assert canon(seq) == canon(shd)

    for rule in ("union", "xor"):
        a = float_overlay(subj, clip, rule, "nonzero")
        b = pf.parallel_overlay(subj, clip, rule, "nonzero", shards=5)
        assert a == b, rule


def test_layout_wave_parity(ray_session):
    # the sharded anchor walk must produce the identical extraction as
    # the in-process walk (disjoint-arc merge is exact by construction)
    import numpy as np

    import ioverlay_ray.pipelines.parallel_fill as PF
    from ioverlay_ray.geometry import extract
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines.perf_workloads import spiral

    path = np.asarray(spiral(4096))
    want = float_overlay([path], [], "subject", "nonzero")
    prev = extract.PARALLEL_LAYOUT
    extract.PARALLEL_LAYOUT = \
        lambda *a: PF.layout_waves(*a, shards=4, min_edges=0)
    try:
        got = float_overlay([path], [], "subject", "nonzero")
    finally:
        extract.PARALLEL_LAYOUT = prev
    assert got == want


def test_perm_cycle_layout_bruteforce():
    # crafted permutations (incl. cycles shorter than the anchor
    # stride, which exercise the re-walk recursion down to stride 1)
    import numpy as np

    from ioverlay_ray.geometry.extract import _perm_cycle_layout

    rng = np.random.default_rng(7)
    for trial in range(20):
        sizes = rng.integers(1, 60, size=rng.integers(2, 40))
        m = int(sizes.sum())
        perm = rng.permutation(m)
        jump = np.empty(m, dtype=np.int64)
        pos = 0
        want_cycles = []
        for s in sizes:
            cyc = perm[pos:pos + s]
            jump[cyc] = np.roll(cyc, -1)   # cyc[i] -> cyc[i+1]
            want_cycles.append(cyc)
            pos += s
        link_of = rng.integers(0, 1 << 40, size=m)
        stride = int(rng.integers(1, m + 1))
        cyc_id, rank, cyc_len, cyc_min, layout, start_off = \
            _perm_cycle_layout(jump, link_of, stride=stride)
        # every ground-truth cycle maps to exactly one layout cycle
        seen = set()
        for cyc in want_cycles:
            cids = set(cyc_id[cyc].tolist())
            assert len(cids) == 1, (trial, stride)
            c = cids.pop()
            assert c not in seen
            seen.add(c)
            L = len(cyc)
            assert cyc_len[c] == L
            assert cyc_min[c] == link_of[cyc].min()
            # ranks are a rotation of the traversal order
            blk = layout[start_off[c]:start_off[c] + L]
            r0 = int(np.flatnonzero(blk == cyc[0])[0])
            assert np.array_equal(np.roll(blk, -r0), cyc)
            # rank[e] consistent with layout position
            assert np.array_equal(blk, np.asarray(
                sorted(cyc.tolist(), key=lambda e: rank[e])))
        assert len(seen) == len(cyc_len)


def test_windowed_fill_long_segment_extras(ray_session, monkeypatch):
    # adversarial for the driver windowing: a few full-extent segments
    # must reach EVERY shard through the `extra` long-segment list
    # (their span exceeds the 99.9% threshold window)
    import numpy as np

    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf

    monkeypatch.setattr(pf, "PARALLEL_MIN_SEGS", 1)
    rng = np.random.default_rng(99)
    subj = []
    for _ in range(300):
        x0, y0 = (int(v) for v in rng.integers(0, 5000, 2))
        w, h = (int(v) for v in rng.integers(1, 12, 2))
        subj.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                     (x0, y0 + h)])
    # five huge thin slabs spanning the whole extent (skewed edges so
    # the rectilinear engines don't absorb them)
    for k in range(5):
        y = 900 * k + 7
        subj.append([(0, y), (5003, y + 3), (5003, y + 211),
                     (0, y + 208)])
    for rule, fr in (("subject", "nonzero"), ("subject", "evenodd")):
        seq = float_overlay(subj, [], rule, fr)
        par = pf.parallel_overlay(subj, [], rule, fr, shards=9)
        assert seq == par, (rule, fr)


def test_sort_merge_ray_identical(ray_session):
    # sharded sort_merge must equal the global one row-for-row,
    # including duplicate merging across shard borders
    import numpy as np

    import ioverlay_ray.pipelines.parallel_fill as pf
    from ioverlay_ray.geometry.kernel import Segments, sort_merge

    rng = np.random.default_rng(5)
    n = 20000
    # coordinates drawn from a SMALL range so duplicate rows are common
    ax = rng.integers(0, 50, n)
    ay = rng.integers(0, 50, n)
    bx = ax + rng.integers(1, 10, n)
    by = ay + rng.integers(-9, 10, n)
    subj = rng.choice([-2, -1, 1, 2], n)
    clip = rng.choice([-1, 0, 1], n)
    segs = Segments(ax, ay, bx, by, subj, clip)
    want = sort_merge(segs)
    got = pf.sort_merge_ray(Segments(ax, ay, bx, by, subj, clip),
                            False, shards=6)
    # force the wave regardless of threshold for the test
    if got is None:
        prev = pf.PARALLEL_SORT_MIN
        pf.PARALLEL_SORT_MIN = 1
        try:
            got = pf.sort_merge_ray(Segments(ax, ay, bx, by, subj, clip),
                                    False, shards=6)
        finally:
            pf.PARALLEL_SORT_MIN = prev
    for f in Segments.__slots__:
        assert np.array_equal(getattr(want, f), getattr(got, f)), f


def test_sharded_apply_identical(ray_session, monkeypatch):
    """apply_marks_ray == in-process _apply_marks (exact table
    equality: the trailing global sort_merge canonicalizes row order),
    plus whole-overlay parity with the wave engaged on dense crossing
    scenes across all rules."""
    import numpy as np

    from ioverlay_ray.geometry import kernel as K
    from ioverlay_ray.geometry.float_api import float_overlay
    from ioverlay_ray.pipelines import parallel_fill as pf

    monkeypatch.setattr(pf, "PARALLEL_MIN_SEGS", 1)
    monkeypatch.setattr(pf, "PARALLEL_APPLY_MIN", 1)

    rng = np.random.default_rng(31)
    subj, clip = [], []
    for dst, horiz in ((subj, True), (clip, False)):
        for _ in range(160):
            x0 = int(rng.integers(0, 1500))
            y0 = int(rng.integers(0, 1500))
            d = int(rng.integers(400, 2500))
            j = int(rng.integers(-30, 30))
            if horiz:
                dst.append([(x0, y0), (x0 + d, y0 + j),
                            (x0 + d, y0 + j + 5), (x0, y0 + 5)])
            else:
                dst.append([(x0, y0), (x0 + j, y0 + d),
                            (x0 + j + 5, y0 + d), (x0 + 5, y0)])

    segs = K.sort_merge(K.build_segments(subj, clip))
    m_idx, m_px, m_py, _ = K._find_marks(segs, 1)
    assert len(m_idx) > 500  # the scene must actually stress apply
    seq = K._apply_marks(segs, m_idx, m_px, m_py)
    shd = pf.apply_marks_ray(segs, m_idx, m_px, m_py, shards=5)
    assert shd is not None
    for c in ("ax", "ay", "bx", "by", "subj", "clip"):
        assert np.array_equal(getattr(seq, c), getattr(shd, c)), c

    # duplicate-mark robustness: feeding the marks twice must dedup to
    # the identical table (all copies of a (seg, point) co-locate)
    shd2 = pf.apply_marks_ray(segs, np.concatenate([m_idx, m_idx]),
                              np.concatenate([m_px, m_px]),
                              np.concatenate([m_py, m_py]), shards=4)
    for c in ("ax", "ay", "bx", "by", "subj", "clip"):
        assert np.array_equal(getattr(seq, c), getattr(shd2, c)), c

    for rule in ("union", "intersect", "xor", "difference"):
        a = float_overlay(subj, clip, rule, "nonzero")
        b = pf.parallel_overlay(subj, clip, rule, "nonzero", shards=5)
        assert a == b, rule
