"""Clean-geometry winding fast path (kernel._single_cycle_windings).

The closed form must be BIT-EXACT with the stabbing engines whenever
the gate accepts a scene, and the gate must reject anything that is
not a single simple post-split cycle (crossings, multi-contour,
merged counts).
"""

import numpy as np
import pytest

from ioverlay_ray.geometry import kernel as K


def _stab_ref(segs):
    mx = segs.ax + segs.bx
    my = segs.ay + segs.by
    ref, _ = K._stab_windings(segs, mx, my, np.arange(len(segs)),
                              256, False)
    return ref


def _check_scene(contour):
    segs = K.split_segments(K.build_segments([contour], []))
    if len(segs) < 3:
        return None
    fast = K._single_cycle_windings(segs)
    if fast is None:
        return None
    assert np.array_equal(fast, _stab_ref(segs))
    return fast


def test_square_both_orientations():
    sq = [(0, 0), (10, 0), (10, 10), (0, 10)]
    f1 = _check_scene(sq)
    f2 = _check_scene(sq[::-1])
    assert f1 is not None and f2 is not None
    # CCW: interior-above edges get 0, interior-below get +1
    assert set(f1.tolist()) == {0, 1}
    assert set(f2.tolist()) == {0, -1}


def test_random_stars_parity():
    rng = np.random.default_rng(42)
    taken = 0
    for _ in range(200):
        m = int(rng.integers(3, 40))
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        rad = rng.uniform(1, 100, m)
        g = int(rng.integers(1, 30))
        px = np.round(rad * np.cos(ang) / g).astype(np.int64) * g
        py = np.round(rad * np.sin(ang) / g).astype(np.int64) * g
        if bool(rng.integers(0, 2)):
            px, py = px[::-1].copy(), py[::-1].copy()
        if _check_scene(list(zip(px.tolist(), py.tolist()))) is not None:
            taken += 1
    assert taken > 50  # the gate must actually fire on clean scenes


def test_rectilinear_staircases_parity():
    rng = np.random.default_rng(7)
    for _ in range(40):
        k = int(rng.integers(2, 12))
        xs = np.cumsum(rng.integers(1, 9, k))
        ys = np.cumsum(rng.integers(1, 9, k))
        c = [(0, 0)]
        for i in range(k):
            c.append((int(xs[i]), int(c[-1][1])))
            c.append((int(xs[i]), int(ys[i])))
        c.append((0, int(ys[-1])))
        if bool(rng.integers(0, 2)):
            c = c[::-1]
        _check_scene(c)


def test_gate_rejects_self_intersecting():
    # bowtie: crossing -> split -> degree-4 node -> reject
    segs = K.split_segments(K.build_segments(
        [[(0, 0), (10, 10), (10, 0), (0, 10)]], []))
    assert K._single_cycle_windings(segs) is None


def test_gate_rejects_multi_contour():
    segs = K.split_segments(K.build_segments(
        [[(0, 0), (10, 0), (10, 10), (0, 10)],
         [(20, 0), (30, 0), (30, 10), (20, 10)]], []))
    assert K._single_cycle_windings(segs) is None


def test_gate_rejects_clip_counts():
    segs = K.split_segments(K.build_segments(
        [], [[(0, 0), (10, 0), (10, 10), (0, 10)]]))
    assert K._single_cycle_windings(segs) is None


def test_big_clean_polygon_takes_fast_path():
    # a 50k-vertex convex-ish fan: one simple cycle, no splits
    n = 50_000
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = 1_000_000 + (np.arange(n) % 7) * 13
    px = np.round(r * np.cos(t)).astype(np.int64)
    py = np.round(r * np.sin(t)).astype(np.int64)
    segs = K.split_segments(K.build_segments(
        [list(zip(px.tolist(), py.tolist()))], []))
    fast = K._single_cycle_windings(segs)
    if fast is None:  # quantization may have produced a crossing
        pytest.skip("scene split; gate correctly declined")
    assert np.array_equal(fast, _stab_ref(segs))


def test_bottom_windings_routes_through_fast_path(monkeypatch):
    sq = [(0, 0), (10, 0), (10, 10), (0, 10)]
    segs = K.split_segments(K.build_segments([sq], []))

    def boom(*a, **k):
        raise AssertionError("stab engine must not run")

    monkeypatch.setattr(K, "_stab_windings", boom)
    bot_subj, bot_clip = K.bottom_windings(segs, with_clip=False)
    assert set(bot_subj.tolist()) <= {0, 1, -1}
    assert not bot_clip.any()
