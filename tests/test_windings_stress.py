"""Stress the bottom-windings engines (column-prefix fast path and
segment-tree sweep) against a brute-force O(n*q) scan.

The float-key ordering inside both engines certifies adjacent order by
a per-entry rounding-error bound and falls back to exact rational keys
only on ambiguous runs; these tests hammer exactly the hazardous
regimes: integer grids (massive exact ties), steep segments crossing
y ~ 0 (catastrophic cancellation between the 2*ay anchor and the slope
correction), and billion-scale coordinates.
"""

import numpy as np
import pytest

from ioverlay_ray.geometry.kernel import (
    Segments, _stab_windings, _tree_windings, build_segments, sort_merge,
    split_segments)


def _brute(segs, mx, my, q_pos):
    tax2 = 2 * segs.ax
    tbx2 = 2 * segs.bx
    ux = (segs.bx - segs.ax).astype(object)
    uy = (segs.by - segs.ay).astype(object)
    bs = np.zeros(len(q_pos), dtype=np.int64)
    bc = np.zeros(len(q_pos), dtype=np.int64)
    for i, q in enumerate(q_pos):
        qx, qy = int(mx[q]), int(my[q])
        cover = (tax2 <= qx) & (qx < tbx2)
        idx = np.flatnonzero(cover)
        # exact big-int cross: (b-a) x (m - 2a) > 0  => strictly below
        cr = ux[idx] * (qy - 2 * segs.ay[idx].astype(object)) \
            - uy[idx] * (qx - 2 * segs.ax[idx].astype(object))
        under = idx[np.array([c > 0 for c in cr], dtype=bool)] \
            if len(idx) else idx
        bs[i] = int(segs.subj[under].sum())
        bc[i] = int(segs.clip[under].sum())
    return bs, bc


def _split_of(contours_subj, contours_clip=()):
    segs = build_segments(list(contours_subj), list(contours_clip))
    segs = sort_merge(segs)
    return split_segments(segs)


def _check_both(segs, seed):
    rng = np.random.default_rng(seed)
    n = len(segs)
    q_pos = np.sort(rng.choice(n, size=min(n, 64), replace=False))
    mx = segs.ax + segs.bx
    my = segs.ay + segs.by
    want_s, want_c = _brute(segs, mx, my, q_pos)
    fs, fc = _stab_windings(segs, mx, my, q_pos)
    np.testing.assert_array_equal(fs, want_s)
    np.testing.assert_array_equal(fc, want_c)
    ts, tc = _tree_windings(segs, mx, my, q_pos)
    np.testing.assert_array_equal(ts, want_s)
    np.testing.assert_array_equal(tc, want_c)


@pytest.mark.parametrize("seed", range(6))
def test_random_polygons(seed):
    rng = np.random.default_rng(100 + seed)
    subj, clip = [], []
    for k in range(8):
        cx, cy = rng.integers(-500, 500, 2)
        r = int(rng.integers(40, 300))
        ang = np.sort(rng.uniform(0, 2 * np.pi, int(rng.integers(3, 9))))
        pts = [(int(cx + r * np.cos(a)), int(cy + r * np.sin(a)))
               for a in ang]
        (subj if k % 2 else clip).append(pts)
    segs = _split_of(subj, clip)
    if len(segs):
        _check_both(segs, seed)


@pytest.mark.parametrize("seed", range(4))
def test_integer_grid_ties(seed):
    # rectilinear grid: every key is an exact integer; queries tie
    # segment keys constantly (the LinesNet regime)
    rng = np.random.default_rng(seed)
    subj = []
    for _ in range(12):
        x0, y0 = (int(v) for v in rng.integers(-40, 30, 2))
        w, h = (int(v) for v in rng.integers(2, 14, 2))
        subj.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                     (x0, y0 + h)])
    segs = _split_of(subj)
    if len(segs):
        _check_both(segs, seed)


def test_sub_ulp_key_collision():
    """Two non-crossing steep segments whose rational keys differ by
    ~5e-7 while the float rounding-error bound is ~1e-6: the float sort
    CANNOT certify their order, so the exact fallback must fire and
    resolve every query exactly. Built from a unimodular pair
    (uy1*ux2 - uy2*ux1 = 1) sharing a left endpoint."""
    ux1, ux2 = 108000007, 108000005
    uy1 = 594000038          # inv(ux2) mod ux1 lifted near 5.9e8
    uy2 = (uy1 * ux2 - 1) // ux1
    assert uy1 * ux2 - uy2 * ux1 == 1
    segs = Segments([0, 0], [0, 0], [ux1, ux2], [uy1, uy2],
                    [1, 1], [0, 0])
    # query column X = ux1 (doubled): segment A's key is EXACTLY uy1,
    # B's key is uy1 - 1/ux2 (~9e-9 below — rounds to the SAME float64
    # as A's key and the query's y, so plain float sorting cannot tell
    # the three apart). Probe on A, just above, and just below.
    assert float(uy2 * ux1) / ux2 == float(uy1)  # genuine collision
    mx = np.array([ux1, ux1, ux1], dtype=np.int64)
    my = np.array([uy1, uy1 + 1, uy1 - 1], dtype=np.int64)
    q_pos = np.arange(3)
    want = np.array([1, 2, 0], dtype=np.int64)  # strictly-below counts
    bs, _ = _brute(segs, mx, my, q_pos)
    np.testing.assert_array_equal(bs, want)
    fs, _ = _stab_windings(segs, mx, my, q_pos)
    np.testing.assert_array_equal(fs, want)
    ts, _ = _tree_windings(segs, mx, my, q_pos)
    np.testing.assert_array_equal(ts, want)


@pytest.mark.parametrize("seed", range(4))
def test_cancellation_steep_segments(seed):
    # steep, long segments anchored at huge |ay| that cross y ~ 0:
    # the float key 2*ay + uy*dx/ux cancels almost completely, which
    # is exactly where a naive num/den error bound under-flags
    rng = np.random.default_rng(7000 + seed)
    big = 200_000_000
    subj = []
    for _ in range(10):
        x0 = int(rng.integers(-1000, 800))
        w = int(rng.integers(100, 2200))
        jitter = int(rng.integers(-3, 4))
        subj.append([(x0, -big + jitter), (x0 + w, big + jitter),
                     (x0 + w + 13, big + jitter),
                     (x0 + 13, -big + jitter)])
    segs = _split_of(subj)
    if len(segs):
        _check_both(segs, seed)


def test_packed_integral_key_fast_path():
    """LinesNet-scale rectilinear scene large enough that _stab_windings
    takes the column-prefix fast path, whose keys are all exactly
    integral: the packed single-int64-key sort branch must run (no
    lexsort) and agree with the exact brute force on sampled queries."""
    import ioverlay_ray.geometry.kernel as K
    n = 112
    half = 2
    subj = [[(0, i * 10 - half), (n * 10, i * 10 - half),
             (n * 10, i * 10 + half), (0, i * 10 + half)]
            for i in range(n)]
    clip = [[(j * 10 - half, 0), (j * 10 + half, 0),
             (j * 10 + half, n * 10), (j * 10 - half, n * 10)]
            for j in range(n)]
    segs = _split_of(subj, clip)
    assert len(segs) > 20_000
    mx = segs.ax + segs.bx
    my = segs.ay + segs.by
    q_pos = np.arange(len(segs))

    lex_calls = []
    orig_lexsort = np.lexsort

    def spy(*a, **k):
        lex_calls.append(1)
        return orig_lexsort(*a, **k)

    np.lexsort = spy
    try:
        bs, bc = _stab_windings(segs, mx, my, q_pos)
    finally:
        np.lexsort = orig_lexsort
    assert not lex_calls, "expected the packed integral-key sort branch"

    rng = np.random.default_rng(0)
    sample = np.sort(rng.choice(len(segs), size=48, replace=False))
    want_s, want_c = _brute(segs, mx, my, sample)
    np.testing.assert_array_equal(bs[sample], want_s)
    np.testing.assert_array_equal(bc[sample], want_c)
