"""Pinned pathological inputs ported from the reference crash corpus
(tests/crash_tests.rs) + degenerate-input behavior (empty_tests.rs)."""

from ioverlay_ray.geometry.float_api import float_overlay, float_simplify
from ioverlay_ray.geometry.overlay import overlay, simplify_shape


def test_crash_00_three_skewed_triangles():
    subj = [
        [(0, 0), (0, 4), (3, -5)],
        [(0, 0), (1, 7), (2, -8)],
        [(0, 0), (4, -4), (5, 7)],
    ]
    result = overlay(subj, [], "subject", "nonzero")
    assert result


def test_crash_01_float_self_intersecting_star():
    subj = [[
        (-117.04171489206965, 1820.3621519926919),
        (4619.6817058891429, -2133.11539650432),
        (1902.5599837294722, -133.53167784432389),
        (-3572.1275050425684, 3909.4677532724309),
        (3047.0491344383845, -4087.6336157702817),
    ]]
    result = float_overlay(subj, [], "subject", "nonzero")
    assert result is not None  # must not raise


def test_crash_02_origin_fan():
    subj = [
        [(0, 0), (1, 6), (6, 4)],
        [(0, 0), (6, 5), (2, -2)],
        [(0, 0), (3, -1), (1, 3)],
    ]
    result = overlay(subj, [], "subject", "nonzero")
    assert result


def test_crash_03_tree_path():
    subj = [[(3, 4), (5, 0), (3, 3), (4, 2), (5, -2)]]
    overlay(subj, [], "subject", "nonzero")  # must not raise


def test_crash_04_small_zigzag():
    subj = [[(-4, -2), (1, -3), (-1, 3), (1, -4), (4, -3)]]
    overlay(subj, [], "subject", "nonzero")  # must not raise


def test_crash_05_float_near_degenerate_slivers():
    subj = [
        [(24902.9222201258, 11129.9683052215),
         (24821.9592401258, 11107.1269052215),
         (24902.9218201258, 11129.9681852215),
         (24898.9601001258, 11128.8505052215)],
        [(20094.9253001258, 12125.6660652215),
         (20094.9253001258, 12125.6647652215),
         (29795.5156201258, 10942.5275852215)],
        [(24902.2200401258, 11129.7702052215),
         (24902.3098801258, 11129.7955452215),
         (24902.4788601258, 11129.8432252215)],
        [(24902.4819801258, 11129.8441052215),
         (24902.4832001258, 11129.8444452215),
         (24902.4821401258, 11129.8441452215)],
    ]
    float_simplify(subj, "nonzero", scale=50_000.0)  # must not raise


def test_crash_06_self_touching_hole_simplify():
    shape = [
        [(0, 0), (8, 0), (8, 8), (0, 8)],
        [(2, 2), (2, 6), (6, 6), (6, 2), (2, 2), (5, 3), (3, 5)],
        [(10, 0), (12, 0), (12, 2), (10, 2)],
    ]
    result = simplify_shape(shape, "nonzero")
    assert len(result) == 2


def test_empty_degenerate_inputs():
    # single point / single edge: no graph, empty result (empty_tests.rs)
    assert overlay([[(0, 0)]], [], "subject", "nonzero") == []
    assert overlay([[(0, 0), (1, 0)]], [], "subject", "nonzero") == []
    assert overlay([], [], "union", "nonzero") == []
