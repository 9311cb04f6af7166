"""Float-layer extreme-scale cases ported from float_overlay_tests.rs:
the auto power-of-two adapter must absorb huge (2^48), tiny (2^-48) and
near-epsilon coordinates without losing the union topology."""

import pytest

from ioverlay_ray.geometry.float_api import (float_clip_paths, float_overlay,
                                             float_slice_by_paths)


def two_adjacent_squares(a):
    s0 = [[(0.0, 0.0), (0.0, a), (a, a), (a, 0.0)]]
    s1 = [[(a, 0.0), (a, a), (2.0 * a, a), (2.0 * a, 0.0)]]
    return s0, s1


@pytest.mark.parametrize("a", [1.0, float(1 << 30), float(1 << 48),
                               1.0 / (1 << 48), 0.9, 0.9999999999999999,
                               1.99999999999999])
def test_adjacent_union_collapses_to_one_rect(a):
    s0, s1 = two_adjacent_squares(a)
    union = float_overlay(s0, s1, "union", "nonzero")
    assert len(union) == 1
    assert len(union[0]) == 1
    assert len(union[0][0]) == 4


def test_overlapping_union_8_corners():
    s0 = [[(-10.0, -10.0), (-10.0, 10.0), (10.0, 10.0), (10.0, -10.0)]]
    s1 = [[(-5.0, -5.0), (-5.0, 15.0), (15.0, 15.0), (15.0, -5.0)]]
    union = float_overlay(s0, s1, "union", "nonzero")
    assert len(union) == 1 and len(union[0]) == 1
    assert len(union[0][0]) == 8


def test_degenerate_two_point_path_empty():
    out = float_overlay([[(-10.0, -10.0), (-10.0, 10.0)]], [],
                        "subject", "nonzero")
    assert out == []


def test_float_slice_window():
    body = [[(10.0, -10.0), (10.0, 10.0), (-10.0, 10.0), (-10.0, -10.0)]]
    window = [[(-5.0, -5.0), (-5.0, 5.0), (5.0, 5.0), (5.0, -5.0),
               (-5.0, -5.0)]]
    out = float_slice_by_paths(body, window, "nonzero")
    assert len(out) == 2
    assert sorted(len(s) for s in out) == [1, 2]


def test_float_clip_tiny_scale():
    a = 1.0 / (1 << 20)
    body = [[(-a, -a), (-a, a), (a, a), (a, -a)]]
    out = float_clip_paths(body, [[(-2 * a, 0.0), (2 * a, 0.0)]], "nonzero")
    assert len(out) == 1
    (x0, _), (x1, _) = out[0][0], out[0][-1]
    assert abs(abs(x1 - x0) - 2 * a) < a * 1e-3
