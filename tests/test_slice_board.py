"""Slice semantics (slice_tests.rs) and single-kernel checkerboard
polygon counts (board_tests.rs), ported."""

from ioverlay_ray.geometry.overlay import overlay
from ioverlay_ray.geometry.string_ops import slice_by_paths

SQ = [(10, -10), (10, 10), (-10, 10), (-10, -10)]
SQ_CCW = [(-10, -10), (-10, 10), (10, 10), (10, -10)]


def line(a, b):
    return [a, b]


def test_miss_slice():
    r = slice_by_paths([SQ], [line((-15, -20), (-15, 20))], "nonzero")
    assert len(r) == 1 and len(r[0]) == 1


def test_edge_slice():
    r = slice_by_paths([SQ], [line((-10, -20), (-10, 20))], "nonzero")
    assert len(r) == 1 and len(r[0]) == 1


def test_inside_slice():
    r = slice_by_paths([SQ], [line((0, -5), (0, 5))], "nonzero")
    assert len(r) == 1 and len(r[0]) == 1


def test_middle_slice():
    r = slice_by_paths([SQ_CCW], [line((0, -20), (0, 20))], "nonzero")
    assert len(r) == 2
    assert all(len(s) == 1 for s in r)


def test_cross_slice():
    r = slice_by_paths([SQ_CCW],
                       [line((0, -20), (0, 20)), line((-20, 0), (20, 0))],
                       "nonzero")
    assert len(r) == 4
    assert all(len(s) == 1 for s in r)


def test_cross_inside_slice():
    r = slice_by_paths([SQ_CCW],
                       [line((0, -5), (0, 5)), line((-5, 0), (5, 0))],
                       "nonzero")
    assert len(r) == 1 and len(r[0]) == 1


def test_window():
    window = [(-5, -5), (-5, 5), (5, 5), (5, -5), (-5, -5)]
    r = slice_by_paths([SQ], [window], "nonzero")
    assert len(r) == 2
    assert sorted(len(s) for s in r) == [1, 2]


def test_two_windows():
    big = [(15, -15), (15, 15), (-15, 15), (-15, -15)]
    w0 = [(-10, -10), (-10, 10), (10, 10), (10, -10), (-10, -10)]
    w1 = [(-5, -5), (-5, 5), (5, 5), (5, -5), (-5, -5)]
    r = slice_by_paths([big], [w0, w1], "nonzero")
    assert len(r) == 3
    assert sorted(len(s) for s in r) == [1, 2, 2]


def test_ideal_triangle():
    tri = [line((-5, 0), (5, 0)), line((-5, 0), (0, 5)),
           line((5, 0), (0, 5))]
    r = slice_by_paths([SQ_CCW], tri, "nonzero")
    assert len(r) == 2
    assert sorted(len(s) for s in r) == [1, 2]


def test_not_ideal_triangle():
    tri = [line((-7, 0), (7, 0)), line((-5, 0), (0, 5)),
           line((5, 0), (0, 5))]
    r = slice_by_paths([SQ_CCW], tri, "nonzero")
    assert len(r) == 2
    assert sorted(len(s) for s in r) == [1, 2]


def many_squares(x0, y0, size, offset, n):
    out = []
    for j in range(n):
        for i in range(n):
            x = x0 + i * offset
            y = y0 + j * offset
            out.append([(x, y), (x, y + size), (x + size, y + size),
                        (x + size, y)])
    return out


def test_board_xor_counts():
    """board_tests.rs: n x n + (n-1) x (n-1) polygons out of the
    overlapping-checkerboard XOR, single kernel."""
    for n in range(1, 9):
        subj = many_squares(0, 0, 20, 30, n)
        clip = many_squares(15, 15, 20, 30, n - 1)
        result = overlay(subj, clip, "xor", "nonzero")
        assert len(result) == n * n + (n - 1) * (n - 1), n
