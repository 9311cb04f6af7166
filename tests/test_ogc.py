"""OGC-valid extraction (ISO 19125-1: every surface interior is a
connected point set). Cases ported from the reference's ocg_tests.rs."""

from ioverlay_ray.geometry.overlay import overlay


def struct(shapes):
    return [[len(c) for c in s] for s in shapes]


def test_0_shared_vertex_holes_split_interior():
    subj = [[(0, 0), (5, 0), (5, 5), (0, 5)]]
    clip = [
        [(1, 2), (1, 4), (3, 4), (3, 3), (2, 3), (2, 2)],
        [(2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 1)],
    ]
    result = overlay(subj, clip, "difference", "evenodd", ogc=True)
    s = sorted(struct(result), key=len, reverse=True)
    assert len(result) == 2
    assert s[0] == [4, 8]
    assert s[1] == [4]


def test_0_clockwise():
    subj = [[(0, 0), (5, 0), (5, 5), (0, 5)]]
    clip = [
        [(1, 2), (1, 4), (3, 4), (3, 3), (2, 3), (2, 2)],
        [(2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 1)],
    ]
    result = overlay(subj, clip, "difference", "evenodd", ogc=True,
                     clockwise=True)
    s = sorted(struct(result), key=len, reverse=True)
    assert len(result) == 2 and s[0] == [4, 8] and s[1] == [4]


def test_1_four_squares_pinwheel():
    subj = [[(0, 0), (5, 0), (5, 5), (0, 5)]]
    clip = [
        [(1, 2), (1, 3), (2, 3), (2, 2)],
        [(2, 1), (2, 2), (3, 2), (3, 1)],
        [(2, 3), (2, 4), (3, 4), (3, 3)],
        [(3, 2), (3, 3), (4, 3), (4, 2)],
    ]
    result = overlay(subj, clip, "difference", "evenodd", ogc=True)
    s = sorted(struct(result), key=len, reverse=True)
    assert len(result) == 2
    assert s[0] == [4, 12]
    assert s[1] == [4]


def test_2_checker_diamond():
    subj = [[(0, 0), (7, 0), (7, 7), (0, 7)]]
    clip = [
        [(1, 3), (1, 4), (2, 4), (2, 3)],
        [(2, 2), (2, 3), (3, 3), (3, 2)],
        [(2, 4), (2, 5), (3, 5), (3, 4)],
        [(3, 1), (3, 2), (4, 2), (4, 1)],
        [(3, 3), (3, 4), (4, 4), (4, 3)],
        [(3, 5), (3, 6), (4, 6), (4, 5)],
        [(4, 2), (4, 3), (5, 3), (5, 2)],
        [(4, 4), (4, 5), (5, 5), (5, 4)],
        [(5, 3), (5, 4), (6, 4), (6, 3)],
    ]
    result = overlay(subj, clip, "difference", "evenodd", ogc=True)
    assert len(result) == 5
    sizes = sorted(len(s) for s in result)
    assert sizes == [1, 1, 1, 1, 2]


def test_3_self_touching_union():
    subj = [[(0, 3), (0, 0), (3, 0), (3, 2), (1, 2), (1, 1), (2, 1), (2, 3)]]
    result = overlay(subj, [], "union", "evenodd", ogc=True)
    assert len(result) == 1
    assert sorted(len(c) for c in result[0]) == [4, 6]


def test_4_chained_squares():
    subj = [[(0, 4), (0, 0), (4, 0), (4, 3), (3, 3), (3, 4)]]
    clip = [[(1, 2), (1, 1), (2, 1), (2, 2)],
            [(2, 3), (2, 2), (3, 2), (3, 3)]]
    result = overlay(subj, clip, "difference", "evenodd", ogc=True)
    assert len(result) == 1
    assert sorted(len(c) for c in result[0]) == [4, 4, 6]


def test_non_ogc_differs():
    # without ogc, the shared-vertex holes stay merged in one shape
    subj = [[(0, 0), (5, 0), (5, 5), (0, 5)]]
    clip = [
        [(1, 2), (1, 4), (3, 4), (3, 3), (2, 3), (2, 2)],
        [(2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 1)],
    ]
    plain = overlay(subj, clip, "difference", "evenodd")
    assert len(plain) == 1  # single shape with disconnected interior


def test_5_chained_squares_inside():
    subj = [[(0, 4), (0, 0), (4, 0), (4, 4)]]
    clip = [[(1, 2), (1, 1), (2, 1), (2, 2)],
            [(2, 3), (2, 2), (3, 2), (3, 3)]]
    for cw in (False, True):
        result = overlay(subj, clip, "difference", "evenodd", ogc=True,
                         clockwise=cw)
        assert len(result) == 1
        assert sorted(len(c) for c in result[0]) == [4, 4, 4]


def test_6_holes_touching_notch():
    subj = [[(0, 3), (0, 0), (5, 0), (5, 3), (3, 3), (3, 2), (2, 2), (2, 3)]]
    clip = [[(1, 2), (1, 1), (2, 1), (2, 2)],
            [(3, 2), (3, 1), (4, 1), (4, 2)]]
    result = overlay(subj, clip, "difference", "evenodd", ogc=True)
    assert len(result) == 1
    assert sorted(len(c) for c in result[0]) == [4, 4, 8]


def test_7_four_squares_vertex_ring():
    subj = [
        [(0, 2), (0, 1), (1, 1), (1, 2)],
        [(2, 2), (2, 1), (3, 1), (3, 2)],
        [(1, 1), (1, 0), (2, 0), (2, 1)],
        [(1, 3), (1, 2), (2, 2), (2, 3)],
    ]
    result = overlay(subj, [], "union", "evenodd", ogc=True)
    assert len(result) == 4
    assert all(len(s) == 1 and len(s[0]) == 4 for s in result)


def test_8_union_fills_center():
    subj = [[(0, 4), (0, 0), (5, 0), (5, 4), (3, 4), (3, 3), (4, 3),
             (4, 2), (3, 2), (3, 1), (2, 1), (2, 2), (1, 2), (1, 3),
             (2, 3), (2, 4)]]
    clip = [[(2, 3), (2, 2), (3, 2), (3, 3)]]
    result = overlay(subj, clip, "union", "evenodd", ogc=True)
    assert len(result) == 2
    sizes = sorted(len(s[0]) for s in result)
    assert sizes == [4, 16]
    assert all(len(s) == 1 for s in result)


def test_9_touching_diamonds_in_notched_square():
    subj = [
        [(-3, 0), (-3, -3), (0, -3), (0, 0), (3, 0), (3, 3), (0, 3), (0, 0)],
        [(-1, -2), (-2, -1), (0, 0), (1, 2), (2, 1), (0, 0)],
    ]
    result = overlay(subj, [], "union", "evenodd", ogc=True)
    assert len(result) == 2
    for s in result:
        assert sorted(len(c) for c in s) == [3, 4]


def test_10_triangles_sharing_origin():
    subj = [
        [(0, 0), (-6, 2), (-2, -6)],
        [(-3, 0), (0, 0), (-3, -1)],
        [(0, 0), (4, -6), (4, 6)],
    ]
    result = overlay(subj, [], "union", "nonzero", ogc=True)
    sizes = sorted(len(s) for s in result)
    assert sizes == [1, 2]


def test_11_star_with_spoke_holes():
    subj = [
        [(-5, 5), (-4, 1), (0, 0), (-4, -1), (-5, -5), (0, 0), (5, -5),
         (4, -1), (0, 0), (4, 1), (5, 5), (0, 0)],
        [(-3, -2), (-3, -1), (0, 0), (-3, 1), (-3, 2), (0, 0), (3, 2),
         (3, 1), (0, 0), (3, -1), (3, -2), (0, 0)],
    ]
    result = overlay(subj, [], "union", "nonzero", ogc=True)
    assert len(result) == 4
    for s in result:
        assert len(s) == 2
        assert len(s[0]) == 3 and len(s[1]) == 3


def test_checkerboard_a_family():
    # lattice of crossing bars: interior splits into (n^2 + (n-1)^2)
    # cells plus the outer frame (ocg_tests.rs checkerboard_a)
    for n in (4, 7, 10):
        m = n
        x0 = y0 = 1
        x1 = y1 = 2 * (m + 1)
        subj = [[(x0 - 1, y1 + 1), (x0 - 1, y0 - 1), (x1 + 1, y0 - 1),
                 (x1 + 1, y1 + 1)]]
        for i in range(m):
            x = 2 * (i + 1)
            subj.append([(x, y0), (x, y1), (x + 1, y1), (x + 1, y0)])
            y = 2 * (i + 1)
            subj.append([(x0, y), (x0, y + 1), (x1, y + 1), (x1, y)])
        result = overlay(subj, [], "subject", "evenodd", ogc=True)
        assert len(result) == n * n + (n - 1) * (n - 1) + 1, n
        with_hole = [s for s in result if len(s) > 1]
        assert len(with_hole) == 1 and len(with_hole[0]) == 2


def test_random_grid_holes():
    """ocg_tests.rs random_grid_holes analog: clip random unit cells out
    of an n x n square under OGC; the shape count must equal the number
    of 4-connected components of the remaining cells (corner-touching
    cells are split, per ISO 19125-1)."""
    import numpy as np

    def components4(keep):
        n = keep.shape[0]
        seen = np.zeros_like(keep, dtype=bool)
        count = 0
        for sy in range(n):
            for sx in range(n):
                if not keep[sy, sx] or seen[sy, sx]:
                    continue
                count += 1
                stack = [(sy, sx)]
                seen[sy, sx] = True
                while stack:
                    y, x = stack.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < n and 0 <= xx < n and keep[yy, xx] \
                                and not seen[yy, xx]:
                            seen[yy, xx] = True
                            stack.append((yy, xx))
        return count

    n = 8
    for seed in range(64):
        rng = np.random.default_rng(seed)
        clipped = rng.random((n, n)) < 0.35
        if clipped.all() or not clipped.any():
            continue
        subj = [[(0, 0), (n, 0), (n, n), (0, n)]]
        clip = [[(x, y), (x + 1, y), (x + 1, y + 1), (x, y + 1)]
                for y in range(n) for x in range(n) if clipped[y, x]]
        result = overlay(subj, clip, "difference", "evenodd", ogc=True)
        want = components4(~clipped)
        assert len(result) == want, (seed, len(result), want)
        for shape in result:
            assert shape
            for contour in shape:
                assert len(contour) >= 3
