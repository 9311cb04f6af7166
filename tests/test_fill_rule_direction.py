"""Fill-rule winding semantics (fill_rule_tests.rs) and output-direction
behavior (direction_tests.rs), ported structurally."""

from ioverlay_ray.geometry.overlay import overlay, simplify_shape


def square(radius, clockwise):
    s = [(-radius, -radius), (-radius, radius), (radius, radius),
         (radius, -radius)]
    return s if clockwise else s[::-1]


def subject_shapes(outer_cw, inner_cw, fill_rule):
    return overlay([square(10, outer_cw), square(5, inner_cw)], [],
                   "subject", fill_rule)


def shape_struct(shapes):
    return sorted((len(s) for s in shapes))


def test_both_clockwise():
    assert shape_struct(subject_shapes(True, True, "evenodd")) == [2]
    assert shape_struct(subject_shapes(True, True, "nonzero")) == [1]
    assert shape_struct(subject_shapes(True, True, "negative")) == [1]
    assert subject_shapes(True, True, "positive") == []


def test_both_counter_clockwise():
    assert shape_struct(subject_shapes(False, False, "evenodd")) == [2]
    assert shape_struct(subject_shapes(False, False, "nonzero")) == [1]
    assert subject_shapes(False, False, "negative") == []
    assert shape_struct(subject_shapes(False, False, "positive")) == [1]


def test_cw_outer_ccw_inner():
    assert shape_struct(subject_shapes(True, False, "evenodd")) == [2]
    assert shape_struct(subject_shapes(True, False, "nonzero")) == [2]
    assert shape_struct(subject_shapes(True, False, "negative")) == [2]
    assert subject_shapes(True, False, "positive") == []


def test_ccw_outer_cw_inner():
    assert shape_struct(subject_shapes(False, True, "evenodd")) == [2]
    assert shape_struct(subject_shapes(False, True, "nonzero")) == [2]
    assert subject_shapes(False, True, "negative") == []
    assert shape_struct(subject_shapes(False, True, "positive")) == [2]


def area2(contour):
    return sum(contour[i - 1][0] * contour[i][1]
               - contour[i][0] * contour[i - 1][1]
               for i in range(len(contour)))


def test_direction_simplify_single():
    diamond = [[(-5, 0), (0, -5), (5, 0), (0, 5)]]
    r0 = simplify_shape(diamond, "nonzero")
    assert area2(r0[0][0]) > 0
    r1 = simplify_shape(diamond, "nonzero", clockwise=True)
    assert area2(r1[0][0]) < 0


def test_direction_simplify_with_hole():
    rings = [
        [(-10, 0), (0, -10), (10, 0), (0, 10)],
        [(-5, 0), (0, 5), (5, 0), (0, -5)],
    ]
    r0 = simplify_shape(rings, "nonzero")
    assert area2(r0[0][0]) > 0 and area2(r0[0][1]) < 0
    r1 = simplify_shape(rings, "nonzero", clockwise=True)
    assert area2(r1[0][0]) < 0 and area2(r1[0][1]) > 0
    # default overlay behavior matches
    r = overlay(rings, [], "subject", "nonzero")
    assert area2(r[0][0]) > 0 and area2(r[0][1]) < 0
