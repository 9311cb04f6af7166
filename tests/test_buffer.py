"""Stroke/outline buffering properties (no golden outputs exist in the
reference corpus — tests/stroke + tests/outline fixtures are input-only —
so these check areas, topology and containment)."""

import math

import pytest

from ioverlay_ray.geometry.buffer import outline, stroke


def shape_area(shape):
    total = 0.0
    for contour in shape:
        s = 0.0
        n = len(contour)
        for i in range(n):
            x0, y0 = contour[i - 1]
            x1, y1 = contour[i]
            s += x0 * y1 - x1 * y0
        total += s / 2.0
    return total


def shapes_area(shapes):
    return sum(shape_area(s) for s in shapes)


def test_stroke_straight_butt():
    shapes = stroke([[(0.0, 0.0), (10.0, 0.0)]], width=2.0)
    assert len(shapes) == 1
    assert shapes_area(shapes) == pytest.approx(20.0, rel=1e-3)


def test_stroke_square_caps():
    shapes = stroke([[(0.0, 0.0), (10.0, 0.0)]], width=2.0,
                    start_cap="square", end_cap="square")
    assert shapes_area(shapes) == pytest.approx(2.0 * 12.0, rel=1e-3)


def test_stroke_round_caps():
    shapes = stroke([[(0.0, 0.0), (10.0, 0.0)]], width=2.0,
                    start_cap="round", end_cap="round",
                    cap_param=0.05)
    assert shapes_area(shapes) == pytest.approx(20.0 + math.pi, rel=5e-3)


def test_stroke_l_bend_bevel():
    # two 10-long edges width 2, bevel join: overlap square 1x1 counted
    # once, bevel cuts the outer corner wedge
    shapes = stroke([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]], width=2.0,
                    join="bevel")
    a = shapes_area(shapes)
    # exact: 20 + 20 - (1x2 overlap=2... compute: band areas 20 each,
    # intersection near corner 2x2/... just bound it
    assert 38.0 < a < 41.0
    assert len(shapes) == 1


def test_stroke_l_bend_round_vs_bevel():
    bevel = shapes_area(stroke([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]],
                               width=2.0, join="bevel"))
    rnd = shapes_area(stroke([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]],
                             width=2.0, join="round", join_param=0.05))
    miter = shapes_area(stroke([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]],
                               width=2.0, join="miter", join_param=0.1))
    assert bevel < rnd < miter
    assert miter == pytest.approx(40.0, rel=1e-3)  # sharp corner restored


def test_stroke_closed_square_is_ring():
    path = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]
    shapes = stroke(path, width=2.0, is_closed=True, join="miter",
                    join_param=0.1)
    assert len(shapes) == 1
    assert len(shapes[0]) == 2  # hull + hole
    # ring between 8x8 inner and 12x12 outer squares
    assert shapes_area(shapes) == pytest.approx(144.0 - 64.0, rel=1e-3)


def test_outline_square_grow():
    square = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]
    grown = outline(square, 1.0, join="miter", join_param=0.1)
    assert len(grown) == 1
    assert shapes_area(grown) == pytest.approx(144.0, rel=1e-3)
    bevel = outline(square, 1.0, join="bevel")
    # chamfered corners: 144 - 4 * (1/2)
    assert shapes_area(bevel) == pytest.approx(142.0, rel=1e-3)


def test_outline_shrinks_hole():
    shape = [
        [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)],   # hull CCW
        [(5.0, 5.0), (5.0, 15.0), (15.0, 15.0), (15.0, 5.0)],   # hole CW
    ]
    grown = outline(shape, 1.0, 1.0, join="miter", join_param=0.1)
    assert len(grown) == 1
    assert len(grown[0]) == 2
    # hull 20->22, hole 10->8
    assert shapes_area(grown) == pytest.approx(22.0 ** 2 - 8.0 ** 2, rel=1e-3)


def _signed_area(contour):
    s = 0.0
    for i in range(len(contour)):
        x0, y0 = contour[i - 1]
        x1, y1 = contour[i]
        s += x0 * y1 - x1 * y0
    return s / 2.0


def test_reference_stroke_inputs():
    """Smoke over the reference's input-only stroke corpus
    (tests/stroke/test_*.json): every path strokes into valid shapes."""
    import glob
    import json
    for fn in sorted(glob.glob("/root/reference/iOverlay/tests/stroke/*.json")):
        d = json.load(open(fn))
        shapes = stroke(d["stroke"], width=2.0, join="round",
                        start_cap="round", end_cap="round")
        assert shapes, fn
        assert shapes_area(shapes) > 0, fn
        for shape in shapes:
            assert _signed_area(shape[0]) > 0          # hull CCW
            for hole in shape[1:]:
                assert _signed_area(hole) < 0          # holes CW


def test_reference_outline_inputs():
    """Smoke over the reference's input-only outline corpus: every shape
    inflates into valid shapes that are larger than the input."""
    import glob
    import json
    for fn in sorted(glob.glob("/root/reference/iOverlay/tests/outline/*.json")):
        d = json.load(open(fn))
        shapes, cur = [], None
        for contour in d["outline"]:
            if _signed_area(contour) >= 0:
                cur = [contour]
                shapes.append(cur)
            elif cur is not None:
                cur.append(contour)
        # true region area (inputs may self-overlap, e.g. test_7)
        from ioverlay_ray.geometry.overlay import simplify_shape
        q = [[(int(x * 1000), int(y * 1000)) for x, y in c]
             for s in shapes for c in s]
        in_area = shapes_area(simplify_shape(q, "nonzero")) / 1e6
        grown = outline(shapes, 1.0, 1.0, join="round", join_param=0.1)
        assert grown, fn
        assert shapes_area(grown) > in_area, fn


def test_outline_deflate():
    square = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]
    shrunk = outline(square, -1.0, -1.0, join="miter", join_param=0.1)
    assert len(shrunk) == 1
    assert shapes_area(shrunk) == pytest.approx(64.0, rel=1e-3)


def test_outline_deflate_grows_hole():
    shape = [
        [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)],
        [(5.0, 5.0), (5.0, 15.0), (15.0, 15.0), (15.0, 5.0)],
    ]
    shrunk = outline(shape, -1.0, -1.0, join="miter", join_param=0.1)
    assert len(shrunk) == 1 and len(shrunk[0]) == 2
    # hull 20->18, hole 10->12
    assert shapes_area(shrunk) == pytest.approx(18.0 ** 2 - 12.0 ** 2,
                                                rel=1e-3)


def test_stroke_custom_cap():
    # triangular spear tip: template in local frame (+x out, unit = r)
    tip = [(0.0, -1.0), (1.5, 0.0), (0.0, 1.0)]
    shapes = stroke([[(0.0, 0.0), (10.0, 0.0)]], width=2.0,
                    start_cap="butt", end_cap=tip)
    # band 20 + triangle area (base 2, height 1.5) = 1.5
    assert shapes_area(shapes) == pytest.approx(21.5, rel=1e-3)
