"""Float facade + vector/contour extraction + decomposition."""

import pytest

from ioverlay_ray.geometry.float_api import (FloatPointAdapter, float_clip_paths,
                                             float_overlay, float_relate,
                                             float_simplify,
                                             float_slice_by_paths)
from ioverlay_ray.geometry.overlay import (decompose_contours,
                                           extract_contours,
                                           extract_separate_vectors,
                                           extract_vectors)


def fsq(x0, y0, x1, y1):
    return [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]


def area(shapes):
    total = 0.0
    for shape in shapes:
        for c in shape:
            for i in range(len(c)):
                x0, y0 = c[i - 1]
                x1, y1 = c[i]
                total += (x0 * y1 - x1 * y0) / 2
    return total


def test_adapter_roundtrip():
    a = FloatPointAdapter.from_contours(fsq(0.0, 0.0, 10.0, 10.0))
    ic = a.to_int_contour([(0.125, 9.875), (3.0, 4.0)])
    back = [a.to_float_point(p) for p in ic]
    for (x, y), (ex, ey) in zip(back, [(0.125, 9.875), (3.0, 4.0)]):
        assert abs(x - ex) < 1e-6 and abs(y - ey) < 1e-6
    assert a.scale == 2 ** int(a.scale).bit_length() - 1 or a.scale > 0


def test_float_overlay_union():
    out = float_overlay(fsq(0.0, 0.0, 1.0, 1.0), fsq(0.5, 0.0, 1.5, 1.0),
                        "union", "nonzero")
    assert len(out) == 1
    assert area(out) == pytest.approx(1.5, abs=1e-6)


def test_float_overlay_fixed_scale_consistency():
    # the same fixed scale across two calls -> identical grids
    a = float_overlay(fsq(0.0, 0.0, 1.0, 1.0), fsq(0.25, 0.25, 0.75, 0.75),
                      "difference", "nonzero", scale=1024.0)
    assert area(a) == pytest.approx(1.0 - 0.25, abs=1e-5)


def test_float_simplify_and_relate():
    # self-overlapping bowtie simplifies into two triangles
    bow = [[(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)]]
    out = float_simplify(bow, "nonzero")
    assert len(out) == 2
    assert float_relate(fsq(0.0, 0.0, 1.0, 1.0), fsq(2.0, 0.0, 3.0, 1.0),
                        "disjoint")
    assert float_relate(fsq(0.0, 0.0, 1.0, 1.0), fsq(0.5, 0.5, 2.0, 2.0),
                        "interiors_intersect")


def test_float_clip_and_slice():
    body = fsq(-1.0, -1.0, 1.0, 1.0)
    clipped = float_clip_paths(body, [[(-2.0, 0.0), (2.0, 0.0)]], "nonzero")
    assert len(clipped) == 1
    (x0, _), (x1, _) = clipped[0][0], clipped[0][-1]
    assert abs(abs(x1 - x0) - 2.0) < 1e-6
    sliced = float_slice_by_paths(body, [[(0.0, -2.0), (0.0, 2.0)]],
                                  "nonzero")
    assert len(sliced) == 2


def test_extract_vectors():
    sq = [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    vecs = extract_vectors(sq, [[(5, 0), (15, 0), (15, 10), (5, 10)]],
                           "intersect", "nonzero")
    assert len(vecs) >= 4
    for ax, ay, bx, by, fill in vecs:
        assert (ax, ay) < (bx, by)     # direction-normalized
        assert 0 < fill < 16           # 4-bit mask
    sep = extract_separate_vectors(sq, [[(5, 0), (15, 0), (15, 10), (5, 10)]])
    assert len(sep) >= len(vecs)


def test_extract_contours_flat():
    outer = [[(0, 0), (30, 0), (30, 30), (0, 30)]]
    inner = [[(10, 10), (20, 10), (20, 20), (10, 20)]]
    flat = extract_contours(outer, inner, "difference", "nonzero")
    assert len(flat) == 2  # hull and hole, unnested


def test_decompose_contours():
    bow = [(0, 0), (2, 2), (2, 0), (0, 2)]
    # the bowtie self-INTERSECTS (no repeated vertex) so it stays one
    # loop here; decomposition splits at repeated POINTS
    # square-ish path visiting (1,1) twice: splits at the repeated point
    touching = [(0, 0), (2, 0), (1, 1), (2, 2), (0, 2), (1, 1)]
    loops = decompose_contours([touching])
    assert len(loops) == 2
    assert sorted(len(l) for l in loops) == [3, 3]
    assert decompose_contours([bow]) == [[(2, 2), (2, 0), (0, 2), (0, 0)]] \
        or len(decompose_contours([bow])) == 1


def test_vector_extraction_subject_square():
    """vector_tests.rs test_0 analog: subject-rule edge extraction of a
    square with an inner clip square yields exactly the 4 outer edges,
    each subject-filled on one side."""
    from ioverlay_ray.geometry.kernel import SUBJ_BOTH
    subj = [[(-10240, -10240), (-10240, 10240), (10240, 10240),
             (10240, -10240)]]
    clip = [[(-5120, -5120), (-5120, 5120), (5120, 5120), (5120, -5120)]]
    vecs = extract_vectors(subj, clip, "subject", "nonzero")
    assert len(vecs) == 4
    pts = set()
    for ax, ay, bx, by, fill in vecs:
        assert (fill & SUBJ_BOTH) in (1, 2)  # boundary, one side filled
        pts.add((ax, ay))
        pts.add((bx, by))
    assert pts == {(-10240, -10240), (-10240, 10240),
                   (10240, 10240), (10240, -10240)}


def test_clean_float_shapes_simplify_and_despike():
    from ioverlay_ray.geometry.float_api import clean_float_shapes
    # collinear midpoint + duplicate + spike in float space
    ring = [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0), (10.0, 10.0),
            (10.0, 10.0), (5.0, 10.0), (5.0, 20.0), (5.0, 10.0),
            (0.0, 10.0)]
    cleaned = clean_float_shapes([[ring]], preserve_collinear=False)
    assert cleaned == [[[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                         (0.0, 10.0)]]]
    # despike-only keeps the collinear midpoint but removes the spike
    despiked = clean_float_shapes([[ring]], preserve_collinear=True)
    assert (5.0, 0.0) in despiked[0][0]
    assert (5.0, 20.0) not in despiked[0][0]
    # hull degenerating to <3 points drops the whole shape
    assert clean_float_shapes([[[(0.0, 0.0), (5.0, 0.0),
                                 (10.0, 0.0)]]], False) == []


def test_float_overlay_clean_result_flag():
    from ioverlay_ray.geometry.float_api import float_overlay
    subj = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]
    a = float_overlay(subj, [], "subject", "nonzero")
    b = float_overlay(subj, [], "subject", "nonzero", clean_result=False)
    assert a == b  # clean output unchanged by the cleaning pass
