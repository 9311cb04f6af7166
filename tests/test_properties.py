"""Property-based invariants over random geometry (the analog of the
reference's randomized dynamic_tests.rs sweeps)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ioverlay_ray.geometry.overlay import overlay, overlay_all
from ioverlay_ray.stages.geo_arrow import shapes_area2


def rect(x0, y0, w, h):
    return [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]


rects = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500),
              st.integers(1, 120), st.integers(1, 120)),
    min_size=1, max_size=6)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(rects, rects)
def test_inclusion_exclusion(subj_r, clip_r):
    """area(union) + area(intersect) == area(subj region) + area(clip
    region) — holds for any inputs after self-union."""
    subj = [rect(*r) for r in subj_r]
    clip = [rect(*r) for r in clip_r]
    res = overlay_all(subj, clip, "nonzero",
                      rules=["subject", "clip", "union", "intersect",
                             "difference", "xor"])
    a = {k: shapes_area2(v) for k, v in res.items()}
    assert a["union"] + a["intersect"] == a["subject"] + a["clip"]
    assert a["difference"] == a["subject"] - a["intersect"]
    assert a["xor"] == a["union"] - a["intersect"]


@settings(max_examples=40, deadline=None, derandomize=True)
@given(rects)
def test_union_idempotent(rs):
    subj = [rect(*r) for r in rs]
    once = overlay(subj, [], "subject", "nonzero")
    flat = [c for s in once for c in s]
    twice = overlay(flat, [], "subject", "nonzero")
    assert shapes_area2(once) == shapes_area2(twice)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(rects, rects)
def test_intersect_commutes(subj_r, clip_r):
    subj = [rect(*r) for r in subj_r]
    clip = [rect(*r) for r in clip_r]
    ab = overlay(subj, clip, "intersect", "nonzero")
    ba = overlay(clip, subj, "intersect", "nonzero")
    assert shapes_area2(ab) == shapes_area2(ba)


triangles = st.lists(
    st.tuples(st.integers(0, 400), st.integers(0, 400),
              st.integers(1, 150), st.integers(1, 150)),
    min_size=1, max_size=4)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(triangles, triangles)
def test_triangle_identities(ts, cs):
    subj = [[(x, y), (x + w, y), (x, y + h)] for x, y, w, h in ts]
    clip = [[(x, y), (x + w, y + h), (x, y + h)] for x, y, w, h in cs]
    res = overlay_all(subj, clip, "evenodd",
                      rules=["subject", "clip", "union", "intersect"])
    a = {k: shapes_area2(v) for k, v in res.items()}
    assert a["union"] + a["intersect"] == a["subject"] + a["clip"]
    assert a["union"] >= max(a["subject"], a["clip"])


@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.integers(4, 16), st.integers(0, 359), st.integers(50, 400))
def test_dynamic_star_union(corners, angle_deg, radius):
    """Rotating/scaling star sweep (the dynamic_tests.rs analog):
    subject star union clip star is never empty and hulls come out CCW."""
    import math
    from ioverlay_ray.geometry.overlay import overlay

    def star(cx, cy, r0, r1, n, rot):
        pts = []
        for i in range(2 * n):
            r = r0 if i % 2 == 0 else r1
            a = rot + math.pi * i / n
            pts.append((cx + int(r * math.cos(a)),
                        cy + int(r * math.sin(a))))
        return pts

    rot = math.radians(angle_deg)
    subj = [star(0, 0, radius, radius // 2, corners, rot)]
    clip = [star(radius // 3, 0, radius, radius // 2, corners, -rot)]
    out = overlay(subj, clip, "union", "nonzero")
    assert out
    for shape in out:
        a2 = sum(shape[0][i - 1][0] * shape[0][i][1]
                 - shape[0][i][0] * shape[0][i - 1][1]
                 for i in range(len(shape[0])))
        assert a2 > 0  # hull CCW
