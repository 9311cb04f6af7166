"""Spatial predicate semantics (core/predicate.rs handler definitions)."""

from ioverlay_ray.geometry.relate import Relation, relate


def rect(x0, y0, x1, y1):
    return [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]


def test_overlapping():
    r = Relation(rect(0, 0, 10, 10), rect(5, 5, 15, 15))
    assert r.intersects()
    assert r.interiors_intersect()
    assert not r.touches()
    assert not r.within()
    assert not r.disjoint()


def test_edge_touch():
    r = Relation(rect(0, 0, 10, 10), rect(10, 0, 20, 10))
    assert r.intersects()
    assert not r.interiors_intersect()
    assert r.touches()
    assert not r.point_intersects()  # shared edge, not point-only


def test_vertex_touch():
    r = Relation(rect(0, 0, 10, 10), rect(10, 10, 20, 20))
    assert r.intersects()
    assert not r.interiors_intersect()
    assert r.touches()
    assert r.point_intersects()


def test_disjoint():
    r = Relation(rect(0, 0, 10, 10), rect(20, 20, 30, 30))
    assert r.disjoint()
    assert not r.intersects()
    assert not r.touches()


def test_within_and_covers():
    inner = rect(2, 2, 8, 8)
    outer = rect(0, 0, 10, 10)
    assert relate(inner, outer, "within")
    assert not relate(outer, inner, "within")
    assert relate(outer, inner, "covers")
    assert not relate(inner, outer, "covers")
    # within allows shared boundary
    assert relate(rect(0, 0, 5, 10), outer, "within")


def test_empty_subject_not_within():
    r = Relation([], rect(0, 0, 10, 10))
    assert not r.within()
    assert not r.covers()  # empty subject cannot cover a nonempty clip
    assert not r.intersects()


def test_triangle_cross():
    tri = [[(0, 0), (20, 0), (10, 15)]]
    assert relate(tri, rect(5, 2, 15, 6), "interiors_intersect")
    assert relate(rect(5, 2, 9, 5), tri, "within")
