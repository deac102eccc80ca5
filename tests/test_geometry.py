"""Geometry unit matrix — ports the reference's scalatest cases
(SURVEY.md §5: PointSuite/MBRSuite/CircleSuite/LineSegmentSuite/
PolygonSuite/DistSuite/ZValueSuite semantics) against our pure-Python
geometry module. Brute-force oracles inline, reference style."""

import math

import pytest

from simba_spark.geometry import (
    MBR,
    Circle,
    Dist,
    LineSegment,
    Point,
    Polygon,
    z_value,
    z_value_inverse,
)


# -- Point (ref: PointSuite) -------------------------------------------------

def test_point_min_dist_euclidean():
    assert Point((0, 0)).min_dist(Point((3, 4))) == 5.0
    assert Point((1, 1)).min_dist(Point((1, 1))) == 0.0


def test_point_ndim():
    p = Point((1, 2, 3, 4))
    q = Point((1, 2, 3, 6))
    assert p.dim == 4
    assert p.min_dist(q) == 2.0


def test_point_dim_mismatch_raises():
    with pytest.raises(AssertionError):
        Point((0, 0)).min_dist(Point((0, 0, 0)))


def test_point_intersects_is_equality():
    assert Point((1.5, 2.5)).intersects(Point((1.5, 2.5)))
    assert not Point((1.5, 2.5)).intersects(Point((1.5, 2.6)))


# -- MBR (ref: MBRSuite) -----------------------------------------------------

def test_mbr_contains_closed_faces():
    box = MBR(Point((0, 0)), Point((10, 10)))
    assert box.contains(Point((0, 0)))      # corner
    assert box.contains(Point((10, 10)))    # corner
    assert box.contains(Point((0, 5)))      # face
    assert box.contains(Point((5, 5)))      # interior
    assert not box.contains(Point((10.0001, 5)))


def test_mbr_intersects_closed():
    a = MBR(Point((0, 0)), Point((1, 1)))
    b = MBR(Point((1, 1)), Point((2, 2)))   # touch at a corner
    c = MBR(Point((1.0001, 1.0001)), Point((2, 2)))
    assert a.intersects(b)
    assert not a.intersects(c)


def test_mbr_min_dist_point():
    box = MBR(Point((0, 0)), Point((10, 10)))
    assert box.min_dist(Point((5, 5))) == 0.0            # inside
    assert box.min_dist(Point((10, 10))) == 0.0          # boundary
    assert box.min_dist(Point((13, 14))) == 5.0          # corner pythagoras
    assert box.min_dist(Point((5, 12))) == 2.0           # face


def test_mbr_min_dist_mbr():
    a = MBR(Point((0, 0)), Point((1, 1)))
    b = MBR(Point((4, 5)), Point((6, 7)))
    assert a.min_dist(b) == 5.0
    assert a.min_dist(MBR(Point((0.5, 0.5)), Point((2, 2)))) == 0.0


def test_mbr_invalid_bounds():
    with pytest.raises(AssertionError):
        MBR(Point((1, 0)), Point((0, 1)))


def test_mbr_union_area_centroid():
    a = MBR(Point((0, 0)), Point((1, 1)))
    b = MBR(Point((2, 2)), Point((3, 4)))
    u = a.union(b)
    assert u.low.coord == (0, 0) and u.high.coord == (3, 4)
    assert a.area() == 1.0 and b.area() == 2.0
    assert u.centroid.coord == (1.5, 2.0)


# -- Circle (ref: CircleSuite) -----------------------------------------------

def test_circle_contains_closed_boundary():
    c = Circle(Point((0, 0)), 5.0)
    assert c.contains(Point((3, 4)))     # exactly on boundary: dist == 5
    assert c.contains(Point((0, 0)))
    assert not c.contains(Point((3.0001, 4)))


def test_circle_intersects_mbr():
    c = Circle(Point((0, 0)), 5.0)
    assert c.intersects(MBR(Point((3, 4)), Point((9, 9))))   # corner on rim
    assert c.intersects(MBR(Point((-1, -1)), Point((1, 1)))) # circle covers box
    assert not c.intersects(MBR(Point((4, 4)), Point((9, 9))))


def test_circle_circle():
    a = Circle(Point((0, 0)), 2.0)
    b = Circle(Point((5, 0)), 3.0)       # touching: dist == r1 + r2
    assert a.intersects(b)
    assert a.min_dist(b) == 0.0
    assert not a.intersects(Circle(Point((5.001, 0)), 3.0))


def test_circle_mbr_of():
    c = Circle(Point((1, 2)), 3.0)
    assert c.get_mbr().low.coord == (-2, -1)
    assert c.get_mbr().high.coord == (4, 5)


# -- LineSegment (ref: LineSegmentSuite) -------------------------------------

def test_segment_crossing():
    a = LineSegment(Point((0, 0)), Point((2, 2)))
    b = LineSegment(Point((0, 2)), Point((2, 0)))
    assert a.intersects(b)
    assert a.min_dist(b) == 0.0


def test_segment_touching_endpoint():
    a = LineSegment(Point((0, 0)), Point((1, 1)))
    b = LineSegment(Point((1, 1)), Point((2, 0)))
    assert a.intersects(b)


def test_segment_collinear_overlap_and_disjoint():
    a = LineSegment(Point((0, 0)), Point((2, 0)))
    b = LineSegment(Point((1, 0)), Point((3, 0)))
    c = LineSegment(Point((3, 0)), Point((4, 0)))
    assert a.intersects(b)
    assert not a.intersects(c)
    assert a.min_dist(c) == 1.0


def test_segment_point_dist():
    s = LineSegment(Point((0, 0)), Point((10, 0)))
    assert s.min_dist(Point((5, 3))) == 3.0
    assert s.min_dist(Point((-3, 4))) == 5.0      # beyond endpoint
    assert s.min_dist(Point((7, 0))) == 0.0       # on segment


def test_segment_mbr_intersect():
    s = LineSegment(Point((0, 0)), Point((10, 10)))
    assert s.intersects(MBR(Point((4, 4)), Point((6, 6))))
    assert not s.intersects(MBR(Point((6, 0)), Point((10, 4))))


# -- Polygon (ref: PolygonSuite) ---------------------------------------------

SQUARE = Polygon([Point((0, 0)), Point((4, 0)), Point((4, 4)), Point((0, 4))])
CONCAVE = Polygon(
    [Point((0, 0)), Point((4, 0)), Point((4, 4)), Point((2, 1)), Point((0, 4))]
)


def test_polygon_contains_boundary_inclusive():
    assert SQUARE.contains(Point((2, 2)))
    assert SQUARE.contains(Point((0, 0)))     # vertex
    assert SQUARE.contains(Point((4, 2)))     # edge
    assert not SQUARE.contains(Point((4.001, 2)))


def test_polygon_concave_notch():
    assert not CONCAVE.contains(Point((2, 3)))   # inside the notch = outside
    assert CONCAVE.contains(Point((2, 0.5)))


def test_polygon_min_dist():
    assert SQUARE.min_dist(Point((2, 2))) == 0.0
    assert SQUARE.min_dist(Point((7, 8))) == 5.0


def test_polygon_segment_polygon():
    cut = LineSegment(Point((-1, 2)), Point((5, 2)))
    away = LineSegment(Point((-3, -3)), Point((-1, -1)))
    assert SQUARE.intersects(cut)
    assert not SQUARE.intersects(away)


def test_polygon_polygon():
    other = Polygon([Point((3, 3)), Point((6, 3)), Point((6, 6)), Point((3, 6))])
    far = Polygon([Point((10, 10)), Point((11, 10)), Point((10, 11))])
    assert SQUARE.intersects(other)
    assert not SQUARE.intersects(far)


def test_polygon_mbr():
    assert SQUARE.get_mbr().low.coord == (0, 0)
    assert SQUARE.get_mbr().high.coord == (4, 4)


# -- Dist (ref: DistSuite) ---------------------------------------------------

def test_dist_furthest_corner():
    box = MBR(Point((0, 0)), Point((2, 2)))
    assert Dist.furthest(Point((-1, -1)), box) == math.sqrt(18)
    assert Dist.furthest(Point((1, 1)), box) == math.sqrt(2)


# -- ZValue (ref: ZValueSuite) -----------------------------------------------

def test_z_value_roundtrip():
    for coords in [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 511), (2**20 - 1, 1)]:
        z = z_value(coords)
        assert z_value_inverse(z, 2) == coords


def test_z_value_interleave_order():
    # (1,0) -> bit 0 of dim 0 -> z=1; (0,1) -> bit 0 of dim 1 -> z=2
    assert z_value((1, 0)) == 1
    assert z_value((0, 1)) == 2
    assert z_value((1, 1)) == 3
    assert z_value((2, 0)) == 4


def test_z_value_locality():
    # nearby cells share high-order prefixes more than distant ones
    near = z_value((100, 100)) ^ z_value((101, 100))
    far = z_value((100, 100)) ^ z_value((900, 900))
    assert near.bit_length() < far.bit_length()


# -- diamond-grid brute-force range/kNN (ref: RTreeSuite.scala:27-59) --------

DIAMOND = [
    Point((float(i), float(j)))
    for i in range(-10, 11)
    for j in range(-10, 11)
    if abs(i) + abs(j) <= 10
]


def test_diamond_grid_count():
    assert len(DIAMOND) == 221


def test_diamond_range_query_brute_force():
    box = MBR(Point((-5, -5)), Point((5, 5)))
    hits = [p for p in DIAMOND if box.contains(p)]
    oracle = sum(
        1
        for i in range(-10, 11)
        for j in range(-10, 11)
        if abs(i) + abs(j) <= 10 and -5 <= i <= 5 and -5 <= j <= 5
    )
    assert len(hits) == oracle
    assert all(box.contains(p) for p in hits)


def test_diamond_circle_closed_boundary():
    c = Circle(Point((0, 0)), 5.0)
    hits = [p for p in DIAMOND if c.contains(p)]
    # points at exactly distance 5 (e.g. (3,4), (5,0)) must be included
    assert Point((3.0, 4.0)) in hits
    assert Point((5.0, 0.0)) in hits
    assert all(p[0] ** 2 + p[1] ** 2 <= 25.0 for p in hits)


def test_diamond_knn_vs_sort():
    q = Point((0.5, 0.5))
    by_dist = sorted(DIAMOND, key=lambda p: (p.min_dist(q), p.coord))
    k = 7
    knn = by_dist[:k]
    assert len(knn) == k
    kth = knn[-1].min_dist(q)
    # no non-selected point is strictly closer than the kth selected
    assert all(p.min_dist(q) >= kth for p in by_dist[k:])
