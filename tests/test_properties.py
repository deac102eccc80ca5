"""Property-based tests (hypothesis) — beyond the reference's
hand-built unit matrix (SURVEY §5): geometry invariants that must hold
for ALL inputs, not just the 56 ported cases. Driver-side only (no
Spark session) so hypothesis can run hundreds of examples per second.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from simba_spark.geometry import MBR, Circle, Point, z_value, z_value_inverse

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
pt2 = st.tuples(coord, coord)


def _mbr(lo, hi):
    return MBR(
        Point([min(lo[0], hi[0]), min(lo[1], hi[1])]),
        Point([max(lo[0], hi[0]), max(lo[1], hi[1])]),
    )


@settings(max_examples=300, deadline=None)
@given(pt2, pt2)
def test_point_distance_symmetric_and_nonnegative(a, b):
    pa, pb = Point(list(a)), Point(list(b))
    d1, d2 = pa.min_dist(pb), pb.min_dist(pa)
    assert d1 == d2 >= 0.0
    if a == b:
        assert d1 == 0.0


@settings(max_examples=300, deadline=None)
@given(pt2, pt2, pt2)
def test_triangle_inequality(a, b, c):
    pa, pb, pc = Point(list(a)), Point(list(b)), Point(list(c))
    assert pa.min_dist(pc) <= pa.min_dist(pb) + pb.min_dist(pc) + 1e-6


@settings(max_examples=300, deadline=None)
@given(pt2, pt2, pt2)
def test_mbr_contains_iff_zero_mindist(lo, hi, p):
    box = _mbr(lo, hi)
    pt = Point(list(p))
    inside = box.contains(pt)
    md = box.min_dist(pt)
    assert md >= 0.0
    if inside:
        assert md == 0.0
    if md > 0.0:
        # (the converse 'outside => md > 0' is NOT guaranteed in IEEE
        # doubles: a point 1e-300 outside squares to an underflowed 0)
        assert not inside


@settings(max_examples=300, deadline=None)
@given(pt2, pt2, pt2)
def test_mbr_closed_boundary(lo, hi, p):
    """Corner/edge points are contained (closed faces, MBR.scala:69-76)."""
    box = _mbr(lo, hi)
    assert box.contains(box.low) and box.contains(box.high)
    mid = Point([(box.low.coord[0] + box.high.coord[0]) / 2, box.low.coord[1]])
    assert box.contains(mid)


@settings(max_examples=300, deadline=None)
@given(pt2, st.floats(min_value=0, max_value=1e5, allow_nan=False), pt2)
def test_circle_closed_boundary_consistency(c, r, p):
    """contains ⇔ dist <= r (closed, Circle.scala:69); intersects(point)
    agrees with contains."""
    circ = Circle(Point(list(c)), r)
    pt = Point(list(p))
    d = Point(list(c)).min_dist(pt)
    assert circ.contains(pt) == (d <= r)


@settings(max_examples=300, deadline=None)
@given(pt2, pt2, pt2, pt2)
def test_mbr_intersects_symmetric(a1, a2, b1, b2):
    A, B = _mbr(a1, a2), _mbr(b1, b2)
    assert A.intersects(B) == B.intersects(A)
    assert A.intersects(A)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1), min_size=1, max_size=4),
)
def test_zvalue_roundtrip(coords):
    """Bit-interleave then de-interleave is the identity (ZValue.scala
    analog, 16 bits/dim here)."""
    z = z_value(coords, bits=16)
    back = z_value_inverse(z, dim=len(coords), bits=16)
    assert list(back) == list(coords)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 15) - 2),
    st.integers(min_value=0, max_value=(1 << 15) - 2),
)
def test_zvalue_locality_monotone_on_diagonal(x, y):
    """Increasing both coordinates strictly increases the z-value —
    the monotonicity the z-order layout's range pruning relies on."""
    z1 = z_value([x, y], bits=16)
    z2 = z_value([x + 1, y + 1], bits=16)
    assert z2 > z1
