"""Pure-Python geometry core for simba-pyspark.

Reproduces the geometry *semantics* of the reference engine
(InitialDLab/Simba) — see SURVEY.md §1.5 for the contract:

- ``Point.min_dist(Point)``   = Euclidean L2            (ref: Point.scala:53-59)
- ``MBR.contains(Point)``     closed on all faces        (ref: MBR.scala:69-76)
- ``MBR.intersects(MBR)``     closed                     (ref: MBR.scala:60-67)
- ``MBR.min_dist(Point)``     distance to nearest face, 0 inside
                                                        (ref: MBR.scala:78-89)
- ``Circle.contains(p)``      iff dist(center,p) <= r — closed boundary
                                                        (ref: Circle.scala:69)
- ``Dist.furthest(p, mbr)``   max distance to MBR corners (ref: Dist.scala:24-34)
- z-value bit interleaving                              (ref: ZValue.scala:24-64)

These objects are *driver-side* helpers (partition-bounds math, layout
pruning, literal query shapes). The hot path on executors is Column
arithmetic built in :mod:`simba_spark.functions`, never these classes.

This is an original implementation against the public semantics table;
no reference code is copied.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterable, Sequence


class Shape:
    """Base for geometric shapes; N-dimensional unless noted."""

    def intersects(self, other: "Shape") -> bool:
        raise NotImplementedError

    def min_dist(self, other: "Shape") -> float:
        raise NotImplementedError

    def get_mbr(self) -> "MBR":
        raise NotImplementedError


@dataclass(frozen=True)
class Point(Shape):
    """N-dimensional point with double coordinates (ref: Point.scala:28-29)."""

    coord: tuple

    def __init__(self, coord: Iterable[float]):
        object.__setattr__(self, "coord", tuple(float(c) for c in coord))

    @property
    def dim(self) -> int:
        return len(self.coord)

    def __getitem__(self, i: int) -> float:
        return self.coord[i]

    def min_dist(self, other: Shape) -> float:
        if isinstance(other, Point):
            assert self.dim == other.dim, "dimension mismatch"
            return math.sqrt(
                sum((a - b) * (a - b) for a, b in zip(self.coord, other.coord))
            )
        if isinstance(other, (MBR, Circle, LineSegment, Polygon)):
            return other.min_dist(self)
        raise TypeError(type(other))

    def intersects(self, other: Shape) -> bool:
        if isinstance(other, Point):
            return self.coord == other.coord
        return other.intersects(self)

    def get_mbr(self) -> "MBR":
        return MBR(self, self)

    def shift(self, offsets: Sequence[float]) -> "Point":
        return Point(tuple(a + b for a, b in zip(self.coord, offsets)))


@dataclass(frozen=True)
class MBR(Shape):
    """Axis-aligned minimum bounding rectangle, closed on all faces
    (ref: MBR.scala:60-89)."""

    low: Point
    high: Point

    def __post_init__(self):
        assert self.low.dim == self.high.dim, "dimension mismatch"
        assert all(
            l <= h for l, h in zip(self.low.coord, self.high.coord)
        ), "MBR low must be <= high on every axis"

    @property
    def dim(self) -> int:
        return self.low.dim

    @property
    def centroid(self) -> Point:
        return Point(
            tuple((l + h) / 2.0 for l, h in zip(self.low.coord, self.high.coord))
        )

    def contains(self, p: Point) -> bool:
        """Closed on all faces: boundary points are contained."""
        return all(
            l <= c <= h
            for l, c, h in zip(self.low.coord, p.coord, self.high.coord)
        )

    def intersects(self, other: Shape) -> bool:
        if isinstance(other, Point):
            return self.contains(other)
        if isinstance(other, MBR):
            # closed intervals overlap iff low_i <= other.high_i and
            # high_i >= other.low_i on every axis
            return all(
                sl <= oh and sh >= ol
                for sl, sh, ol, oh in zip(
                    self.low.coord, self.high.coord,
                    other.low.coord, other.high.coord,
                )
            )
        if isinstance(other, (Circle, LineSegment, Polygon)):
            return other.intersects(self)
        raise TypeError(type(other))

    def min_dist(self, other: Shape) -> float:
        if isinstance(other, Point):
            # per-axis distance to nearest face; 0 if inside (closed)
            s = 0.0
            for l, c, h in zip(self.low.coord, other.coord, self.high.coord):
                if c < l:
                    s += (l - c) * (l - c)
                elif c > h:
                    s += (c - h) * (c - h)
            return math.sqrt(s)
        if isinstance(other, MBR):
            s = 0.0
            for sl, sh, ol, oh in zip(
                self.low.coord, self.high.coord, other.low.coord, other.high.coord
            ):
                if sh < ol:
                    s += (ol - sh) * (ol - sh)
                elif oh < sl:
                    s += (sl - oh) * (sl - oh)
            return math.sqrt(s)
        return other.min_dist(self)

    def get_mbr(self) -> "MBR":
        return self

    def area(self) -> float:
        out = 1.0
        for l, h in zip(self.low.coord, self.high.coord):
            out *= h - l
        return out

    def union(self, other: "MBR") -> "MBR":
        return MBR(
            Point(tuple(min(a, b) for a, b in zip(self.low.coord, other.low.coord))),
            Point(tuple(max(a, b) for a, b in zip(self.high.coord, other.high.coord))),
        )

    def corners(self):
        """All 2^d corner points (used by Dist.furthest)."""
        d = self.dim
        for mask in range(1 << d):
            yield Point(
                tuple(
                    self.high.coord[i] if (mask >> i) & 1 else self.low.coord[i]
                    for i in range(d)
                )
            )


@dataclass(frozen=True)
class Circle(Shape):
    """d-dim ball; boundary is closed: contains(p) iff dist <= r
    (ref: Circle.scala:69)."""

    center: Point
    radius: float

    def contains(self, p: Point) -> bool:
        return self.center.min_dist(p) <= self.radius

    def intersects(self, other: Shape) -> bool:
        if isinstance(other, Point):
            return self.contains(other)
        if isinstance(other, MBR):
            return other.min_dist(self.center) <= self.radius
        if isinstance(other, Circle):
            return (
                self.center.min_dist(other.center) <= self.radius + other.radius
            )
        if isinstance(other, (LineSegment, Polygon)):
            return other.min_dist(self.center) <= self.radius
        raise TypeError(type(other))

    def min_dist(self, other: Shape) -> float:
        if isinstance(other, Point):
            return max(0.0, self.center.min_dist(other) - self.radius)
        if isinstance(other, MBR):
            return max(0.0, other.min_dist(self.center) - self.radius)
        if isinstance(other, Circle):
            return max(
                0.0,
                self.center.min_dist(other.center) - self.radius - other.radius,
            )
        if isinstance(other, (LineSegment, Polygon)):
            # dist(ball, S) = max(0, dist(center, S) - r); dispatching
            # back to other.min_dist(self) would mutually recurse
            return max(0.0, other.min_dist(self.center) - self.radius)
        raise TypeError(type(other))

    def get_mbr(self) -> MBR:
        return MBR(
            Point(tuple(c - self.radius for c in self.center.coord)),
            Point(tuple(c + self.radius for c in self.center.coord)),
        )


@dataclass(frozen=True)
class LineSegment(Shape):
    """2-D line segment (ref: LineSegment.scala:26-30; 2-D only)."""

    start: Point
    end: Point

    def __post_init__(self):
        assert self.start.dim == 2 and self.end.dim == 2, "LineSegment is 2-D only"

    def min_dist(self, other: Shape) -> float:
        if isinstance(other, Point):
            return _point_segment_dist(other, self.start, self.end)
        if isinstance(other, LineSegment):
            if self.intersects(other):
                return 0.0
            return min(
                _point_segment_dist(self.start, other.start, other.end),
                _point_segment_dist(self.end, other.start, other.end),
                _point_segment_dist(other.start, self.start, self.end),
                _point_segment_dist(other.end, self.start, self.end),
            )
        if isinstance(other, MBR):
            if self.intersects(other):
                return 0.0
            corners = list(other.corners())
            # 2-D MBR edges
            c00, c10, c01, c11 = corners[0], corners[1], corners[2], corners[3]
            edges = [(c00, c10), (c00, c01), (c10, c11), (c01, c11)]
            return min(
                LineSegment(a, b).min_dist(self) for a, b in edges
            )
        return other.min_dist(self)

    def intersects(self, other: Shape) -> bool:
        if isinstance(other, Point):
            return _point_segment_dist(other, self.start, self.end) == 0.0
        if isinstance(other, LineSegment):
            return _segments_intersect(self.start, self.end, other.start, other.end)
        if isinstance(other, MBR):
            if other.contains(self.start) or other.contains(self.end):
                return True
            corners = list(other.corners())
            c00, c10, c01, c11 = corners[0], corners[1], corners[2], corners[3]
            edges = [(c00, c10), (c00, c01), (c10, c11), (c01, c11)]
            return any(
                _segments_intersect(self.start, self.end, a, b) for a, b in edges
            )
        return other.intersects(self)

    def get_mbr(self) -> MBR:
        return MBR(
            Point(
                (min(self.start[0], self.end[0]), min(self.start[1], self.end[1]))
            ),
            Point(
                (max(self.start[0], self.end[0]), max(self.start[1], self.end[1]))
            ),
        )


@dataclass(frozen=True)
class Polygon(Shape):
    """2-D simple polygon, point-in-polygon boundary-inclusive
    (ref: Polygon.scala:32 wraps JTS; we hand-roll ray casting +
    edge distance — shapely is optional and gated behind import-try)."""

    vertices: tuple  # tuple[Point, ...]; closed ring not required

    def __init__(self, vertices: Iterable[Point]):
        vs = tuple(
            v if isinstance(v, Point) else Point(v) for v in vertices
        )
        if len(vs) >= 2 and vs[0].coord == vs[-1].coord:
            vs = vs[:-1]
        assert len(vs) >= 3, "polygon needs >= 3 distinct vertices"
        assert all(v.dim == 2 for v in vs), "Polygon is 2-D only"
        object.__setattr__(self, "vertices", vs)

    def _edges(self):
        vs = self.vertices
        n = len(vs)
        for i in range(n):
            yield vs[i], vs[(i + 1) % n]

    def contains(self, p: Point) -> bool:
        # boundary-inclusive point-in-polygon (ray casting + on-edge check)
        for a, b in self._edges():
            if _point_segment_dist(p, a, b) == 0.0:
                return True
        inside = False
        x, y = p[0], p[1]
        for a, b in self._edges():
            x1, y1, x2, y2 = a[0], a[1], b[0], b[1]
            if (y1 > y) != (y2 > y):
                xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                if x < xin:
                    inside = not inside
        return inside

    def min_dist(self, other: Shape) -> float:
        if isinstance(other, Point):
            if self.contains(other):
                return 0.0
            return min(
                _point_segment_dist(other, a, b) for a, b in self._edges()
            )
        if isinstance(other, LineSegment):
            if self.contains(other.start) or self.contains(other.end):
                return 0.0
            return min(
                LineSegment(a, b).min_dist(other) for a, b in self._edges()
            )
        if isinstance(other, MBR):
            if self.intersects(other):
                return 0.0
            corners = list(other.corners())
            c00, c10, c01, c11 = corners[0], corners[1], corners[2], corners[3]
            return min(
                LineSegment(a, b).min_dist(LineSegment(c, d))
                for a, b in self._edges()
                for c, d in [(c00, c10), (c00, c01), (c10, c11), (c01, c11)]
            )
        if isinstance(other, Polygon):
            if self.intersects(other):
                return 0.0
            return min(
                LineSegment(a, b).min_dist(LineSegment(c, d))
                for a, b in self._edges()
                for c, d in other._edges()
            )
        return other.min_dist(self)

    def intersects(self, other: Shape) -> bool:
        if isinstance(other, Point):
            return self.contains(other)
        if isinstance(other, LineSegment):
            if self.contains(other.start) or self.contains(other.end):
                return True
            return any(
                _segments_intersect(a, b, other.start, other.end)
                for a, b in self._edges()
            )
        if isinstance(other, MBR):
            if any(other.contains(v) for v in self.vertices):
                return True
            corners = list(other.corners())
            if any(self.contains(c) for c in corners):
                return True
            c00, c10, c01, c11 = corners[0], corners[1], corners[2], corners[3]
            edges = [(c00, c10), (c00, c01), (c10, c11), (c01, c11)]
            return any(
                _segments_intersect(a, b, c, d)
                for a, b in self._edges()
                for c, d in edges
            )
        if isinstance(other, Polygon):
            if any(self.contains(v) for v in other.vertices):
                return True
            if any(other.contains(v) for v in self.vertices):
                return True
            return any(
                _segments_intersect(a, b, c, d)
                for a, b in self._edges()
                for c, d in other._edges()
            )
        return other.intersects(self)

    def get_mbr(self) -> MBR:
        xs = [v[0] for v in self.vertices]
        ys = [v[1] for v in self.vertices]
        return MBR(Point((min(xs), min(ys))), Point((max(xs), max(ys))))


# ---------------------------------------------------------------------------
# distance / intersection helpers


def _point_segment_dist(p: Point, a: Point, b: Point) -> float:
    ax, ay, bx, by, px, py = a[0], a[1], b[0], b[1], p[0], p[1]
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    if seg2 == 0.0:
        return math.hypot(px - ax, py - ay)
    t = ((px - ax) * dx + (py - ay) * dy) / seg2
    t = max(0.0, min(1.0, t))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _orient(a: Point, b: Point, c: Point) -> int:
    v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    if v > 0:
        return 1
    if v < 0:
        return -1
    return 0


def _on_segment(a: Point, b: Point, c: Point) -> bool:
    """c collinear with a-b: is c within the closed bounding box of a-b?"""
    return (
        min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
    )


def _segments_intersect(p1: Point, p2: Point, q1: Point, q2: Point) -> bool:
    """Closed-segment intersection (touching endpoints count)."""
    o1 = _orient(p1, p2, q1)
    o2 = _orient(p1, p2, q2)
    o3 = _orient(q1, q2, p1)
    o4 = _orient(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_segment(p1, p2, q1):
        return True
    if o2 == 0 and _on_segment(p1, p2, q2):
        return True
    if o3 == 0 and _on_segment(q1, q2, p1):
        return True
    if o4 == 0 and _on_segment(q1, q2, p2):
        return True
    return False


class Dist:
    """Distance utilities (ref: spatial/Dist.scala:24-34)."""

    @staticmethod
    def furthest(p: Point, mbr: MBR) -> float:
        """Max distance from p to any point of the MBR = max over corners.
        Used for 'partition fully covered by circle' tests."""
        return max(p.min_dist(c) for c in mbr.corners())


# ---------------------------------------------------------------------------
# z-order curve (ref: spatial/ZValue.scala:24-64)


def z_value(coords: Sequence[int], bits: int = 21) -> int:
    """Interleave the low `bits` bits of non-negative int coords into one
    int (dimension-major, bit j of coord i lands at position j*d + i).

    Equivalent-but-not-bit-compatible with the reference curve: the
    reference interleaves with coord 0 most significant within each bit
    group (ref: ZValue.scala:24-64); ours puts coord 0 least significant.
    Both are valid Morton orders with identical locality properties —
    the choice only matters if z-values were exchanged between engines,
    which they never are (the key is internal to a layout)."""
    d = len(coords)
    out = 0
    for j in range(bits):
        for i in range(d):
            out |= ((coords[i] >> j) & 1) << (j * d + i)
    return out


def z_value_inverse(z: int, dim: int, bits: int = 21):
    coords = [0] * dim
    for j in range(bits):
        for i in range(dim):
            coords[i] |= ((z >> (j * dim + i)) & 1) << j
    return tuple(coords)
