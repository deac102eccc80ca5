"""Shape-column predicate tests: the distributed Column-arithmetic
predicates must agree row-for-row with the driver-side geometry module
(which itself is pinned to the reference semantics by test_geometry.py's
ported unit matrix) on randomized shapes, including touching boundaries."""

import random

import pytest
from pyspark.sql import functions as F

from simba_spark.geometry import MBR, Circle, LineSegment, Point


def _mk_segments(spark, n=300, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x1, y1 = rng.uniform(-10, 10), rng.uniform(-10, 10)
        x2, y2 = x1 + rng.uniform(-6, 6), y1 + rng.uniform(-6, 6)
        rows.append((i, x1, y1, x2, y2))
    # degenerate (zero-length) segments too
    rows.append((n, 1.5, 1.5, 1.5, 1.5))
    rows.append((n + 1, 0.0, 5.0, 0.0, 5.0))
    return spark.createDataFrame(
        rows, "id long, x1 double, y1 double, x2 double, y2 double"
    )


def _mk_boxes(spark, n=300, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        xlo, ylo = rng.uniform(-10, 10), rng.uniform(-10, 10)
        rows.append((i, xlo, ylo, xlo + rng.uniform(0, 5), ylo + rng.uniform(0, 5)))
    return spark.createDataFrame(
        rows, "id long, xlo double, ylo double, xhi double, yhi double"
    )


BOX_LO, BOX_HI = (-2.0, -1.0), (3.0, 4.0)
CENTER, RADIUS = (1.0, 1.0), 2.5


def test_segment_box_predicate_matches_geometry(spark):
    from simba_spark.operators.shapes import segment_intersects_box, segment_struct

    df = _mk_segments(spark).withColumn(
        "seg", segment_struct("x1", "y1", "x2", "y2")
    )
    got = {
        r.id: r.hit
        for r in df.select(
            "id", segment_intersects_box("seg", BOX_LO, BOX_HI).alias("hit")
        ).collect()
    }
    box = MBR(Point((BOX_LO[0], BOX_LO[1])), Point((BOX_HI[0], BOX_HI[1])))
    for r in df.select("id", "x1", "y1", "x2", "y2").collect():
        seg = LineSegment(Point((r.x1, r.y1)), Point((r.x2, r.y2)))
        assert got[r.id] == seg.intersects(box), (r.id, r)


def test_segment_circle_predicate_matches_geometry(spark):
    from simba_spark.operators.shapes import segment_intersects_circle, segment_struct

    df = _mk_segments(spark).withColumn(
        "seg", segment_struct("x1", "y1", "x2", "y2")
    )
    got = {
        r.id: r.hit
        for r in df.select(
            "id", segment_intersects_circle("seg", CENTER, RADIUS).alias("hit")
        ).collect()
    }
    for r in df.select("id", "x1", "y1", "x2", "y2").collect():
        seg = LineSegment(Point((r.x1, r.y1)), Point((r.x2, r.y2)))
        expect = seg.min_dist(Point(CENTER)) <= RADIUS
        assert got[r.id] == expect, (r.id, r)


def test_mbr_box_predicate_matches_geometry(spark):
    from simba_spark.operators.shapes import mbr_intersects_box, mbr_struct

    df = _mk_boxes(spark).withColumn(
        "box", mbr_struct(["xlo", "ylo"], ["xhi", "yhi"])
    )
    got = {
        r.id: r.hit
        for r in df.select(
            "id", mbr_intersects_box("box", BOX_LO, BOX_HI).alias("hit")
        ).collect()
    }
    qbox = MBR(Point(BOX_LO), Point(BOX_HI))
    for r in df.select("id", "xlo", "ylo", "xhi", "yhi").collect():
        b = MBR(Point((r.xlo, r.ylo)), Point((r.xhi, r.yhi)))
        assert got[r.id] == b.intersects(qbox), (r.id, r)


def test_mbr_circle_predicate_matches_geometry(spark):
    from simba_spark.operators.shapes import mbr_intersects_circle, mbr_struct

    df = _mk_boxes(spark).withColumn(
        "box", mbr_struct(["xlo", "ylo"], ["xhi", "yhi"])
    )
    got = {
        r.id: r.hit
        for r in df.select(
            "id", mbr_intersects_circle("box", CENTER, RADIUS).alias("hit")
        ).collect()
    }
    for r in df.select("id", "xlo", "ylo", "xhi", "yhi").collect():
        b = MBR(Point((r.xlo, r.ylo)), Point((r.xhi, r.yhi)))
        expect = b.min_dist(Point(CENTER)) <= RADIUS
        assert got[r.id] == expect, (r.id, r)


def test_touching_boundary_is_closed(spark):
    """Closed-boundary contract (SURVEY §1.5): shapes that merely touch
    the query boundary must match."""
    from simba_spark.operators.shapes import (
        mbr_intersects_box,
        mbr_struct,
        segment_intersects_box,
        segment_struct,
    )

    # segment touching the box corner (3, 4) exactly
    seg = spark.createDataFrame(
        [(0, 3.0, 4.0, 6.0, 8.0)], "id long, x1 double, y1 double, x2 double, y2 double"
    ).withColumn("seg", segment_struct("x1", "y1", "x2", "y2"))
    assert seg.filter(segment_intersects_box("seg", BOX_LO, BOX_HI)).count() == 1
    # box sharing only the edge x = 3
    box = spark.createDataFrame(
        [(0, 3.0, 0.0, 5.0, 2.0)], "id long, xlo double, ylo double, xhi double, yhi double"
    ).withColumn("box", mbr_struct(["xlo", "ylo"], ["xhi", "yhi"]))
    assert box.filter(mbr_intersects_box("box", BOX_LO, BOX_HI)).count() == 1


def test_segments_intersect_matches_geometry(spark):
    """Distributed segment-segment intersection must agree with the
    driver-side geometry module on randomized pairs from a small integer
    grid (ties, collinear overlaps, shared endpoints, and degenerate
    zero-length segments are the norm there)."""
    import random

    from pyspark.sql import functions as F

    from simba_spark.geometry import LineSegment, Point
    from simba_spark.operators.shapes import segment_struct, segments_intersect

    rng = random.Random(17)
    rows = []
    for i in range(300):
        g = lambda: float(rng.randint(0, 4))
        rows.append((i, g(), g(), g(), g(), g(), g(), g(), g()))
    df = spark.createDataFrame(
        rows,
        "i long, ax1 double, ay1 double, ax2 double, ay2 double, "
        "bx1 double, by1 double, bx2 double, by2 double",
    )
    out = df.select(
        "i",
        segments_intersect(
            segment_struct("ax1", "ay1", "ax2", "ay2"),
            segment_struct("bx1", "by1", "bx2", "by2"),
        ).alias("hit"),
    )
    got = {r.i: r.hit for r in out.collect()}
    for r in rows:
        i, ax1, ay1, ax2, ay2, bx1, by1, bx2, by2 = r
        want = LineSegment(Point((ax1, ay1)), Point((ax2, ay2))).intersects(
            LineSegment(Point((bx1, by1)), Point((bx2, by2)))
        )
        assert got[i] == want, (r, got[i], want)


def test_circle_rows_box_and_circle_match_geometry_oracle(spark):
    """Circle-valued rows (ShapeType tag 2 analog): closed
    circle-vs-box and circle-vs-ball intersection must agree with the
    driver-side geometry Circle oracle, touching cases included."""
    import random

    from simba_spark.geometry import MBR, Circle, Point
    from simba_spark.operators.shapes import (
        circle_struct,
        shape_circle_range,
        shape_range,
    )

    rng = random.Random(37)
    rows = [
        (i, rng.uniform(0, 100), rng.uniform(0, 100), rng.uniform(0.1, 15))
        for i in range(800)
    ]
    rows.append((800, 30.0, 50.0, 10.0))   # touches box edge x=40 exactly
    rows.append((801, 50.0, 70.0, 5.0))    # touches query ball exactly
                                           # (dist 20 == 5 + 15)
    df = spark.createDataFrame(rows, "id long, cx double, cy double, r double")
    df = df.withColumn("circ", circle_struct(["cx", "cy"], "r"))

    low, high = (40.0, 40.0), (60.0, 60.0)
    got_box = sorted(
        r_.id for r_ in shape_range(df, "circ", low, high, kind="circle").collect()
    )
    box = MBR(Point(low), Point(high))
    exp_box = sorted(
        i for i, cx, cy, r in rows if Circle(Point((cx, cy)), r).intersects(box)
    )
    assert got_box == exp_box and 800 in got_box

    center, qr = (70.0, 70.0), 15.0
    got_c = sorted(
        r_.id
        for r_ in shape_circle_range(df, "circ", center, qr, kind="circle").collect()
    )
    exp_c = sorted(
        i
        for i, cx, cy, r in rows
        if Circle(Point((cx, cy)), r).intersects(Circle(Point(center), qr))
    )
    assert got_c == exp_c and 801 in got_c


def test_shape_knn_all_kinds_match_geometry_oracle(spark):
    """InKNN over shape rows: k nearest boxes / segments / circles /
    polygons by minDist must agree with the driver-side geometry
    module, including dist-0 (point inside the shape)."""
    import random

    from simba_spark.geometry import MBR, Circle, LineSegment, Point, Polygon
    from simba_spark.operators.shapes import circle_struct, mbr_struct, segment_struct, shape_knn

    rng = random.Random(61)
    q = (50.0, 50.0)
    k = 7

    boxes = [(i, x := rng.uniform(0, 90), y := rng.uniform(0, 90),
              x + rng.uniform(1, 10), y + rng.uniform(1, 10)) for i in range(300)]
    bdf = spark.createDataFrame(
        boxes, "id long, xlo double, ylo double, xhi double, yhi double"
    ).withColumn("shp", mbr_struct(["xlo", "ylo"], ["xhi", "yhi"]))
    got = [r.id for r in shape_knn(bdf, "shp", q, k, kind="mbr", tiebreak="id").collect()]
    exp = sorted(
        boxes,
        key=lambda b: (MBR(Point((b[1], b[2])), Point((b[3], b[4]))).min_dist(Point(q)), b[0]),
    )[:k]
    assert got == [b[0] for b in exp]

    segs = [(i, rng.uniform(0, 100), rng.uniform(0, 100),
             rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(300)]
    sdf = spark.createDataFrame(
        segs, "id long, x1 double, y1 double, x2 double, y2 double"
    ).withColumn("shp", segment_struct("x1", "y1", "x2", "y2"))
    got = [r.id for r in shape_knn(sdf, "shp", q, k, kind="segment", tiebreak="id").collect()]
    exp = sorted(
        segs,
        key=lambda s: (
            LineSegment(Point((s[1], s[2])), Point((s[3], s[4]))).min_dist(Point(q)),
            s[0],
        ),
    )[:k]
    assert got == [s[0] for s in exp]

    circs = [(i, rng.uniform(0, 100), rng.uniform(0, 100), rng.uniform(0.5, 8))
             for i in range(300)]
    cdf = spark.createDataFrame(
        circs, "id long, cx double, cy double, r double"
    ).withColumn("shp", circle_struct(["cx", "cy"], "r"))
    got = [r.id for r in shape_knn(cdf, "shp", q, k, kind="circle", tiebreak="id").collect()]
    exp = sorted(
        circs,
        key=lambda c: (Circle(Point((c[1], c[2])), c[3]).min_dist(Point(q)), c[0]),
    )[:k]
    assert got == [c[0] for c in exp]

    tris = [(i, [(cx := rng.uniform(0, 100), cy := rng.uniform(0, 100)),
                 (cx + rng.uniform(1, 8), cy + rng.uniform(1, 8)),
                 (cx - rng.uniform(1, 8), cy + rng.uniform(1, 8))]) for i in range(300)]
    pdf = spark.createDataFrame(
        [(i, [{"x": float(x), "y": float(y)} for x, y in vs]) for i, vs in tris],
        "id long, shp array<struct<x: double, y: double>>",
    )
    got = [r.id for r in shape_knn(pdf, "shp", q, k, kind="polygon", tiebreak="id").collect()]
    exp = sorted(
        tris,
        key=lambda t: (Polygon([Point(v) for v in t[1]]).min_dist(Point(q)), t[0]),
    )[:k]
    assert got == [t[0] for t in exp]


def test_shape_distance_join_matches_geometry_oracle(spark):
    """Grid-celled shape-point distance join for box / segment / circle
    rows ≡ brute-force minDist <= r, auto and explicit cell sizes."""
    import random

    from simba_spark.geometry import Circle, LineSegment, MBR, Point
    from simba_spark.operators.shapes import (
        circle_struct,
        mbr_struct,
        segment_struct,
        shape_distance_join,
    )

    rng = random.Random(67)
    pts = [(j, rng.uniform(0, 100), rng.uniform(0, 100)) for j in range(250)]
    pdf = spark.createDataFrame(pts, "id long, x double, y double")
    r = 4.0

    boxes = [(i, x := rng.uniform(0, 90), y := rng.uniform(0, 90),
              x + rng.uniform(1, 8), y + rng.uniform(1, 8)) for i in range(150)]
    bdf = spark.createDataFrame(
        boxes, "id long, xlo double, ylo double, xhi double, yhi double"
    ).withColumn("shp", mbr_struct(["xlo", "ylo"], ["xhi", "yhi"]))
    exp = sorted(
        (b[0], p[0])
        for b in boxes for p in pts
        if MBR(Point((b[1], b[2])), Point((b[3], b[4]))).min_dist(Point((p[1], p[2]))) <= r
    )
    for cs in (None, 15.0):
        got = sorted(
            (row["a_id"], row["b_id"])
            for row in shape_distance_join(
                bdf, pdf, "shp", ["x", "y"], r, kind="mbr", cell_size=cs
            ).collect()
        )
        assert got == exp, ("mbr", cs)

    segs = [(i, rng.uniform(0, 100), rng.uniform(0, 100),
             rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(120)]
    sdf = spark.createDataFrame(
        segs, "id long, x1 double, y1 double, x2 double, y2 double"
    ).withColumn("shp", segment_struct("x1", "y1", "x2", "y2"))
    exp = sorted(
        (s[0], p[0])
        for s in segs for p in pts
        if LineSegment(Point((s[1], s[2])), Point((s[3], s[4]))).min_dist(
            Point((p[1], p[2]))
        ) <= r
    )
    got = sorted(
        (row["a_id"], row["b_id"])
        for row in shape_distance_join(
            sdf, pdf, "shp", ["x", "y"], r, kind="segment"
        ).collect()
    )
    assert got == exp

    circs = [(i, rng.uniform(0, 100), rng.uniform(0, 100), rng.uniform(0.5, 6))
             for i in range(150)]
    cdf = spark.createDataFrame(
        circs, "id long, cx double, cy double, cr double"
    ).withColumn("shp", circle_struct(["cx", "cy"], "cr"))
    exp = sorted(
        (c[0], p[0])
        for c in circs for p in pts
        if Circle(Point((c[1], c[2])), c[3]).min_dist(Point((p[1], p[2]))) <= r
    )
    got = sorted(
        (row["a_id"], row["b_id"])
        for row in shape_distance_join(
            cdf, pdf, "shp", ["x", "y"], r, kind="circle"
        ).collect()
    )
    assert got == exp


# ---------------------------------------------------------------------------
# generic shape x shape join (full shape matrix)


def _mixed_shape_frames(spark, seed):
    """Two frames each carrying a box, segment, and circle column per
    row, plus the driver-side geometry objects for the oracle."""
    from simba_spark.operators.shapes import (
        circle_struct, mbr_struct, segment_struct,
    )

    rng = random.Random(seed)
    rows, geo = [], []
    for i in range(120):
        xlo, ylo = rng.uniform(-12, 12), rng.uniform(-12, 12)
        w, h = rng.uniform(0, 4), rng.uniform(0, 4)
        sx1, sy1 = rng.uniform(-12, 12), rng.uniform(-12, 12)
        sx2, sy2 = sx1 + rng.uniform(-5, 5), sy1 + rng.uniform(-5, 5)
        cx, cy, cr = rng.uniform(-12, 12), rng.uniform(-12, 12), rng.uniform(0, 3)
        rows.append((i, xlo, ylo, xlo + w, ylo + h, sx1, sy1, sx2, sy2, cx, cy, cr))
        geo.append({
            "mbr": MBR(Point((xlo, ylo)), Point((xlo + w, ylo + h))),
            "segment": LineSegment(Point((sx1, sy1)), Point((sx2, sy2))),
            "circle": Circle(Point((cx, cy)), cr),
        })
    df = spark.createDataFrame(
        rows,
        "id long, xlo double, ylo double, xhi double, yhi double, "
        "sx1 double, sy1 double, sx2 double, sy2 double, "
        "cx double, cy double, cr double",
    ).select(
        "id",
        mbr_struct([F.col("xlo"), F.col("ylo")], [F.col("xhi"), F.col("yhi")]).alias("box"),
        segment_struct(F.col("sx1"), F.col("sy1"), F.col("sx2"), F.col("sy2")).alias("seg"),
        circle_struct([F.col("cx"), F.col("cy")], F.col("cr")).alias("circ"),
    )
    return df, geo


_KIND_COL = {"mbr": "box", "segment": "seg", "circle": "circ"}


@pytest.mark.parametrize("ka,kb", [
    ("mbr", "mbr"), ("mbr", "segment"), ("mbr", "circle"),
    ("segment", "segment"), ("segment", "circle"), ("circle", "circle"),
])
@pytest.mark.parametrize("r", [0.0, 1.5])
def test_shape_shape_join_matches_geometry_oracle(spark, ka, kb, r):
    """The generalized canonical-cell grid join must equal the
    driver-side geometry min_dist/intersects oracle on every kind pair,
    r=0 (intersection) and r>0 (distance), including touching cases."""
    from simba_spark.operators.shapes import shape_shape_join

    A, ga = _mixed_shape_frames(spark, seed=31)
    B, gb = _mixed_shape_frames(spark, seed=32)
    out = shape_shape_join(
        A.select("id", _KIND_COL[ka]),
        B.select("id", _KIND_COL[kb]),
        _KIND_COL[ka], _KIND_COL[kb], r=r,
        left_kind=ka, right_kind=kb,
    )
    got = sorted((row.a_id, row.b_id) for row in out.collect())
    exp = sorted(
        (i, j)
        for i in range(len(ga)) for j in range(len(gb))
        if (ga[i][ka].intersects(gb[j][kb]) if r == 0.0
            else ga[i][ka].min_dist(gb[j][kb]) <= r)
    )
    assert got == exp and len(exp) > 10


def test_shape_shape_join_no_duplicate_emission(spark):
    """A pair overlapping many shared grid cells must appear exactly
    once (canonical-cell rule), even with a tiny forced cell size."""
    from simba_spark.operators.shapes import shape_shape_join

    A, _ = _mixed_shape_frames(spark, seed=41)
    B, _ = _mixed_shape_frames(spark, seed=42)
    out = shape_shape_join(
        A.select("id", "box"), B.select("id", "box"), "box", "box",
        r=1.0, left_kind="mbr", right_kind="mbr", cell_size=0.25,
    )
    pairs = [(row.a_id, row.b_id) for row in out.collect()]
    assert len(pairs) == len(set(pairs)) and len(pairs) > 10


def test_shape_shape_join_plan_no_cartesian(spark):
    """Scale contract: cell equi-join, never a cartesian/BNL."""
    from simba_spark.operators.shapes import shape_shape_join

    A, _ = _mixed_shape_frames(spark, seed=51)
    B, _ = _mixed_shape_frames(spark, seed=52)
    # explicit cell_size: no 1-row stats subplan, so NO nested-loop
    # node of any kind may appear
    out = shape_shape_join(
        A.select("id", "seg"), B.select("id", "seg"), "seg", "seg",
        r=0.0, left_kind="segment", right_kind="segment", cell_size=2.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # derived cell width: the only nested-loop nodes are the 1-ROW
    # stats broadcasts; the pair join itself is still the cell
    # equi-join
    auto = shape_shape_join(
        A.select("id", "seg"), B.select("id", "seg"), "seg", "seg",
        r=0.0, left_kind="segment", right_kind="segment",
    )
    aplan = auto._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in aplan
    assert "SortMergeJoin" in aplan or "ShuffledHashJoin" in aplan
