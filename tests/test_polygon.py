"""Polygon containment operator vs the pure-Python geometry oracle."""

import random

from simba_spark.geometry import Point, Polygon
from simba_spark.operators.polygon import in_polygon, polygon_range

PENTAGON = [(100.0, 20.0), (300.0, 10.0), (400.0, 80.0), (200.0, 140.0), (50.0, 90.0)]
CONCAVE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.0), (0.0, 4.0)]


def test_polygon_range_matches_geometry_oracle(spark):
    rng = random.Random(7)
    rows = [(i, rng.uniform(0, 500), rng.uniform(0, 200)) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(r.id for r in polygon_range(df, ["x", "y"], PENTAGON).collect())
    poly = Polygon([Point(v) for v in PENTAGON])
    exp = sorted(i for i, x, y in rows if poly.contains(Point((x, y))))
    assert got == exp and len(got) > 0


def test_polygon_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [
            (0, 2.0, 0.0),     # on bottom edge
            (1, 0.0, 0.0),     # vertex
            (2, 2.0, 0.5),     # interior
            (3, 2.0, 3.0),     # inside the concave notch -> outside
            (4, 5.0, 5.0),     # far outside
        ],
        "id long, x double, y double",
    )
    got = sorted(
        r.id
        for r in df.filter(in_polygon("x", "y", CONCAVE)).collect()
    )
    assert got == [0, 1, 2]


def test_polygon_sql_mirror_matches(spark):
    """in_polygon_sql must produce the identical row set via spark.sql."""
    from simba_spark.operators.polygon import in_polygon_sql

    rng = random.Random(11)
    rows = [(i, rng.uniform(0, 5), rng.uniform(0, 5)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    df.createOrReplaceTempView("poly_pts")
    got_col = sorted(r.id for r in df.filter(in_polygon("x", "y", CONCAVE)).collect())
    got_sql = sorted(
        r.id
        for r in spark.sql(
            f"SELECT id FROM poly_pts WHERE {in_polygon_sql('x', 'y', CONCAVE)}"
        ).collect()
    )
    assert got_col == got_sql


def test_in_polygon_col_per_row_polygons(spark):
    """Polygon-as-data: each row carries its own polygon column; the
    higher-order-function predicate must agree with the driver-side
    geometry module on interior, exterior, and boundary points."""
    from pyspark.sql import functions as F

    from simba_spark.geometry import Polygon
    from simba_spark.operators.polygon import in_polygon_col

    tri = [(0.0, 0.0), (4.0, 0.0), (2.0, 4.0)]          # triangle
    sq = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]  # unit-ish square
    cases = [
        # (pid, px, py, polygon)
        (0, 2.0, 1.0, tri),    # inside triangle
        (1, 2.0, 4.0, tri),    # apex vertex (boundary)
        (2, 5.0, 5.0, tri),    # outside
        (3, 1.0, 0.0, sq),     # on bottom edge
        (4, 1.0, 1.0, sq),     # inside square
        (5, 3.0, 1.0, sq),     # outside square
    ]
    rows = [
        (pid, px, py, [{"x": float(vx), "y": float(vy)} for vx, vy in poly])
        for pid, px, py, poly in cases
    ]
    df = spark.createDataFrame(
        rows,
        "pid long, px double, py double, "
        "poly array<struct<x: double, y: double>>",
    )
    got = {
        r.pid: r.hit
        for r in df.withColumn(
            "hit", in_polygon_col("px", "py", "poly")
        ).collect()
    }
    exp = {
        pid: Polygon([(vx, vy) for vx, vy in poly]).contains((px, py))
        for pid, px, py, poly in cases
    }
    assert got == exp
    assert got[0] and got[1] and got[3] and got[4]
    assert not got[2] and not got[5]


def test_polygon_column_box_matches_geometry_oracle(spark):
    """polygon_intersects_box_col (polygon ROWS vs literal box) must
    agree with the driver-side Polygon.intersects(MBR) oracle across
    random triangles — including thin polygons slicing through the box
    with no vertex inside."""
    import random

    from simba_spark.geometry import MBR, Point, Polygon
    from simba_spark.operators.polygon import polygon_intersects_box_col

    rng = random.Random(17)
    tris = []
    for i in range(600):
        cx, cy = rng.uniform(0, 100), rng.uniform(0, 100)
        tris.append(
            (
                i,
                [
                    (cx, cy),
                    (cx + rng.uniform(-20, 20), cy + rng.uniform(-20, 20)),
                    (cx + rng.uniform(-20, 20), cy + rng.uniform(-20, 20)),
                ],
            )
        )
    # a long thin sliver through the query box, no vertex inside it
    tris.append((600, [(0.0, 50.0), (100.0, 52.0), (100.0, 52.5)]))
    low, high = (40.0, 40.0), (60.0, 60.0)
    rows = [
        (i, [{"x": float(x), "y": float(y)} for x, y in vs])
        for i, vs in tris
        if len({(x, y) for x, y in vs}) >= 3  # geometry oracle needs distinct
    ]
    df = spark.createDataFrame(
        rows, "id long, poly array<struct<x: double, y: double>>"
    )
    got = sorted(
        r.id for r in df.filter(polygon_intersects_box_col("poly", low, high)).collect()
    )
    box = MBR(Point(low), Point(high))
    exp = sorted(
        i
        for i, vs in tris
        if len({(x, y) for x, y in vs}) >= 3
        and Polygon([Point(v) for v in vs]).intersects(box)
    )
    assert got == exp
    assert 600 in got  # the sliver case is the one naive tests miss


def test_polygon_column_circle_matches_geometry_oracle(spark):
    """polygon_intersects_circle_col ≡ Polygon.min_dist(center) <= r."""
    import random

    from simba_spark.geometry import Point, Polygon
    from simba_spark.operators.polygon import polygon_intersects_circle_col

    rng = random.Random(19)
    tris = []
    for i in range(600):
        cx, cy = rng.uniform(0, 100), rng.uniform(0, 100)
        tris.append(
            (
                i,
                [
                    (cx, cy),
                    (cx + rng.uniform(1, 15), cy + rng.uniform(1, 15)),
                    (cx - rng.uniform(1, 15), cy + rng.uniform(1, 15)),
                ],
            )
        )
    center, r = (50.0, 50.0), 12.0
    rows = [(i, [{"x": float(x), "y": float(y)} for x, y in vs]) for i, vs in tris]
    df = spark.createDataFrame(
        rows, "id long, poly array<struct<x: double, y: double>>"
    )
    got = sorted(
        r_.id
        for r_ in df.filter(
            polygon_intersects_circle_col("poly", center, r)
        ).collect()
    )
    exp = sorted(
        i
        for i, vs in tris
        if Polygon([Point(v) for v in vs]).min_dist(Point(center)) <= r
    )
    assert got == exp and len(got) > 0


def test_polygon_distance_join_matches_bruteforce(spark):
    """Grid-celled polygon-point distance join ≡ brute-force
    Polygon.min_dist(Point) <= r, for auto and explicit cell sizes."""
    import random

    from simba_spark.geometry import Point, Polygon
    from simba_spark.operators.polygon import polygon_distance_join

    rng = random.Random(23)
    tris = []
    for i in range(150):
        cx, cy = rng.uniform(0, 100), rng.uniform(0, 100)
        tris.append(
            (
                i,
                [
                    (cx, cy),
                    (cx + rng.uniform(1, 10), cy + rng.uniform(1, 10)),
                    (cx - rng.uniform(1, 10), cy + rng.uniform(1, 10)),
                ],
            )
        )
    pts = [(j, rng.uniform(0, 100), rng.uniform(0, 100)) for j in range(300)]
    polys = spark.createDataFrame(
        [(i, [{"x": float(x), "y": float(y)} for x, y in vs]) for i, vs in tris],
        "id long, poly array<struct<x: double, y: double>>",
    )
    points = spark.createDataFrame(pts, "id long, x double, y double")
    r = 3.0
    exp = sorted(
        (i, j)
        for i, vs in tris
        for j, x, y in pts
        if Polygon([Point(v) for v in vs]).min_dist(Point((x, y))) <= r
    )
    for cs in (None, 8.0):
        got = sorted(
            (row["a_id"], row["b_id"])
            for row in polygon_distance_join(
                polys, points, "poly", ["x", "y"], r, cell_size=cs
            ).collect()
        )
        assert got == exp, cs
    assert len(exp) > 0


def test_polygon_segment_intersection_matches_geometry(spark):
    """polygon_intersects_segment_col ≡ geometry Polygon.intersects(
    LineSegment) over random triangles and one literal segment."""
    from simba_spark.geometry import LineSegment
    from simba_spark.operators.polygon import polygon_intersects_segment_col

    rng = random.Random(7)
    tris = []
    for i in range(250):
        cx, cy = rng.uniform(0, 100), rng.uniform(0, 100)
        tris.append(
            (
                i,
                [
                    (cx, cy),
                    (cx + rng.uniform(1, 12), cy + rng.uniform(1, 12)),
                    (cx - rng.uniform(1, 12), cy + rng.uniform(1, 12)),
                ],
            )
        )
    seg = (20.0, 10.0, 80.0, 90.0)
    polys = spark.createDataFrame(
        [(i, [{"x": float(x), "y": float(y)} for x, y in vs]) for i, vs in tris],
        "id long, poly array<struct<x: double, y: double>>",
    )
    sgeom = LineSegment(Point((seg[0], seg[1])), Point((seg[2], seg[3])))
    exp = sorted(
        i for i, vs in tris
        if Polygon([Point(v) for v in vs]).intersects(sgeom)
    )
    got = sorted(
        r.id
        for r in polys.filter(
            polygon_intersects_segment_col("poly", *seg)
        ).collect()
    )
    assert got == exp and 0 < len(exp) < len(tris)


def test_polygons_intersect_matches_geometry(spark):
    """polygons_intersect_col ≡ geometry Polygon.intersects(Polygon),
    including containment (small triangle inside big one) and touch."""
    from simba_spark.operators.polygon import polygons_intersect_col

    rng = random.Random(11)
    mk = lambda cx, cy, s: [
        (cx, cy), (cx + s, cy), (cx + s / 2, cy + s)
    ]
    tris_a = [(i, mk(rng.uniform(0, 60), rng.uniform(0, 60), rng.uniform(2, 15))) for i in range(40)]
    tris_b = [(j, mk(rng.uniform(0, 60), rng.uniform(0, 60), rng.uniform(2, 15))) for j in range(40)]
    # containment case: a tiny triangle centered in a big one
    tris_a.append((100, mk(0.0, 0.0, 30.0)))
    tris_b.append((200, mk(12.0, 5.0, 1.0)))

    def df_of(rows, name):
        return spark.createDataFrame(
            [(i, [{"x": float(x), "y": float(y)} for x, y in vs]) for i, vs in rows],
            f"{name} long, poly array<struct<x: double, y: double>>",
        )

    a = df_of(tris_a, "ida").withColumnRenamed("poly", "pa")
    b = df_of(tris_b, "idb").withColumnRenamed("poly", "pb")
    exp = sorted(
        (i, j)
        for i, va in tris_a
        for j, vb in tris_b
        if Polygon([Point(v) for v in va]).intersects(Polygon([Point(v) for v in vb]))
    )
    got = sorted(
        (r.ida, r.idb)
        for r in a.crossJoin(b)
        .filter(polygons_intersect_col("pa", "pb"))
        .collect()
    )
    assert got == exp and (100, 200) in got and len(exp) > 0


def test_polygon_to_polygon_dist2_matches_geometry(spark):
    from simba_spark.operators.polygon import polygon_to_polygon_dist2

    rng = random.Random(13)
    mk = lambda cx, cy, s: [(cx, cy), (cx + s, cy), (cx + s / 2, cy + s)]
    pairs = []
    for i in range(60):
        pairs.append(
            (
                i,
                mk(rng.uniform(0, 50), rng.uniform(0, 50), rng.uniform(2, 10)),
                mk(rng.uniform(0, 50), rng.uniform(0, 50), rng.uniform(2, 10)),
            )
        )
    df = spark.createDataFrame(
        [
            (
                i,
                [{"x": float(x), "y": float(y)} for x, y in va],
                [{"x": float(x), "y": float(y)} for x, y in vb],
            )
            for i, va, vb in pairs
        ],
        "id long, pa array<struct<x: double, y: double>>, "
        "pb array<struct<x: double, y: double>>",
    )
    got = {
        r.id: r.d2
        for r in df.select(
            "id", polygon_to_polygon_dist2("pa", "pb").alias("d2")
        ).collect()
    }
    for i, va, vb in pairs:
        exp = Polygon([Point(v) for v in va]).min_dist(Polygon([Point(v) for v in vb])) ** 2
        assert abs(got[i] - exp) < 1e-9, (i, got[i], exp)


def test_polygon_polygon_join_matches_bruteforce(spark):
    """Grid polygon-polygon join (r=0 intersection and r>0 distance)
    ≡ geometry brute force; canonical-cell emission yields no dups."""
    from simba_spark.operators.polygon import polygon_polygon_join

    rng = random.Random(17)
    mk = lambda cx, cy, s: [(cx, cy), (cx + s, cy), (cx + s / 2, cy + s)]
    tris_a = [(i, mk(rng.uniform(0, 80), rng.uniform(0, 80), rng.uniform(2, 12))) for i in range(60)]
    tris_b = [(j, mk(rng.uniform(0, 80), rng.uniform(0, 80), rng.uniform(2, 12))) for j in range(60)]

    def df_of(rows):
        return spark.createDataFrame(
            [(i, [{"x": float(x), "y": float(y)} for x, y in vs]) for i, vs in rows],
            "id long, poly array<struct<x: double, y: double>>",
        )

    a, b = df_of(tris_a), df_of(tris_b)
    ga = {i: Polygon([Point(v) for v in vs]) for i, vs in tris_a}
    gb = {j: Polygon([Point(v) for v in vs]) for j, vs in tris_b}
    for r in (0.0, 2.5):
        exp = sorted(
            (i, j)
            for i in ga
            for j in gb
            if (ga[i].intersects(gb[j]) if r == 0.0 else ga[i].min_dist(gb[j]) <= r)
        )
        for cs in (None, 10.0):
            rows = polygon_polygon_join(a, b, "poly", "poly", r, cell_size=cs).collect()
            got = sorted((row["a_id"], row["b_id"]) for row in rows)
            assert got == exp, (r, cs)
            assert len(got) == len(set(got))  # unique emission
        assert len(exp) > 0
