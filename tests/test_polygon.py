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
