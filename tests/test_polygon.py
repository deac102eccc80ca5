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
