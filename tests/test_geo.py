"""Spherical operators: haversine vs known distances, bbox-prefilter
range (antimeridian + polar cases), banded-grid distance join vs
brute force."""

import math
import random

import pytest
from pyspark.sql import functions as F


def _pts(spark, rows, prefix="p"):
    return spark.createDataFrame(
        rows, f"{prefix}_id long, lat double, lon double")


def _hav(a, b):
    R = 6371.0088
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2)
         * math.sin((lo2 - lo1) / 2) ** 2)
    return 2 * R * math.asin(min(1.0, math.sqrt(h)))


def test_haversine_known_distances(spark):
    from simba_spark.operators.geo import haversine_km

    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)],  # Paris -> London
        "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()[0]["d"]
    assert got == pytest.approx(343.5, abs=1.0)
    # antipodal clamp: no NaN
    df2 = spark.createDataFrame([(0.0, 0.0, 0.0, 180.0)],
                                "lat1 double, lon1 double, lat2 double, lon2 double")
    got2 = df2.select(haversine_km(F.col("lat1"), F.col("lon1"),
                                   F.col("lat2"), F.col("lon2"))
                      .alias("d")).collect()[0]["d"]
    assert got2 == pytest.approx(math.pi * 6371.0088, rel=1e-6)


def _random_points(n, seed, lat_range=(-85, 85)):
    rng = random.Random(seed)
    return [(i, rng.uniform(*lat_range), rng.uniform(-180, 180))
            for i in range(n)]


def test_geo_circle_range_matches_bruteforce(spark):
    from simba_spark.operators.geo import geo_circle_range

    pts = _random_points(400, 7)
    df = _pts(spark, pts)
    for center, r in (((40.0, -75.0), 500.0),
                      ((-60.0, 170.0), 800.0)):
        got = {x["p_id"] for x in
               geo_circle_range(df, "lat", "lon", center, r).collect()}
        want = {i for i, la, lo in pts if _hav((la, lo), center) <= r}
        assert got == want, (center, r)


def test_geo_circle_range_antimeridian_and_pole(spark):
    from simba_spark.operators.geo import geo_circle_range

    pts = [(1, 10.0, 179.5), (2, 10.0, -179.5), (3, 10.0, 170.0),
           (4, 89.5, 0.0), (5, 89.5, 179.0), (6, 88.0, -90.0)]
    df = _pts(spark, pts)
    # box crossing the antimeridian catches both sides
    got = {r["p_id"] for r in
           geo_circle_range(df, "lat", "lon", (10.0, 180.0),
                            150.0).collect()}
    assert got == {1, 2}
    # polar cap: every longitude near the pole qualifies
    got2 = {r["p_id"] for r in
            geo_circle_range(df, "lat", "lon", (90.0, 0.0),
                             120.0).collect()}
    assert got2 == {4, 5}


def test_geo_knn_deterministic(spark):
    from simba_spark.operators.geo import geo_knn

    pts = _random_points(300, 11)
    df = _pts(spark, pts)
    center = (48.0, 2.0)
    got = [r["p_id"] for r in
           geo_knn(df, "lat", "lon", center, 5,
                   tiebreak="p_id").collect()]
    want = [i for i, _, _ in sorted(
        pts, key=lambda p: (_hav((p[1], p[2]), center), p[0]))][:5]
    assert got == want
    plan = geo_knn(df, "lat", "lon", center, 5, tiebreak="p_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_geo_distance_join_matches_bruteforce(spark):
    from simba_spark.operators.geo import geo_distance_join

    lpts = _random_points(150, 3)
    rpts = _random_points(150, 4)
    ldf = _pts(spark, lpts, "l")
    rdf = _pts(spark, rpts, "r")
    for r_km in (300.0, 1500.0):
        got = {(x["l_id"], x["b_r_id"]) for x in
               geo_distance_join(ldf, rdf, r_km,
                                 lat_r="lat", lon_r="lon",
                                 right_prefix="b_").collect()}
        want = {(i, j)
                for i, la1, lo1 in lpts
                for j, la2, lo2 in rpts
                if _hav((la1, lo1), (la2, lo2)) <= r_km}
        assert got == want, r_km


def test_geo_distance_join_antimeridian_pairs(spark):
    from simba_spark.operators.geo import geo_distance_join

    ldf = _pts(spark, [(1, 0.0, 179.9)], "l")
    rdf = _pts(spark, [(2, 0.0, -179.9), (3, 0.0, 178.0)], "r")
    got = {(x["l_id"], x["b_r_id"]) for x in
           geo_distance_join(ldf, rdf, 50.0,
                             right_prefix="b_").collect()}
    assert got == {(1, 2)}  # 0.2 deg across the line ~ 22 km


def test_geo_distance_join_duplicate_rows_kept(spark):
    from simba_spark.operators.geo import geo_distance_join

    ldf = _pts(spark, [(1, 0.0, 0.0), (1, 0.0, 0.0)], "l")
    rdf = _pts(spark, [(9, 0.1, 0.1)], "r")
    got = geo_distance_join(ldf, rdf, 50.0,
                            right_prefix="b_").collect()
    assert len(got) == 2  # replication dedup must not eat row copies


def test_geo_distance_join_no_cartesian(spark):
    from simba_spark.operators.geo import geo_distance_join

    ldf = _pts(spark, _random_points(50, 5), "l")
    rdf = _pts(spark, _random_points(50, 6), "r")
    plan = geo_distance_join(ldf, rdf, 200.0, right_prefix="b_") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
