"""Range / circle-range / kNN filter correctness vs brute-force pandas
oracles (reference test style: inline oracle, SURVEY.md §5)."""

import math

from pyspark.sql import functions as F

from simba_spark.operators.filters import (
    circle_range,
    knn,
    knn_and,
    knn_not,
    knn_or,
    range_query,
)


def test_range_query_closed_bounds(points_df, points_pd):
    lo, hi = (100.0, 200.0), (400.0, 600.0)
    got = sorted(r.id for r in range_query(points_df, ["x", "y"], lo, hi).collect())
    exp = sorted(
        points_pd[
            (points_pd.x >= lo[0]) & (points_pd.x <= hi[0])
            & (points_pd.y >= lo[1]) & (points_pd.y <= hi[1])
        ].id
    )
    assert got == exp and len(got) > 0


def test_range_query_boundary_rows(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 2.0, 2.0), (2, 2.0000001, 2.0)],
        "id long, x double, y double",
    )
    got = sorted(r.id for r in range_query(df, ["x", "y"], (1.0, 1.0), (2.0, 2.0)).collect())
    assert got == [0, 1]  # closed upper bound includes (2,2), excludes epsilon


def test_circle_range_closed_boundary(spark):
    df = spark.createDataFrame(
        [(0, 3.0, 4.0), (1, 0.0, 5.0), (2, 3.001, 4.0), (3, 0.0, 0.0)],
        "id long, x double, y double",
    )
    got = sorted(r.id for r in circle_range(df, ["x", "y"], (0.0, 0.0), 5.0).collect())
    assert got == [0, 1, 3]  # dist == r included (closed), epsilon out


def test_circle_range_vs_oracle(points_df, points_pd):
    c, r = (500.0, 500.0), 120.0
    got = sorted(r_.id for r_ in circle_range(points_df, ["x", "y"], c, r).collect())
    d2 = (points_pd.x - c[0]) ** 2 + (points_pd.y - c[1]) ** 2
    exp = sorted(points_pd[d2 <= r * r].id)
    assert got == exp and len(got) > 0


def test_knn_exactly_k_with_ties(points_df, points_pd):
    q, k = (500.0, 500.0), 25
    got = knn(points_df, ["x", "y"], q, k, tiebreak="id").collect()
    assert len(got) == k
    d2 = (points_pd.x - q[0]) ** 2 + (points_pd.y - q[1]) ** 2
    exp = points_pd.assign(d2=d2).sort_values(["d2", "id"]).head(k)
    assert sorted(r.id for r in got) == sorted(exp.id)


def test_knn_duplicate_points_exactly_k(spark):
    # 5 identical points; k=3 must return exactly 3 (keepSame=false)
    df = spark.createDataFrame(
        [(i, 1.0, 1.0) for i in range(5)], "id long, x double, y double"
    )
    got = knn(df, ["x", "y"], (0.0, 0.0), 3, tiebreak="id").collect()
    assert sorted(r.id for r in got) == [0, 1, 2]


def test_knn_boolean_set_semantics(points_df, points_pd):
    """A AND knn / A OR knn / NOT knn as set algebra (FilterExec.scala:51-68)."""
    q, k = (500.0, 500.0), 50
    knn_df = knn(points_df, ["x", "y"], q, k, tiebreak="id")
    cond = F.col("x") > 500.0

    got_and = sorted(r.id for r in knn_and(points_df, knn_df, cond).collect())
    d2 = (points_pd.x - q[0]) ** 2 + (points_pd.y - q[1]) ** 2
    knn_ids = set(points_pd.assign(d2=d2).sort_values(["d2", "id"]).head(k).id)
    exp_and = sorted(set(points_pd[points_pd.x > 500.0].id) & knn_ids)
    assert got_and == exp_and

    got_or = sorted(r.id for r in knn_or(points_df, knn_df, cond).collect())
    exp_or = sorted(set(points_pd[points_pd.x > 500.0].id) | knn_ids)
    assert got_or == exp_or

    got_not = sorted(r.id for r in knn_not(points_df, knn_df).collect())
    exp_not = sorted(set(points_pd.id) - knn_ids)
    assert got_not == exp_not


def test_range_filter_pushdown_reaches_parquet(spark, tmp_path):
    """The range predicate must appear in PushedFilters on a parquet scan
    (SURVEY §2.2: sargable predicates — our local-index analog)."""
    p = str(tmp_path / "pts")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 97).cast("double").alias("y"),
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    plan = range_query(df, ["x", "y"], (10.0, 10.0), (20.0, 20.0))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(x,10.0" in plan


def test_null_coordinates_excluded_like_sql(spark):
    """Rows with NULL key coordinates never qualify for range / circle /
    kNN — three-valued logic matches the SQL oracle's behavior, so
    hash-matching holds on dirty data too."""
    from simba_spark.operators.filters import circle_range, knn, range_query

    df = spark.createDataFrame(
        [(0, 5.0, 5.0), (1, None, 5.0), (2, 5.0, None), (3, None, None),
         (4, 6.0, 6.0)],
        "id long, x double, y double",
    )
    got = sorted(r.id for r in range_query(df, ["x", "y"], (0.0, 0.0), (10.0, 10.0)).collect())
    assert got == [0, 4]
    got = sorted(r.id for r in circle_range(df, ["x", "y"], (5.0, 5.0), 10.0).collect())
    assert got == [0, 4]
    got = sorted(r.id for r in knn(df, ["x", "y"], (5.0, 5.0), 10, tiebreak="id").collect())
    assert got == [0, 4], "null-key rows must not fill kNN slots"
