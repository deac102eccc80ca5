"""Skyline (Pareto front) operator."""
import pytest
from pyspark.sql import functions as F


def _ref_skyline(rows, dirs):
    def dom(a, b):
        ge = all((x <= y) if d == "min" else (x >= y)
                 for x, y, d in zip(a, b, dirs))
        gt = any((x < y) if d == "min" else (x > y)
                 for x, y, d in zip(a, b, dirs))
        return ge and gt
    return sorted(r for r in rows
                  if not any(dom(s, r) for s in rows if s != r))


def test_skyline_matches_reference(spark):
    import random

    from simba_spark.operators.skyline import skyline

    rng = random.Random(23)
    rows = [(i, round(rng.uniform(0, 100), 1), round(rng.uniform(0, 100), 1))
            for i in range(400)]
    # duplicated points: mutual non-strict dominance keeps both
    rows += [(1000, rows[0][1], rows[0][2])]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted((r.x, r.y) for r in skyline(df, ["x", "y"]).collect())
    exp = _ref_skyline([(x, y) for _, x, y in rows], ["min", "min"])
    assert got == sorted(exp)

    # max/min mix + NULL exclusion
    rows2 = [(1, 5.0, 3.0), (2, 9.0, 3.0), (3, 9.0, 1.0), (4, None, 0.0)]
    df2 = spark.createDataFrame(rows2, "id long, v double, c double")
    got2 = sorted(r.id for r in
                  skyline(df2, ["v", "c"], ["max", "min"]).collect())
    assert got2 == [3]  # (9,1) dominates (9,3) and (5,3); NULL excluded

    with pytest.raises(ValueError):
        skyline(df2, ["v"])
    with pytest.raises(ValueError):
        skyline(df2, ["v", "c"], ["max", "sideways"])
    with pytest.raises(ValueError):
        # survivors bound is a hard contract
        skyline(df, ["x", "y"], sample_cap=1, max_survivors=1)


def test_skyline_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.skyline import skyline, skyline_sql

    rng = random.Random(31)
    rows = [(i, round(rng.uniform(0, 50), 1), round(rng.uniform(0, 50), 1),
             round(rng.uniform(0, 50), 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a double, b double, c double")
    got = sorted(map(tuple, skyline(
        df, ["a", "b", "c"], ["min", "max", "min"]).collect()))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "a", "b", "c"]))
    oracle = sorted(map(tuple, con.execute(skyline_sql(
        "SELECT * FROM t", ["a", "b", "c"], ["min", "max", "min"])
    ).fetchall()))
    assert got == oracle
