import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from simba_spark.context import get_spark

    s = get_spark(app_name="simba_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ctx(spark):
    from simba_spark.context import SimbaContext

    return SimbaContext(spark)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def points_df(spark):
    """Deterministic 2-D point table with duplicates (FIXTURES.md F1-style)."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(2000):
        x = rng.uniform(0, 1000)
        y = rng.uniform(0, 1000)
        rows.append((i, x, y))
    # ~1% exact duplicates for kNN tie handling
    for i in range(2000, 2020):
        src = rows[rng.randrange(2000)]
        rows.append((i, src[1], src[2]))
    return spark.createDataFrame(rows, "id long, x double, y double").cache()


@pytest.fixture(scope="session")
def points_pd(points_df):
    return points_df.toPandas()


@pytest.fixture(scope="session")
def pair_dfs(spark):
    """Two offset point sets for join tests (FIXTURES.md F3/F4-style),
    including a skew blob near (500, 500)."""
    import random

    rng = random.Random(43)
    a_rows, b_rows = [], []
    for i in range(800):
        x, y = rng.uniform(0, 1000), rng.uniform(0, 1000)
        a_rows.append((i, x, y))
        b_rows.append((i, x + rng.gauss(0, 5), y + rng.gauss(0, 5)))
    for i in range(800, 840):  # skew blob
        b_rows.append((i, 500 + rng.gauss(0, 1), 500 + rng.gauss(0, 1)))
    a = spark.createDataFrame(a_rows, "id long, x double, y double").cache()
    b = spark.createDataFrame(b_rows, "id long, x double, y double").cache()
    return a, b
