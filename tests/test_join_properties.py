"""Property-based equivalence for the join operators (hypothesis).

The unit matrix checks fixed fixtures; these generate adversarial
inputs — tiny integer grids force duplicate points and exact distance
ties, the cases where a blocking scheme quietly loses or duplicates a
pair. Oracle = numpy brute force on the driver (no second Spark job),
so a handful of examples stays fast while still exploring the corner
space. Closed-bound semantics (<= r) and (dist, id) tie order match
the engine contract (SURVEY §5 equivalence properties).
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# coordinates on a 6x6 integer grid: duplicates and exact ties are the
# norm, not the exception
tiny = st.integers(min_value=0, max_value=5)
point = st.tuples(tiny, tiny)
points = st.lists(point, min_size=1, max_size=30)
radius = st.sampled_from([0.0, 1.0, 1.5, 2.0, math.sqrt(2.0)])

JOIN_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )


@JOIN_SETTINGS
@given(points, points, radius)
def test_distance_join_grid_matches_bruteforce(spark, la, rb, r):
    from simba_spark.operators.distance_join import distance_join

    got = sorted(
        (row["a_id"], row["b_id"])
        for row in distance_join(
            _df(spark, la), _df(spark, rb), ["x", "y"], ["x", "y"], r,
            algo="grid", left_prefix="a_", right_prefix="b_",
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (ax, ay) in enumerate(la)
        for j, (bx, by) in enumerate(rb)
        if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
    )
    assert got == want


@JOIN_SETTINGS
@given(points, points, st.integers(min_value=1, max_value=4))
@pytest.mark.parametrize("algo", ["theta", "voronoi"])
def test_knn_join_matches_bruteforce(spark, algo, la, rb, k):
    from simba_spark.operators.knn_join import knn_join

    got = sorted(
        (row["l_id"], row["r_id"])
        for row in knn_join(
            _df(spark, la), _df(spark, rb), ["x", "y"], ["x", "y"], k,
            left_id="id", algo=algo, right_tiebreak="id",
        ).collect()
    )
    want = []
    for i, (ax, ay) in enumerate(la):
        ranked = sorted(
            (((ax - bx) ** 2 + (ay - by) ** 2), j)
            for j, (bx, by) in enumerate(rb)
        )
        want += [(i, j) for _, j in ranked[:k]]
    assert got == sorted(want)
