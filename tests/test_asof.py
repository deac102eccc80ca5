"""as-of join: semantics vs a brute-force oracle, plan shape."""

import pytest
from pyspark.sql import functions as F

from simba_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def lr(spark):
    import random

    rng = random.Random(7)
    left = [(rng.randrange(8), rng.randrange(1000), i) for i in range(400)]
    right = [(rng.randrange(8), rng.randrange(1000), 10_000 + i, float(i))
             for i in range(300)]
    # inject exact time ties (left==right time, and right-right dup times)
    right += [(0, left[0][1], 99_991, 1.5), (0, left[0][1], 99_992, 2.5)]
    L = spark.createDataFrame(left, "k int, t int, lid int")
    R = spark.createDataFrame(right, "k int, t int, rid int, rv double")
    return L, R


def _brute(left_rows, right_rows, direction="backward", strict=False,
           tolerance=None):
    if direction == "nearest":
        back = _brute(left_rows, right_rows, "backward", strict, tolerance)
        fwd = _brute(left_rows, right_rows, "forward", strict, tolerance)
        rt_of = {rid: rt for _, rt, rid, _ in right_rows}
        out = {}
        for k, t, lid in left_rows:
            b, f = back[lid], fwd[lid]
            if b is None or f is None:
                out[lid] = b if f is None else f
            else:
                out[lid] = b if abs(t - rt_of[b[0]]) <= abs(rt_of[f[0]] - t) else f
        return out
    out = {}
    for k, t, lid in left_rows:
        best = None
        for rk, rt, rid, rv in right_rows:
            if rk != k:
                continue
            if direction == "backward":
                ok = rt < t if strict else rt <= t
            else:
                ok = rt > t if strict else rt >= t
            if not ok:
                continue
            if tolerance is not None and abs(t - rt) > tolerance:
                continue
            key = (rt if direction == "backward" else -rt, rid)
            if best is None or key > (best[0], best[1]):
                best = (key[0], rid, rv, rt)
        out[lid] = None if best is None else (best[1], best[2])
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_bruteforce(spark, lr, direction, strict):
    L, R = lr
    left_rows = [(r.k, r.t, r.lid) for r in L.collect()]
    right_rows = [(r.k, r.t, r.rid, r.rv) for r in R.collect()]
    exp = _brute(left_rows, right_rows, direction=direction, strict=strict)
    got = {
        r.lid: (None if r.r_rid is None else (r.r_rid, r.r_rv))
        for r in asof_join(
            L, R, "k", "t", direction=direction, strict=strict,
            tiebreak_col="rid",
        ).collect()
    }
    assert got == exp


def test_asof_tolerance_and_inner(spark, lr):
    L, R = lr
    left_rows = [(r.k, r.t, r.lid) for r in L.collect()]
    right_rows = [(r.k, r.t, r.rid, r.rv) for r in R.collect()]
    exp = _brute(left_rows, right_rows, tolerance=50)
    out = asof_join(L, R, "k", "t", tolerance=50, tiebreak_col="rid")
    got = {
        r.lid: (None if r.r_rid is None else (r.r_rid, r.r_rv))
        for r in out.collect()
    }
    assert got == exp
    inner = asof_join(L, R, "k", "t", tolerance=50, how="inner",
                      tiebreak_col="rid")
    assert inner.count() == sum(1 for v in exp.values() if v is not None)
    assert inner.filter(F.col("r_rid").isNull()).count() == 0


def test_asof_null_times_never_match(spark):
    L = spark.createDataFrame([(1, None, 1), (1, 10, 2)], "k int, t int, lid int")
    R = spark.createDataFrame([(1, None, 7, 1.0), (1, 5, 8, 2.0)],
                              "k int, t int, rid int, rv double")
    rows = {r.lid: r.r_rid for r in asof_join(L, R, "k", "t").collect()}
    assert rows == {1: None, 2: 8}


def test_asof_timestamp_tolerance(spark):
    L = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1), (1, "2024-01-01 09:00:00", 2)],
        "k int, ts string, lid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    R = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5)], "k int, ts string, rid int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(L, R, "k", "ts", tolerance=3600 * 1_000_000)
    rows = {r.lid: r.r_rid for r in out.collect()}
    assert rows == {1: 5, 2: None}


def test_asof_prefix_collision_raises(spark, lr):
    L, R = lr
    with pytest.raises(ValueError, match="collide"):
        asof_join(L.withColumnRenamed("lid", "r_rid"), R, "k", "t")


def test_asof_plan_has_no_join(spark, lr):
    """The scale contract: one shuffle on the key, zero join nodes."""
    L, R = lr
    plan = (
        asof_join(L, R, "k", "t")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides co-shuffle


def test_asof_nearest_timestamps_with_tolerance(spark):
    """nearest + TIMESTAMP times + tolerance: exercises the
    timestampdiff-over-struct-field distance branch."""
    L = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 1), (1, "2024-01-01 05:00:00", 2),
         (1, "2024-01-01 11:30:00", 3)],
        "k int, ts string, lid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    R = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00", 10), (1, "2024-01-01 06:00:00", 11),
         (1, "2024-01-01 23:00:00", 12)],
        "k int, ts string, rid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(L, R, "k", "ts", direction="nearest", tiebreak_col="rid")
    got = {r.lid: r.r_rid for r in out.collect()}
    # lid 1: 00:30 (30m back) beats 06:00 (5h fwd); lid 2: 06:00 (1h fwd)
    # beats 00:30 (4.5h back); lid 3: 06:00 (5.5h back) beats 23:00
    assert got == {1: 10, 2: 11, 3: 11}
    # 1-hour tolerance nulls the far matches
    tol = asof_join(L, R, "k", "ts", direction="nearest",
                    tiebreak_col="rid", tolerance=3600 * 1_000_000)
    got = {r.lid: r.r_rid for r in tol.collect()}
    assert got == {1: 10, 2: 11, 3: None}
    # exact-distance tie resolves backward
    L2 = spark.createDataFrame([(1, "2024-01-01 03:15:00", 9)],
                               "k int, ts string, lid int"
                               ).withColumn("ts", F.col("ts").cast("timestamp"))
    tie = asof_join(L2, R, "k", "ts", direction="nearest", tiebreak_col="rid")
    assert tie.collect()[0].r_rid == 10


def test_asof_composite_keys(spark):
    """Multi-column join keys: matches must respect BOTH key columns."""
    L = spark.createDataFrame(
        [(1, "x", 10, 1), (1, "y", 10, 2), (2, "x", 10, 3)],
        "k1 int, k2 string, t int, lid int",
    )
    R = spark.createDataFrame(
        [(1, "x", 5, 100), (1, "y", 7, 200), (2, "x", 11, 300)],
        "k1 int, k2 string, t int, rid int",
    )
    got = {r.lid: r.r_rid
           for r in asof_join(L, R, ["k1", "k2"], "t").collect()}
    assert got == {1: 100, 2: 200, 3: None}


def test_asof_string_tiebreak_native_type(spark):
    """ADVICE r4: a non-numeric tiebreak must keep its native type in
    the window ordering (a long cast NULLed string ids and silently
    broke determinism)."""
    L = spark.createDataFrame([(1, 10, 1)], "k int, t int, lid int")
    R = spark.createDataFrame(
        [(1, 5, "ev_a", 1.0), (1, 5, "ev_b", 2.0)],
        "k int, t int, rid string, rv double",
    )
    out = asof_join(L, R, "k", "t", tiebreak_col="rid")
    row = out.collect()[0]
    # greatest string id wins the equal-time tie
    assert (row.r_rid, row.r_rv) == ("ev_b", 2.0)


def test_asof_validation_errors(spark):
    L = spark.createDataFrame([(1, 10, 1)], "k int, t int, lid int")
    R = spark.createDataFrame([(1, 5, 9)], "k int, t int, rid int")
    # right time listed as a join key
    with pytest.raises(ValueError, match="join key"):
        asof_join(L, R, ["k", "t"], "t")
    # timestamp-left vs numeric-right mismatch
    Lts = L.withColumn("t", F.timestamp_seconds(F.col("t")))
    with pytest.raises(ValueError, match="comparable"):
        asof_join(Lts, R, "k", "t")
    # unknown tiebreak column
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(L, R, "k", "t", tiebreak_col="nope")


def test_asof_tolerance_prefilter_equivalence(spark):
    """Right rows far outside [min(left)-tol, max(left)+tol] are
    pre-filtered; results must equal the unfiltered semantics."""
    L = spark.createDataFrame(
        [(1, 1000, 1), (1, 1100, 2)], "k int, t int, lid int"
    )
    R = spark.createDataFrame(
        [(1, -50_000, 7, 1.0), (1, 990, 8, 2.0), (1, 80_000, 9, 3.0)],
        "k int, t int, rid int, rv double",
    )
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(L, R, "k", "t", direction=direction, tolerance=50,
                        tiebreak_col="rid")
        got = {r.lid: r.r_rid for r in out.collect()}
        exp = {1: 8, 2: None} if direction != "forward" else {1: None, 2: None}
        assert got == exp, direction
