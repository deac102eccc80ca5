"""General-purpose spatial partitioners (STR / KD / Voronoi / z-order):
assignment correctness, balance, determinism, and the co-location
contract (ref parity: STRPartitioner.scala, VoronoiPartitioner.scala)."""

import math

import pytest
from pyspark.sql import functions as F

from simba_spark.partitioners import (PART_COL, assign_partitions,
                                      hash_partition, kd_partition,
                                      partition_sizes, range_partition,
                                      str_partition, voronoi_partition,
                                      zorder_partition)


@pytest.fixture(scope="module")
def pts(spark):
    # 4000 deterministic points: uniform square + a dense cluster
    return spark.range(4000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 1000) / 10.0).alias("y"),
    ).cache()


def _sizes(df):
    return {r[PART_COL]: r["n"] for r in partition_sizes(df).collect()}


def test_str_partition_covers_and_balances(pts):
    out, meta = str_partition(pts, ["x", "y"], 16)
    sizes = _sizes(out)
    assert sum(sizes.values()) == 4000          # total — no row lost
    assert all(0 <= p < 16 + 4 for p in sizes)  # ids in the tile grid
    assert len(sizes) >= 12                     # most tiles populated
    # near-equal-count tiles on ~uniform data
    assert max(sizes.values()) <= 3 * max(1, min(sizes.values()))
    assert meta["kind"] == "str" and len(meta["y_cuts"]) == len(meta["x_cuts"]) + 1


def test_kd_partition_balanced_any_num(pts):
    # non-power-of-2 target: proportional splits keep leaves balanced
    out, meta = kd_partition(pts, ["x", "y"], 6)
    sizes = _sizes(out)
    assert sum(sizes.values()) == 4000
    assert set(sizes) == set(range(6))
    assert max(sizes.values()) <= 2.5 * min(sizes.values())
    # deterministic: same seed → same tree
    _, meta2 = kd_partition(pts, ["x", "y"], 6)
    assert meta == meta2


def test_voronoi_partition_assigns_nearest_pivot(pts):
    import numpy as np

    out, meta = voronoi_partition(pts, ["x", "y"], 8)
    piv = np.asarray(meta["pivots"])
    rows = out.select("x", "y", PART_COL).collect()
    for r in rows[:500]:
        d2 = ((piv - np.array([r["x"], r["y"]])) ** 2).sum(axis=1)
        assert int(d2.argmin()) == r[PART_COL]


def test_zorder_partition_locality(pts):
    out, meta = zorder_partition(pts, ["x", "y"], 16)
    sizes = _sizes(out)
    assert sum(sizes.values()) == 4000
    assert max(sizes) < 16 and min(sizes) >= 0
    # locality: points in one small box should touch few partitions
    touched = (
        out.filter("x BETWEEN 10 AND 14 AND y BETWEEN 10 AND 14")
        .select(PART_COL).distinct().count()
    )
    assert touched <= 6


def test_assign_partitions_colocates_second_dataset(pts, spark):
    """The co-location contract: the SAME coordinates get the SAME id
    under a meta derived from a different dataset."""
    other = spark.range(500).select(
        (F.pmod(F.xxhash64("id", F.lit(9)), 1000) / 10.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(10)), 1000) / 10.0).alias("y"),
    )
    for fn in (str_partition, kd_partition, voronoi_partition,
               zorder_partition):
        _, meta = fn(pts, ["x", "y"], 8)
        a = assign_partitions(other, meta, ["x", "y"])
        b = assign_partitions(other, meta, ["x", "y"])
        assert a.collect() == b.collect()
        # and against a direct recompute through the partitioner on the
        # same rows: identical boundaries → identical ids
        joined = a.withColumnRenamed(PART_COL, "p1").join(
            assign_partitions(other, meta, ["x", "y"])
            .withColumnRenamed(PART_COL, "p2"),
            ["x", "y"],
        )
        assert joined.filter("p1 != p2").count() == 0


def test_hash_and_range_partition(pts):
    out, meta = hash_partition(pts, ["id"], 8)
    sizes = _sizes(out)
    assert sum(sizes.values()) == 4000 and set(sizes) <= set(range(8))

    out2, meta2 = range_partition(pts, "x", 8)
    sizes2 = _sizes(out2)
    assert sum(sizes2.values()) == 4000
    assert max(sizes2.values()) <= 2 * min(sizes2.values())
    # range ids are ordered: partition id grows with x
    mx = out2.groupBy(PART_COL).agg(F.max("x").alias("mx"),
                                    F.min("x").alias("mn")).collect()
    by_id = sorted([(r[PART_COL], r["mn"], r["mx"]) for r in mx])
    for (p1, _, mx1), (p2, mn2, _) in zip(by_id, by_id[1:]):
        assert mx1 <= mn2 + 1e-9


def test_partition_ids_are_plan_side_no_udf(pts):
    """Every assignment must be pure Column arithmetic: no
    BatchEvalPython anywhere in the plan."""
    for fn in (str_partition, kd_partition, voronoi_partition,
               zorder_partition):
        out, _ = fn(pts, ["x", "y"], 8)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan


def test_str_partition_degenerate_slabs(pts, spark):
    """num=2 makes tiles_per_slab=1 — every slab has ZERO y-cuts; and a
    constant-y dataset degenerates the cuts too. Both must still
    assign total, in-range ids (regression: empty cut arrays are
    void-typed without an explicit cast)."""
    out, _ = str_partition(pts, ["x", "y"], 2)
    sizes = _sizes(out)
    assert sum(sizes.values()) == 4000 and set(sizes) <= {0, 1}

    const = spark.range(300).select(
        (F.col("id") % 17 / 1.0).alias("x"), F.lit(5.0).alias("y")
    )
    out2, _ = str_partition(const, ["x", "y"], 9)
    sizes2 = _sizes(out2)
    assert sum(sizes2.values()) == 300


def test_null_coordinates_get_real_partition_ids(pts, spark):
    """A row with a NULL coordinate must still receive a NON-NULL id
    under every partitioner kind — a NULL id would silently drop the
    row from the advertised equi-join co-location (NULL != NULL)."""
    withnull = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, None, 5.0), (3, 5.0, None), (4, None, None)],
        "id long, x double, y double",
    )
    for fn in (str_partition, kd_partition, voronoi_partition,
               zorder_partition):
        _, meta = fn(pts, ["x", "y"], 8)
        rows = assign_partitions(withnull, meta, ["x", "y"]).collect()
        assert all(r[PART_COL] is not None for r in rows), meta["kind"]


def test_partition_exprs_are_single_parsed_literals(pts):
    """Boundary literals compile via one F.expr string, not O(num)
    py4j F.lit calls: a num=512 range partitioning must build its
    assignment expression in well under a second of driver time."""
    import time

    from simba_spark.partitioners import _pid_expr

    _, meta = range_partition(pts, "x", 512)
    t0 = time.time()
    for _ in range(5):
        _pid_expr(meta, ["x"])
    # generous wall-clock bound: the O(num)-py4j-calls regression this
    # guards against costs 10s+; the single-expr path is ~0.5 s, but
    # this host's scheduler noise has pushed it past a 2.0 s bound
    # under a full parallel suite (round-9 preflight flake at 2.09 s)
    assert time.time() - t0 < 5.0
