"""Layout ("index" analog) tests: routed plans must hash-match unrouted
plans (SURVEY.md §5 equivalence properties) and persist/load must
round-trip (ref parity: IndexManager.persistIndex/loadIndex)."""

import os

import pytest

from simba_spark.context import SimbaContext


@pytest.fixture(scope="module")
def lctx(spark):
    return SimbaContext(spark)


def _ids(df, col="id"):
    return sorted(r[col] for r in df.collect())


def test_layout_routed_equals_naive(lctx, points_df):
    from simba_spark.operators.filters import circle_range, range_query

    lay = lctx.create_index(points_df, ["x", "y"], "pts_idx", kind="zorder")
    lo, hi = (100.0, 100.0), (300.0, 300.0)
    naive = range_query(points_df, ["x", "y"], lo, hi)
    routed = lctx.range_query(lay.data, ["x", "y"], lo, hi)
    assert _ids(routed) == _ids(naive)
    assert routed.columns == points_df.columns

    naive_c = circle_range(points_df, ["x", "y"], (500.0, 500.0), 80.0)
    routed_c = lctx.circle_range(lay.data, ["x", "y"], (500.0, 500.0), 80.0)
    assert _ids(routed_c) == _ids(naive_c)
    lctx.drop_index("pts_idx")


def test_layout_pruning_drops_partitions(lctx, points_df):
    lay = lctx.create_index(points_df, ["x", "y"], "pts_idx2", kind="zorder",
                            num_partitions=16)
    cands = lay.candidate_partitions([0.0, 0.0], [50.0, 50.0])
    assert 0 < len(cands) < len(lay.bounds), (
        "a small corner box should prune most z-ordered partitions"
    )
    lctx.drop_index("pts_idx2")


def test_layout_persist_load_roundtrip(lctx, points_df, tmp_path):
    from simba_spark.operators.filters import range_query

    lctx.create_index(points_df, ["x", "y"], "pl_idx", kind="zorder")
    path = str(tmp_path / "pl_idx")
    lctx.persist_index("pl_idx", path)
    lctx.drop_index("pl_idx")
    assert not lctx.has_index("pl_idx")

    lay = lctx.load_index("pl_loaded", path)
    lo, hi = (100.0, 100.0), (300.0, 300.0)
    naive = range_query(points_df, ["x", "y"], lo, hi)
    routed = lctx.range_query(lay.data, ["x", "y"], lo, hi)
    # regression: loaded layouts must recompute partition bounds — reader
    # partitioning differs from writer partitioning
    assert _ids(routed) == _ids(naive)
    assert lay.data.columns == points_df.columns
    lctx.drop_index("pl_loaded")


def test_layout_ddl_surface(lctx, points_df):
    lctx.create_index(points_df, ["x"], "ddl_idx", kind="range")
    assert lctx.has_index("ddl_idx")
    info = lctx.show_index()
    assert any(i["name"] == "ddl_idx" and i["kind"] == "range" for i in info)
    assert lctx.drop_index("ddl_idx")
    assert not lctx.drop_index("ddl_idx")
