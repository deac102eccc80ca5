"""Driver-side property tests (hypothesis) for the partitioner
boundary builders — pure numpy/python, no Spark session, so hundreds
of random inputs run in seconds. The Spark Column expressions are
pinned to these models by tests/test_partitioners.py."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simba_spark.partitioners import (_quantile_cuts, build_kd_tree,
                                      kd_walk)

vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=0, max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(vals, st.integers(min_value=1, max_value=32))
def test_quantile_cuts_sorted_dedup_bounded(xs, n):
    cuts = _quantile_cuts(np.asarray(xs, dtype="float64"), n)
    assert cuts == sorted(cuts)
    assert len(cuts) == len(set(cuts))
    assert len(cuts) <= max(0, n - 1)
    if xs:
        assert all(min(xs) <= c <= max(xs) for c in cuts)


pts2 = st.lists(
    st.tuples(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=150,
)


@settings(max_examples=150, deadline=None)
@given(pts2, st.integers(min_value=1, max_value=24))
def test_kd_tree_total_compact_and_walkable(points, num):
    """Every point lands in exactly one leaf; leaf ids are compact
    0..n_leaves-1; n_leaves never exceeds num; all leaves reachable
    when the sample has enough distinct structure."""
    s = np.asarray(points, dtype="float64")
    tree, n_leaves = build_kd_tree(s, num)
    assert 1 <= n_leaves <= num
    ids = [kd_walk(tree, p) for p in s]
    assert all(0 <= i < n_leaves for i in ids)
    # compactness: the id space has no holes across the whole tree
    def leaves(node):
        if node[0] == "leaf":
            return [node[1]]
        return leaves(node[3]) + leaves(node[4])
    assert sorted(leaves(tree)) == list(range(n_leaves))


@settings(max_examples=100, deadline=None)
@given(pts2)
def test_kd_tree_distinct_points_split_fully(points):
    """With >= num distinct points, the tree reaches the full num
    leaves and the sample spreads over more than one leaf (num > 1)."""
    s = np.unique(np.asarray(points, dtype="float64"), axis=0)
    num = min(4, len(s))
    tree, n_leaves = build_kd_tree(s, num)
    assert n_leaves == num
    if num > 1:
        assert len({kd_walk(tree, p) for p in s}) == num
