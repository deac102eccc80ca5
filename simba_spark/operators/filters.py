"""Spatial point filters: range, circle-range, kNN, and kNN boolean algebra.

Reference semantics reproduced here (SURVEY.md §2.2, §2.4):

- ``range_query``   — ``InRange`` closed-rectangle filter
  (ref: expression/InRange.scala:31-47)
- ``circle_range``  — ``InCircleRange`` closed ball filter
  (ref: expression/InCircleRange.scala:32-50)
- ``knn``           — global top-k by L2 distance, exactly k rows
  (ref: expression/InKNN.scala:29-42; physical path
  FilterExec.scala:48-49 ``takeOrdered(k)``)
- ``knn_and / knn_or / knn_not`` — set semantics for boolean
  combinations containing a kNN term
  (ref: execution/FilterExec.scala:51-68)

Scale notes: range/circle filters are sargable Column predicates ⇒
Parquet row-group pruning + whole-stage codegen; no shuffle. kNN uses
``orderBy(dist).limit(k)`` which Spark executes as TakeOrderedAndProject:
per-partition partial top-k then a single k-row merge — never a global
sort, never more than k rows to the driver (SURVEY §4.2 two-phase analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import dist2, in_circle_range, in_range


def range_query(
    df: DataFrame,
    cols: Sequence,
    low: Sequence[float],
    high: Sequence[float],
    registry=None,
) -> DataFrame:
    """All rows whose point lies in the closed rectangle [low, high].

    If `registry` holds a layout for df, the scan is first pruned to the
    partitions whose bounds intersect the query box (global-index analog).
    """
    if registry is not None:
        df = registry.prune_for_range(df, cols, low, high)
    return df.filter(in_range(cols, low, high))


def circle_range(
    df: DataFrame,
    cols: Sequence,
    center: Sequence[float],
    radius: float,
    registry=None,
) -> DataFrame:
    """All rows within closed distance `radius` of `center`.

    The sargable MBR pre-filter comes first so the Parquet reader can
    skip row groups; the exact circle test runs on survivors only.
    """
    r = float(radius)
    lo = [c - r for c in center]
    hi = [c + r for c in center]
    if registry is not None:
        # partition-covered short-circuit (ref: Dist.furthest,
        # spatial/Dist.scala:24-34): buckets the ball swallows whole
        # scan with no per-row distance arithmetic
        routed = registry.circle_scan(df, cols, center, r)
        if routed is not None:
            return routed
        df = registry.prune_for_range(df, cols, lo, hi)
    return df.filter(in_range(cols, lo, hi)).filter(
        in_circle_range(cols, center, r)
    )


def knn(
    df: DataFrame,
    cols: Sequence,
    query_point: Sequence[float],
    k: int,
    tiebreak: Optional[str] = None,
    registry=None,
) -> DataFrame:
    """Exactly-k nearest rows to `query_point` by L2 distance.

    Ties: the reference breaks ties arbitrarily (``keepSame=false``,
    SURVEY §1.5). For deterministic, oracle-hashable output we expose an
    optional `tiebreak` column (usually the table's id) appended to the
    ordering. Output schema == input schema (distance column is internal).

    With a registered layout the two-phase bound-and-prune of the
    reference's indexed scan (ref: IndexedRelationScan.scala:117-151)
    runs instead: phase 1 answers kNN over the smallest partition prefix
    (by bounds-box min-dist) holding >= k rows, its kth distance θ then
    prunes the final scan to partitions with minDist(q, bounds) <= θ.
    Only k distances ever reach the driver; at 10k partitions the final
    scan touches a handful instead of all.
    """
    lay = registry.layout_for(df) if registry is not None else None
    if (
        lay is not None
        and lay.kind == "zorder"
        and list(cols) == lay.cols
        and lay.bounds
        and lay.bits > 0
    ):
        return _knn_via_layout(lay, cols, query_point, k, tiebreak)
    return _knn_scan(df, cols, query_point, k, tiebreak)


def _knn_scan(df, cols, query_point, k, tiebreak):
    d2 = dist2(cols, query_point).alias("__simba_d2")
    order = [F.col("__simba_d2").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    return (
        df.withColumn("__simba_d2", d2)
        # a null distance (null key coordinates) never qualifies — without
        # this, Spark's NULLS-FIRST asc would hand nulls the top-k slots
        .filter(F.col("__simba_d2").isNotNull())
        .orderBy(*order)
        .limit(int(k))
        .drop("__simba_d2")
    )


def _bounds_mindist2(bounds_row, cols, q):
    """Squared min distance from q to a partition's bounds box — 0 if q
    is inside (driver-side analog of MBR.minDist, ref: MBR.scala:78-89)."""
    s = 0.0
    for i in range(len(cols)):
        lo, hi = bounds_row.get(f"min_{i}"), bounds_row.get(f"max_{i}")
        if lo is None or hi is None:
            return float("inf")
        d = max(float(lo) - q[i], 0.0, q[i] - float(hi))
        s += d * d
    return s


def _knn_via_layout(lay, cols, query_point, k, tiebreak):
    """Two-phase bound-and-prune over a z-order layout
    (ref: IndexedRelationScan.scala:117-151), with pruning expressed as
    sargable z-interval predicates (plus bucket-directory pruning for
    persisted layouts) so the skipped buckets cost no I/O — not a
    row filter over a full scan.

    Phase 1: kNN over the smallest bounds-ordered bucket prefix holding
    >= k rows (any >=k-row subset yields a valid upper bound θ).
    Phase 2: exact kNN over the z-cover of the ball box [q-θ, q+θ] —
    every true neighbor has dist <= θ, hence lies inside the cover.
    Only k distances ever reach the driver."""
    q = [float(x) for x in query_point]
    k = int(k)
    ranked = sorted(lay.bounds, key=lambda b: _bounds_mindist2(b, cols, q))

    # phase 1: smallest bounds-ordered bucket prefix holding >= k rows
    sel, acc = [], 0
    for b in ranked:
        sel.append(b)
        acc += int(b["count"])
        if acc >= k:
            break
    if acc < k or len(sel) == len(ranked):
        return _knn_scan(lay.pruned_scan(None), cols, q, k, tiebreak)  # tiny table
    sel_zbs = [int(b["zb"]) for b in sel]
    phase1 = _knn_scan(
        lay.pruned_scan(lay.z_ranges_for_buckets(sel_zbs)), cols, q, k, tiebreak
    )
    # θ = kth distance of phase 1 (exactly k scalars to the driver — the
    # same driver traffic as the reference's takeOrdered merge)
    d2_rows = phase1.select(dist2(cols, q).alias("d2")).collect()
    if len(d2_rows) < k:
        # bucket counts promised >= k rows but null coordinates left
        # phase 1 short — its max distance is NOT a kth-NN bound, so
        # pruning with it could drop true neighbors; scan exactly
        return _knn_scan(lay.pruned_scan(None), cols, q, k, tiebreak)
    theta2 = max(r["d2"] for r in d2_rows)
    theta = theta2 ** 0.5

    # phase 2: if no other bucket's box can hold a closer-or-tied point,
    # phase 1 is final; else rescan the ball box via its z-cover
    others_reach = any(
        _bounds_mindist2(b, cols, q) <= theta2
        for b in ranked
        if int(b["zb"]) not in set(sel_zbs)
    )
    if not others_reach:
        return phase1
    ball_lo = [c - theta for c in q]
    ball_hi = [c + theta for c in q]
    ranges = lay.z_ranges_for_box(ball_lo, ball_hi)
    return _knn_scan(lay.pruned_scan(ranges), cols, q, k, tiebreak)


# ---------------------------------------------------------------------------
# Boolean combinations containing a kNN term get SET semantics
# (ref: FilterExec.scala:51-68): A AND knn = intersection of row sets,
# A OR knn = union + distinct, NOT knn = subtract. Plain predicates keep
# ordinary row-filter semantics.


def knn_and(df: DataFrame, knn_df: DataFrame, condition: Column) -> DataFrame:
    """Rows satisfying `condition` ∩ rows in the kNN result."""
    return df.filter(condition).intersect(knn_df)


def knn_or(df: DataFrame, knn_df: DataFrame, condition: Column) -> DataFrame:
    """Rows satisfying `condition` ∪ kNN rows, de-duplicated."""
    return df.filter(condition).union(knn_df).distinct()


def knn_not(df: DataFrame, knn_df: DataFrame) -> DataFrame:
    """Rows NOT in the kNN result (multiset subtract, ref: RDD.subtract)."""
    return df.exceptAll(knn_df)
