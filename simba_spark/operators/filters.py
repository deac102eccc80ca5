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
    """
    d2 = dist2(cols, query_point).alias("__simba_d2")
    order = [F.col("__simba_d2").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    out = (
        df.withColumn("__simba_d2", d2)
        .orderBy(*order)
        .limit(int(k))
        .drop("__simba_d2")
    )
    return out


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
