"""Distance join: all pairs (a, b) with dist(a.key, b.key) <= r (closed).

The reference ships five distance-join algorithms selected by conf
(ref: SimbaConf.scala:113, dispatch SimbaSessionState.scala:191-227):
CDJSpark (cartesian), BDJSpark/-R (block nested loop), RDJSpark and
DJSpark (grid / SJMR partitioned joins, ref: DJSpark.scala:36-118).
Semantics are identical across all five — only the physical plan differs
(SURVEY.md §2.3). Our engine keeps that shape: one semantic contract,
three DataFrame programs behind a router:

- ``grid``      (default; DJSpark/RDJSpark analog): assign each left row
  its grid cell, explode each right row to every cell its r-buffer
  touches, equi-join on cell id, refine with the exact distance
  predicate. The cell equi-join is a plain shuffle join ⇒ Catalyst/AQE
  handle partitioning, skew splitting, and map-side combine. Replication
  factor is (1 + 2r/cell)^d (cell defaults to 2r ⇒ 2^d).
- ``broadcast`` (CDJ/BDJ analog for a small side): broadcast-hash the
  smaller side and filter — zero shuffle.
- ``cross``     (CDJSpark parity fallback): cartesian + filter.

Scale notes (100 TB design point): the grid join shuffles each side once
on the cell key — the same two-shuffle budget as the reference's SJMR —
but needs no driver-side sampling job, no broadcast of duplication
lists, and no zipPartitions: Catalyst's shuffle-hash/sort-merge machinery
replaces all of it (ref comparison: DJSpark.scala:57-114). Skewed cells
are split by AQE (spark.sql.adaptive.skewJoin).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dist2_cols


def _session_algo(df: DataFrame, key: str, default: str) -> str:
    """Algorithm default from the Spark SESSION conf — the reference's
    conf-driven dispatch (simba.join.distanceJoin / simba.join.knnJoin,
    ref: SimbaSessionState.scala:191-227): users flip the physical plan
    with spark.conf.set(...) and no code change. An explicit ``algo=``
    argument (or a SimbaContext, which injects its own SimbaConf value)
    always wins over the session conf."""
    try:
        v = df.sparkSession.conf.get(key, None)
        if v is not None:
            return str(v)
    except Exception:
        pass
    return default


def _prefix_columns(df: DataFrame, prefix: str) -> DataFrame:
    """Disambiguate output columns: reference output is left.output ++
    right.output (ref: plans/SpatialJoin.scala:28-44); Spark needs unique
    names, so the caller can pass prefixes ('' keeps names)."""
    if not prefix:
        return df
    return df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])


def distance_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    radius: float,
    algo: Optional[str] = None,
    cell_size: Optional[float] = None,
    left_prefix: str = "",
    right_prefix: str = "",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Inner theta-join on ``dist(left.key, right.key) <= radius``.

    Output = prefixed left columns ++ prefixed right columns, inner
    matches only (ref: SpatialJoin.scala:28-44 and the closed <= r bound,
    RTree.scala:143-162 / BDJSpark.scala:79).
    """
    r = float(radius)
    assert r >= 0.0
    assert len(left_cols) == len(right_cols), "dimension mismatch"
    if algo is None:
        algo = _session_algo(left, "simba_spark.join.distanceJoin", "grid")

    lp = _prefix_columns(left, left_prefix)
    rp = _prefix_columns(right, right_prefix)
    lcols = [f"{left_prefix}{c}" for c in left_cols]
    rcols = [f"{right_prefix}{c}" for c in right_cols]
    pred = dist2_cols(lcols, rcols) <= F.lit(r * r)

    if algo == "cross":
        return lp.crossJoin(rp).filter(pred)
    if algo == "broadcast":
        return lp.crossJoin(F.broadcast(rp)).filter(pred)
    if algo != "grid":
        raise ValueError(f"unknown distance-join algo: {algo}")

    # --- grid-cell equi-join (DJSpark analog) ---------------------------
    s = float(cell_size) if cell_size else (2.0 * r if r > 0 else 1.0)
    d = len(lcols)

    # left row -> its own cell (exactly once; pairs are emitted at most
    # once, so no dedup bookkeeping — the reference needed dup-id lists,
    # DJSpark.scala:62-79, because both sides were replicated)
    lcell = F.struct(
        *[F.floor(F.col(c) / F.lit(s)).cast("long").alias(f"c{i}") for i, c in enumerate(lcols)]
    )
    lg = lp.withColumn("__cell", lcell)

    # right row -> every cell whose box intersects its closed r-buffer
    lo = [F.floor((F.col(c) - F.lit(r)) / F.lit(s)).cast("long") for c in rcols]
    hi = [F.floor((F.col(c) + F.lit(r)) / F.lit(s)).cast("long") for c in rcols]
    # sequence(lo, hi) per dim, cross-product via nested explode
    rg = rp
    for i in range(d):
        rg = rg.withColumn(f"__c{i}", F.explode(F.sequence(lo[i], hi[i])))
    rcell = F.struct(*[F.col(f"__c{i}").alias(f"c{i}") for i in range(d)])
    rg = rg.withColumn("__cell", rcell).drop(*[f"__c{i}" for i in range(d)])

    if num_partitions:
        # simba.join.partitions analog (ref: SimbaConf.scala:112): pin
        # the cell-join parallelism; both exchanges are co-partitioned so
        # the join reuses them instead of adding its own
        lg = lg.repartition(int(num_partitions), "__cell")
        rg = rg.repartition(int(num_partitions), "__cell")
    joined = lg.join(rg, on="__cell", how="inner").filter(pred).drop("__cell")
    return joined


def self_distance_join(
    df: DataFrame,
    cols: Sequence[str],
    radius: float,
    id_col: str,
    algo: str = "grid",
    **kw,
) -> DataFrame:
    """Self-join convenience: pairs (a, b) with id_a < id_b within radius —
    the building block of distance-based dedup (SURVEY §2.7)."""
    out = distance_join(
        df, df, cols, cols, radius,
        algo=algo, left_prefix="a_", right_prefix="b_", **kw,
    )
    return out.filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
