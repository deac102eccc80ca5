"""Interval join: pairs (a, b) with a.start <= b.point <= a.end (closed).

The 1-D sibling of the grid distance join, and the op behind temporal
range joins (event-in-session, reading-in-window). Vanilla Spark plans
an inequality join as BroadcastNestedLoop/cartesian; here it becomes a
binned equi-join Catalyst/AQE can shuffle, skew-split, and co-locate
(same program shape as DJSpark's cells, ref: DJSpark.scala:36-118 in
1-D; the reference's 1-D structure is the interval tree,
index/IntervalTree analog — our bins do its job distributedly).

Plan: intervals explode to every bin they touch; a point lives in
exactly ONE bin, so the bin equi-join emits each qualifying pair once —
no dedup pass. Exactness never depends on the bin width (a closed
per-row refine runs on top); width only tunes replication vs bin
population. Default width: avg interval length (1-row broadcast
aggregate, no driver job), floored so a degenerate all-zero-length
input still bins.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bin_width: Optional[float] = None,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """All (interval, point) pairs with start <= point <= end, closed.

    `bin_width=None` derives the width from the average interval length
    (broadcast aggregate). `max_bins_per_interval` guards the explode
    against a pathological width (an interval spanning more bins than
    the cap raises at runtime rather than silently materializing an
    unbounded replication).
    """
    lp = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    rp = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    s = F.col(f"{left_prefix}{start_col}").cast("double")
    e = F.col(f"{left_prefix}{end_col}").cast("double")
    p = F.col(f"{right_prefix}{point_col}").cast("double")

    if bin_width is None:
        stats = F.broadcast(
            left.agg(
                F.greatest(
                    F.avg(F.col(end_col).cast("double") - F.col(start_col).cast("double")),
                    F.lit(1e-9),
                ).alias("__bw")
            )
        )
        lp = lp.crossJoin(stats)
        rp = rp.crossJoin(stats)
        bw = F.col("__bw")
    else:
        bw = F.lit(float(bin_width))

    lo_bin = F.floor(s / bw).cast("long")
    hi_bin = F.floor(e / bw).cast("long")
    guarded_hi = F.when(
        hi_bin - lo_bin < int(max_bins_per_interval), hi_bin
    ).otherwise(
        F.raise_error(
            F.lit(
                "interval_join: an interval spans more than "
                f"{max_bins_per_interval} bins — pass a larger bin_width"
            )
        ).cast("long")
    )
    lg = lp.withColumn("__bin", F.explode(F.sequence(lo_bin, guarded_hi)))
    rg = rp.withColumn("__bin", F.floor(p / bw).cast("long"))
    if bin_width is None:
        lg = lg.drop("__bw")
        rg = rg.drop("__bw")
    return (
        lg.join(rg, on="__bin", how="inner")
        .filter((s <= p) & (p <= e))
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: Optional[float] = None,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """All interval pairs that overlap (closed: touching endpoints
    count) — ``a.start <= b.end AND b.start <= a.end``. The
    session-overlap / meeting-conflict join.

    Both sides explode to their bin ranges and equi-join on bin; a pair
    sharing several bins would duplicate, so each pair is emitted ONLY
    in its canonical bin — the bin of ``max(a.start, b.start)``, which
    every truly-overlapping pair provably shares (that point lies inside
    both intervals). Equi-join + filter, no dedup shuffle, exact for any
    bin width."""
    lp = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    rp = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    a_s = F.col(f"{left_prefix}{left_start}").cast("double")
    a_e = F.col(f"{left_prefix}{left_end}").cast("double")
    b_s = F.col(f"{right_prefix}{right_start}").cast("double")
    b_e = F.col(f"{right_prefix}{right_end}").cast("double")

    if bin_width is None:
        stats = F.broadcast(
            left.agg(
                F.greatest(
                    F.avg(
                        F.col(left_end).cast("double")
                        - F.col(left_start).cast("double")
                    ),
                    F.lit(1e-9),
                ).alias("__bw")
            )
        )
        lp = lp.crossJoin(stats)
        rp = rp.crossJoin(stats)
        bw = F.col("__bw")
    else:
        bw = F.lit(float(bin_width))

    def bins(s, e):
        lo = F.floor(s / bw).cast("long")
        hi = F.floor(e / bw).cast("long")
        guarded = F.when(hi - lo < int(max_bins_per_interval), hi).otherwise(
            F.raise_error(
                F.lit(
                    "interval_overlap_join: an interval spans more than "
                    f"{max_bins_per_interval} bins — pass a larger bin_width"
                )
            ).cast("long")
        )
        return F.explode(F.sequence(lo, guarded))

    lg = lp.withColumn("__bin", bins(a_s, a_e))
    rg = rp.withColumn("__bin", bins(b_s, b_e))
    if bin_width is None:
        # keep __bw on the left side only — it rides through the join
        # for the canonical-bin filter, no recompute
        rg = rg.drop("__bw")
    # canonical-bin filter: emit the pair only in the bin where
    # max(starts) lands — every overlapping pair shares exactly that bin
    canon = F.floor(F.greatest(a_s, b_s) / bw).cast("long")
    out = (
        lg.join(rg, on="__bin", how="inner")
        .filter((a_s <= b_e) & (b_s <= a_e) & (F.col("__bin") == canon))
        .drop("__bin")
    )
    return out.drop("__bw") if bin_width is None else out
