"""Interval join: pairs (a, b) with a.start <= b.point <= a.end (closed).

The 1-D sibling of the grid distance join, and the op behind temporal
range joins (event-in-session, reading-in-window). Vanilla Spark plans
an inequality join as BroadcastNestedLoop/cartesian; here it becomes a
binned equi-join Catalyst/AQE can shuffle, skew-split, and co-locate
(same program shape as DJSpark's cells, ref: DJSpark.scala:36-118 in
1-D; the reference's 1-D structure is the interval tree,
index/IntervalTree analog — our bins do its job distributedly).

Plan: intervals explode to every bin they touch; a point lives in
exactly ONE bin per tier, so the bin equi-join emits each qualifying
pair once — no dedup pass. Exactness never depends on the bin width (a
closed per-row refine runs on top); width only tunes replication vs bin
population.

Default widths are TWO-TIER so heavy-tailed inputs degrade instead of
raising: tier 1 is the fine width (avg interval length); any interval
that would span more than `tier_cap` fine bins is binned at the coarse
tier-2 width (the max interval length) instead, where it spans at most
2 bins. Replication is therefore bounded by construction — the
`max_bins_per_interval` guard only applies when the caller pins an
explicit `bin_width` (single-tier mode).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fine-tier replication bound: an interval spanning more fine bins
#: than this is routed to the coarse tier
_TIER_CAP = 64


def _tier_stats(lengths_df, length_col):
    """1-row broadcast frame: fine width (avg length), coarse width
    (max length), and whether any interval needs the coarse tier."""
    return F.broadcast(
        lengths_df.agg(
            F.greatest(F.avg(length_col), F.lit(1e-9)).alias("__bw"),
            F.greatest(F.max(length_col), F.lit(1e-9)).alias("__bw2"),
        ).select(
            "__bw",
            F.greatest("__bw2", "__bw").alias("__bw2"),
            (
                F.col("__bw2") > F.col("__bw") * F.lit(float(_TIER_CAP))
            ).alias("__has_long"),
        )
    )


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

    `bin_width=None` (default) uses the two-tier scheme described in
    the module docstring — robust to any interval-length distribution,
    never raises. An explicit `bin_width` selects single-tier binning,
    where `max_bins_per_interval` guards the explode against a
    pathological width (an interval spanning more bins than the cap
    raises at runtime rather than silently materializing an unbounded
    replication).
    """
    lp = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    rp = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    s = F.col(f"{left_prefix}{start_col}").cast("double")
    e = F.col(f"{left_prefix}{end_col}").cast("double")
    p = F.col(f"{right_prefix}{point_col}").cast("double")

    if bin_width is not None:
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
        return (
            lg.join(rg, on="__bin", how="inner")
            .filter((s <= p) & (p <= e))
            .drop("__bin")
        )

    stats = _tier_stats(
        left.select(
            (F.col(end_col).cast("double") - F.col(start_col).cast("double")).alias(
                "__len"
            )
        ),
        "__len",
    )
    lp = lp.crossJoin(stats)
    rp = rp.crossJoin(stats)
    bw1, bw2, has_long = F.col("__bw"), F.col("__bw2"), F.col("__has_long")

    # each interval is binned at ONE tier, picked by its own length:
    # fine unless it would replicate past ~the cap, else coarse (≤ 2
    # bins there by construction since bw2 >= every length). The tier
    # predicate is the SAME arithmetic as __has_long (len > bw1*cap,
    # where max(len) reproduces the aggregated __bw2 bit-for-bit), so a
    # tier-2 interval existing implies points probe tier 2 — no
    # boundary-rounding mismatch between the two gates.
    tier = F.when(e - s <= bw1 * F.lit(float(_TIER_CAP)), F.lit(1)).otherwise(
        F.lit(2)
    )
    tbw = F.when(tier == 1, bw1).otherwise(bw2)
    lg = lp.withColumn("__tier", tier).withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(s / tbw).cast("long"), F.floor(e / tbw).cast("long"))),
    )
    # a point probes every tier in use (1 row when the data has no
    # long intervals); it has exactly one bin per tier, and an interval
    # lives at exactly one tier — so each qualifying pair still joins
    # exactly once
    rg = rp.withColumn(
        "__tier",
        F.explode(
            F.when(has_long, F.array(F.lit(1), F.lit(2))).otherwise(
                F.array(F.lit(1))
            )
        ),
    ).withColumn(
        "__bin",
        F.floor(p / F.when(F.col("__tier") == 1, bw1).otherwise(bw2)).cast("long"),
    )
    lg = lg.drop("__bw", "__bw2", "__has_long")
    rg = rg.drop("__bw", "__bw2", "__has_long")
    return (
        lg.join(rg, on=["__tier", "__bin"], how="inner")
        .filter((s <= p) & (p <= e))
        .drop("__tier", "__bin")
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
    bin width.

    `bin_width=None` (default) is two-tier (see module docstring): an
    interval's OWN tier is picked by its span; pairs meet at the COARSER
    of their two tiers, so fine-tier intervals also carry their (≤ 2)
    coarse-tier bins when long intervals exist anywhere. The pair is
    emitted only where the joined tier equals max(own tiers) and the
    bin is canonical — still exactly once, never raises."""
    lp = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    rp = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    a_s = F.col(f"{left_prefix}{left_start}").cast("double")
    a_e = F.col(f"{left_prefix}{left_end}").cast("double")
    b_s = F.col(f"{right_prefix}{right_start}").cast("double")
    b_e = F.col(f"{right_prefix}{right_end}").cast("double")

    if bin_width is not None:
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
        canon = F.floor(F.greatest(a_s, b_s) / bw).cast("long")
        return (
            lg.join(rg, on="__bin", how="inner")
            .filter((a_s <= b_e) & (b_s <= a_e) & (F.col("__bin") == canon))
            .drop("__bin")
        )

    # two-tier stats over BOTH sides' lengths (either side may carry
    # the long tail)
    stats = _tier_stats(
        left.select(
            (F.col(left_end).cast("double") - F.col(left_start).cast("double")).alias(
                "__len"
            )
        ).unionByName(
            right.select(
                (
                    F.col(right_end).cast("double")
                    - F.col(right_start).cast("double")
                ).alias("__len")
            )
        ),
        "__len",
    )
    lp = lp.crossJoin(stats)
    rp = rp.crossJoin(stats)
    bw1, bw2, has_long = F.col("__bw"), F.col("__bw2"), F.col("__has_long")

    def tiered(s, e):
        """(own_tier, exploded (tier, bin) rows): own-tier bins always;
        coarse-tier bins additionally for fine intervals when long
        intervals exist anywhere (they must be able to meet them)."""
        lo1 = F.floor(s / bw1).cast("long")
        hi1 = F.floor(e / bw1).cast("long")
        # tier by LENGTH with the exact __has_long arithmetic (see
        # interval_join) so "a tier-2 interval exists" and "__has_long"
        # can never disagree at a rounding boundary
        own = F.when(e - s <= bw1 * F.lit(float(_TIER_CAP)), F.lit(1)).otherwise(
            F.lit(2)
        )
        lo2 = F.floor(s / bw2).cast("long")
        hi2 = F.floor(e / bw2).cast("long")
        fine = F.when(
            own == 1,
            F.transform(
                F.sequence(lo1, hi1),
                lambda b: F.struct(F.lit(1).alias("t"), b.alias("b")),
            ),
        ).otherwise(F.array().cast("array<struct<t:int,b:long>>"))
        coarse = F.when(
            has_long | (own == 2),
            F.transform(
                F.sequence(lo2, hi2),
                lambda b: F.struct(F.lit(2).alias("t"), b.alias("b")),
            ),
        ).otherwise(F.array().cast("array<struct<t:int,b:long>>"))
        return own, F.explode(F.concat(fine, coarse))

    l_own, l_bins = tiered(a_s, a_e)
    r_own, r_bins = tiered(b_s, b_e)
    lg = lp.withColumn("__own", l_own).withColumn("__tb", l_bins)
    rg = rp.withColumn("__own", r_own).withColumn("__tb", r_bins)
    lg = lg.select(
        *[c for c in lg.columns if c not in ("__tb", "__bw", "__bw2", "__has_long")],
        F.col("__tb.t").alias("__t"),
        F.col("__tb.b").alias("__bin"),
    ).withColumnRenamed("__own", "__a_own")
    rg = rg.select(
        *[c for c in rg.columns if c not in ("__tb", "__has_long")],
        F.col("__tb.t").alias("__t"),
        F.col("__tb.b").alias("__bin"),
    ).withColumnRenamed("__own", "__b_own")
    # keep both widths on the right side only (dropped from the left so
    # the join doesn't see duplicate names) — the canonical filter
    # needs them after the join
    rg = rg.withColumnRenamed("__bw", "__rbw")
    # pair meets at tier T = max(own tiers), in the canonical bin of
    # that tier — exactly one emission per overlapping pair
    pair_tier = F.greatest(F.col("__a_own"), F.col("__b_own"))
    joined = lg.join(rg, on=["__t", "__bin"], how="inner")
    return (
        joined.filter(
            (a_s <= b_e)
            & (b_s <= a_e)
            & (F.col("__t") == pair_tier)
            & (
                F.col("__bin")
                == F.floor(
                    F.greatest(a_s, b_s)
                    / F.when(F.col("__t") == 1, F.col("__rbw")).otherwise(
                        F.col("__bw2")
                    )
                ).cast("long")
            )
        )
        .drop("__t", "__bin", "__a_own", "__b_own", "__rbw", "__bw2")
    )
