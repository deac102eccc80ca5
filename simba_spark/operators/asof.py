"""As-of (point-in-time) join: each left row matched to the single
closest right row at-or-before (backward) / at-or-after (forward) its
timestamp, per key.

The workhorse of time-series enrichment (trade→quote, event→latest
model snapshot, click→most recent purchase). Vanilla Spark plans the
naive formulation — an inequality theta-join plus a per-left argmax —
as BroadcastNestedLoop or a shuffle join followed by a heavy groupBy.
Here it is ONE shuffle and ZERO join nodes: both sides are tagged and
unioned, then a per-key time-ordered running `last(..., ignorenulls)`
window carries the most recent right payload forward onto each left
row. That is the merge-join formulation databases use for ASOF JOIN
(DuckDB/QuestDB publish the same strategy), expressed with Catalyst
window primitives so whole-stage codegen and AQE apply.

Scale: cost class of sessionize — shuffle on the key columns, then a
per-key sort. No replication, no candidate pairs, no broadcast; the
window state is a single struct (the running payload), so memory per
partition is O(1) beyond the sort. A pathologically hot key means one
large sorted partition — the same bound as any per-key window; with a
`tolerance`, pre-filtering right rows to the tolerated time range
bounds that too.

Semantics (documented, deterministic):
- backward: match the greatest right time <= left time (< if
  `strict`); forward: the least right time >= left time (> if
  `strict`); nearest: the closer of the two (backward on equal
  distance, matching pandas merge_asof).
- Ties between right rows at the same time are broken toward the
  greatest `tiebreak_col` value when given; otherwise input order
  (nondeterministic under ties — supply a tiebreak for stable runs).
- Left rows with a NULL time never match; right rows with a NULL time
  never produce matches. NULL keys behave like any groupBy key (NULLs
  group together).
- `how='left'` (default) keeps unmatched left rows with NULL right
  columns; `how='inner'` drops them.

The reference engine has no as-of join — this is a north-star
extension (SURVEY.md §2.7); the nearest reference analog is the
1-D index family (TreeMapIndexedRelation, ref:
IndexedRelation.scala:127-185) whose ceiling/floor lookups an as-of
probe would use on a single machine.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _is_timestamp(df: DataFrame, col: str) -> bool:
    t = dict(df.dtypes).get(col, "")
    return t.startswith("timestamp")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: Optional[str] = None,
    *,
    direction: str = "backward",
    strict: bool = False,
    tolerance: Optional[int] = None,
    how: str = "left",
    right_prefix: str = "r_",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """As-of join `left` to `right` on key columns `on`.

    Parameters
    ----------
    on : key column name(s), present in both frames.
    left_time / right_time : time columns (right defaults to left's
        name). TIMESTAMP (compared in exact integer microseconds) or
        any mutually comparable numeric type.
    direction : 'backward' (greatest right time <= left time, the
        default), 'forward' (least right time >= left time), or
        'nearest' (whichever of the two is closer in time; equal
        distances resolve backward, the pandas merge_asof convention —
        computed as two windows over ONE shuffle).
    strict : exclude equal times (use < / > instead of <= / >=).
    tolerance : max allowed |left time - right time|, in MICROSECONDS
        for timestamp columns, else in the columns' own unit. Matches
        farther than this are nulled (how='left') or dropped
        (how='inner'). Setting it also EAGERLY pre-filters the right
        side to [min(left time)-tolerance, max(left time)+tolerance]
        (one 2-scalar driver job) so the union+sort only sees rows that
        could possibly match.
    how : 'left' or 'inner'.
    right_prefix : prefix for right payload columns in the output.
    tiebreak_col : right column breaking equal-time ties toward its
        greatest value (e.g. an event id).

    Returns all left columns plus every non-key right column as
    ``{right_prefix}{name}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column {k!r} missing from one side")
    if left_time not in left.columns:
        raise ValueError(f"left_time {left_time!r} not in left")
    if rt not in right.columns:
        raise ValueError(f"right_time {rt!r} not in right")
    if rt in keys:
        raise ValueError(
            f"right_time {rt!r} is also a join key — the right time column "
            "is carried as payload and cannot be listed in `on`"
        )
    if _is_timestamp(left, left_time) != _is_timestamp(right, rt):
        raise ValueError(
            f"time columns are not mutually comparable: left {left_time!r} is "
            f"{dict(left.dtypes)[left_time]}, right {rt!r} is "
            f"{dict(right.dtypes)[rt]} — cast one side so both are timestamps "
            "or both are numeric"
        )
    if tiebreak_col is not None and tiebreak_col not in right.columns:
        raise ValueError(f"tiebreak_col {tiebreak_col!r} not in right")

    rpay = [c for c in right.columns if c not in keys]
    out_names = [right_prefix + c for c in rpay]
    collide = set(out_names) & set(left.columns)
    if collide:
        raise ValueError(
            f"output columns {sorted(collide)} collide with left columns — "
            "pick a different right_prefix"
        )
    for h in ("__t", "__side", "__rpay", "__m", "__tb", "__mt", "__mb", "__mf"):
        if h in left.columns or h in right.columns:
            raise ValueError(f"reserved column name {h!r} in input")

    if tolerance is not None and not left.isStreaming and not right.isStreaming:
        # With a tolerance, a right row farther than `tolerance` from the
        # span of left times can never survive the gate below (if the
        # closest candidate is out of tolerance, every farther one is
        # too), so pre-filter the right side before the union+sort. One
        # 2-scalar driver job over the left time column; at 100 TB with
        # a tight tolerance this turns a full right-side sort input into
        # a bounded one. Eager by design — documented in the docstring.
        b = left.select(
            F.min(left_time).alias("lo"), F.max(left_time).alias("hi")
        ).first()
        if b is not None and b["lo"] is not None:
            if _is_timestamp(left, left_time):
                ivl = "INTERVAL %d MICROSECOND" % int(tolerance)
                lo = F.lit(b["lo"]) - F.expr(ivl)
                hi = F.lit(b["hi"]) + F.expr(ivl)
            else:
                lo = F.lit(b["lo"]) - F.lit(tolerance)
                hi = F.lit(b["hi"]) + F.lit(tolerance)
            right = right.filter(F.col(rt).between(lo, hi))

    # the tiebreak keeps its NATIVE type in the window ordering (a cast
    # to long would NULL out string ids — or throw under ANSI mode —
    # silently defeating the determinism guarantee); the left side
    # contributes a typed NULL so the union stays schema-consistent
    tb_type = right.schema[tiebreak_col].dataType if tiebreak_col else None
    lhs = left.select(
        *left.columns,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        (
            F.lit(None).cast(tb_type) if tiebreak_col else F.lit(None).cast("long")
        ).alias("__tb"),
    )
    rhs = right.filter(F.col(rt).isNotNull()).select(
        *keys,
        F.col(rt).alias("__t"),
        F.lit(0).alias("__side"),
        (
            F.col(tiebreak_col) if tiebreak_col else F.lit(0).cast("long")
        ).alias("__tb"),
        F.struct(*[F.col(c) for c in rpay]).alias("__rpay"),
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    # ordering: time (reversed for forward), then side so that at equal
    # times the right row is visible iff the comparison is inclusive,
    # then the tiebreak so the LAST equal-time right row carries the
    # greatest tiebreak value into last(..., ignorenulls).
    side_ord = F.col("__side").asc() if not strict else F.col("__side").desc()

    def running_last(t_ord):
        w = (
            Window.partitionBy(*keys)
            .orderBy(t_ord, side_ord, F.col("__tb").asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last("__rpay", ignorenulls=True).over(w)
        # a NULL left time sorts first/last and must never match
        return F.when(F.col("__t").isNull(), F.lit(None)).otherwise(m)

    if direction == "nearest":
        # both candidates from the SAME shuffled union: the second
        # window re-sorts within partitions but adds no exchange
        res = (
            u.withColumn("__mb", running_last(F.col("__t").asc()))
            .withColumn("__mf", running_last(F.col("__t").desc()))
            .filter(F.col("__side") == 1)
        )
        if _is_timestamp(left, left_time):
            db = F.abs(F.expr("timestampdiff(MICROSECOND, __mb.`%s`, __t)" % rt))
            df_ = F.abs(F.expr("timestampdiff(MICROSECOND, __mf.`%s`, __t)" % rt))
        else:
            db = F.abs(F.col("__t") - F.col("__mb")[rt])
            df_ = F.abs(F.col("__mf")[rt] - F.col("__t"))
        # ties at equal distance resolve backward (pandas merge_asof
        # 'nearest' convention)
        res = res.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(db <= df_, F.col("__mb"))
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")
    else:
        t_ord = (
            F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
        )
        res = u.withColumn("__m", running_last(t_ord)).filter(
            F.col("__side") == 1
        )

    if tolerance is not None:
        res = res.withColumn("__mt", F.col("__m")[rt])
        if _is_timestamp(left, left_time):
            # timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ alike
            # (unix_micros rejects NTZ)
            diff = F.expr("timestampdiff(MICROSECOND, __mt, __t)")
        else:
            diff = F.col("__t") - F.col("__mt")
        in_tol = F.abs(diff) <= F.lit(tolerance)
        res = res.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None))
        ).drop("__mt")

    if how == "inner":
        res = res.filter(F.col("__m").isNotNull())

    out = res.select(
        *left.columns,
        *[F.col("__m")[c].alias(o) for c, o in zip(rpay, out_names)],
    )
    return out
