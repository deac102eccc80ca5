"""Skyline (Pareto-front) query — the classic multi-criteria dominance
operator of the spatial-database literature (Börzsönyi et al., ICDE'01):
the rows not dominated by any other row, where s dominates r when s is
at least as good on EVERY criterion and strictly better on one. The
data-pipeline uses are multi-objective selection fronts: best
quality-vs-length documents, cheapest-vs-earliest orders,
recall-vs-bytes ANN configurations.

Distributed shape (the sample-prune two-phase every parallel-skyline
paper converges on): a deterministic hash-sample's skyline broadcasts
as a pruning filter — any row dominated by a sample skyline point can
never be in the answer, and a uniformly sampled front prunes the bulk
of a low-dimensional dataset — then the exact dominance anti-join runs
over the SURVIVORS only, with a hard ``max_survivors`` contract (the
theil_sen-style bound: the quadratic pass is explicit and bounded, not
a silent cartesian).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dominates(prefix_s: str, prefix_r: str, cols, dirs):
    """Column: row ``prefix_s`` dominates row ``prefix_r``."""
    at_least = None
    strictly = None
    for c, d in zip(cols, dirs):
        s, r = F.col(f"{prefix_s}.{c}"), F.col(f"{prefix_r}.{c}")
        ge = s <= r if d == "min" else s >= r
        gt = s < r if d == "min" else s > r
        at_least = ge if at_least is None else (at_least & ge)
        strictly = gt if strictly is None else (strictly | gt)
    return at_least & strictly


def skyline(
    df: DataFrame,
    cols: Sequence[str],
    directions: Optional[Sequence[str]] = None,
    sample_cap: int = 2000,
    max_survivors: int = 200_000,
    seed: int = 42,
) -> DataFrame:
    """Exact skyline of ``df`` over ``cols`` with per-column
    ``directions`` ('min'/'max', default all 'min'). Rows with a NULL
    criterion are excluded (dominance is undefined on NULL).

    Exactness does not depend on the sample — pruning only ever drops
    rows some sample point DOMINATES, which are non-answers by
    definition; the sample quality affects the survivor count, and
    ``max_survivors`` bounds the exact pass with a distributed raise.

    Scale: one bounded sample collect (≤ ``sample_cap`` rows), its
    skyline reduced on the driver (sample-sized), ONE broadcast-filter
    corpus pass (codegen'd dominance tests against the literal front),
    then the exact dominance anti-join over survivors only — a
    non-equi join Catalyst plans as BNL, fine at the contract size.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("skyline needs >= 2 criterion columns")
    dirs = list(directions) if directions is not None else ["min"] * len(cols)
    if len(dirs) != len(cols) or any(d not in ("min", "max") for d in dirs):
        raise ValueError(f"directions must be 'min'/'max' per col: {dirs}")
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    dt = dict(df.dtypes)
    bad = [c for c in cols if not (dt[c] in numeric
                                   or dt[c].startswith("decimal"))]
    if bad:
        raise ValueError(
            f"skyline criteria must be numeric (cast dates to epoch "
            f"days first): {bad}")
    base = df
    for c in cols:
        base = base.filter(F.col(c).isNotNull())

    # phase 1: deterministic sample -> driver-side pareto reduction
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    samp = (
        base.select(*[F.col(c).cast("double").alias(c) for c in cols])
        .orderBy(F.md5(F.concat(key, F.lit(f"#{seed}"))).asc())
        .limit(int(sample_cap))
        .collect()
    )

    def dom(a, b):
        ge = all(
            (a[i] <= b[i]) if d == "min" else (a[i] >= b[i])
            for i, d in enumerate(dirs))
        gt = any(
            (a[i] < b[i]) if d == "min" else (a[i] > b[i])
            for i, d in enumerate(dirs))
        return ge and gt

    pts = [tuple(float(r[c]) for c in cols) for r in samp]
    front = [p for p in pts if not any(dom(q, p) for q in pts if q != p)]
    # dedupe identical points (mutual non-strict dominance keeps both)
    front = sorted(set(front))

    # phase 2: broadcast-prune — drop rows a front point strictly
    # dominates (pure Column logic over a literal struct array)
    survivors = base
    if front:
        arr = F.array(*[
            F.struct(*[F.lit(p[i]).alias(cols[i]) for i in range(len(cols))])
            for p in front
        ])
        def _dom_lambda(s):
            at_least = None
            strictly = None
            for i, (c, d) in enumerate(zip(cols, dirs)):
                r = F.col(c).cast("double")
                sv = s[c]
                ge = sv <= r if d == "min" else sv >= r
                gt = sv < r if d == "min" else sv > r
                at_least = ge if at_least is None else (at_least & ge)
                strictly = gt if strictly is None else (strictly | gt)
            return at_least & strictly

        survivors = base.filter(~F.exists(arr, _dom_lambda))

    n = survivors.count()
    if n > int(max_survivors):
        raise ValueError(
            f"skyline: {n} rows survive the sample-front prune "
            f"(> max_survivors={max_survivors}) — raise sample_cap or "
            "reduce dimensionality; the exact pass is quadratic in "
            "survivors by design")

    # phase 3: exact dominance anti-join over survivors
    s1 = survivors.alias("__r")
    s2 = survivors.select(*cols).alias("__s")
    return s1.join(
        s2, _dominates("__s", "__r", cols, dirs), "left_anti"
    ).select(*df.columns)


def skyline_sql(
    from_sql: str,
    cols: Sequence[str],
    directions: Optional[Sequence[str]] = None,
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`skyline` — the direct NOT EXISTS
    dominance definition (the two-phase pruning is an execution
    strategy, not a semantics change)."""
    cols = list(cols)
    dirs = list(directions) if directions is not None else ["min"] * len(cols)
    if len(dirs) != len(cols) or any(d not in ("min", "max") for d in dirs):
        raise ValueError(f"directions must be 'min'/'max' per col: {dirs}")
    ge = " AND ".join(
        f"s.{c} {'<=' if d == 'min' else '>='} r.{c}"
        for c, d in zip(cols, dirs))
    gt = " OR ".join(
        f"s.{c} {'<' if d == 'min' else '>'} r.{c}"
        for c, d in zip(cols, dirs))
    notnull = " AND ".join(f"r.{c} IS NOT NULL" for c in cols)
    return f"""
SELECT {select} FROM ({from_sql}) r
WHERE {notnull}
  AND NOT EXISTS (
    SELECT 1 FROM ({from_sql}) s
    WHERE {" AND ".join(f"s.{c} IS NOT NULL" for c in cols)}
      AND ({ge}) AND ({gt})
  )
"""
