"""Distribution statistics: fixed-width histograms and heavy hitters.

Both are single-skinny-shuffle programs (the map-side combine absorbs
per-partition mass before anything crosses the wire), deterministic,
and exactly reproducible in SQL — the profiling ops a pipeline runs
over a 100 TB column before deciding how to partition/filter it.

The reference inherits Spark SQL's aggregation layer and adds no
statistics operators (SURVEY.md §2.4); these are north-star additions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram_fixed(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
    group_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Equi-width histogram over [lo, hi): rows below lo clamp into bin
    0, rows at/above hi into bin nbins-1 (so the histogram is total
    over ORDERED values — profiling must not silently drop outliers).
    NULLs, NaNs, and ±Infinity are excluded: a NaN has no position on
    the axis, and the engines' clamp chains diverge on non-finite
    values (Spark's floor→least→greatest lands NaN in bin 0 and clamps
    Inf into an edge bin, DuckDB's CAST(floor(inf) AS BIGINT) raises),
    so excluding them is also what keeps the oracle bit-for-bit.
    Returns (groups…, bin, bin_lo, bin_hi, n).

    One groupBy on (groups, bin): a partition contributes at most
    nbins rows per group downstream regardless of its row count.
    Bin math is plain double arithmetic (floor((x-lo)/width)) —
    identical in any engine, so the oracle matches bit-for-bit.
    """
    assert hi > lo and nbins >= 1
    width = (float(hi) - float(lo)) / int(nbins)
    groups = list(group_by or [])
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width))
    bin_ = F.least(
        F.greatest(raw, F.lit(0)), F.lit(int(nbins) - 1)
    ).cast("long")
    return (
        df.filter(x.isNotNull() & ~F.isnan(x)
                  & (F.abs(x) != F.lit(float("inf"))))
        .select(*groups, bin_.alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *groups,
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias(
                "bin_hi"
            ),
            "n",
        )
    )


def histogram_fixed_sql(
    from_sql: str,
    col_expr: str,
    lo: float,
    hi: float,
    nbins: int = 20,
    group_exprs: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB mirror of :func:`histogram_fixed` (identical bin and
    edge arithmetic; ::DOUBLE literals keep DuckDB off its DECIMAL
    division path)."""
    width = (float(hi) - float(lo)) / int(nbins)
    groups = list(group_exprs or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = ", ".join(groups + ["bin"])
    return f"""
  SELECT {gsel} bin,
         {float(lo)!r}::DOUBLE + bin * {width!r}::DOUBLE AS bin_lo,
         {float(lo)!r}::DOUBLE + (bin + 1) * {width!r}::DOUBLE AS bin_hi,
         count(*) AS n
  FROM (
    SELECT {gsel}
           CAST(least(greatest(
             floor((CAST({col_expr} AS DOUBLE) - {float(lo)!r}::DOUBLE)
                   / {width!r}::DOUBLE), 0), {int(nbins) - 1}) AS BIGINT)
             AS bin
    FROM {from_sql}
    WHERE {col_expr} IS NOT NULL AND NOT isnan(CAST({col_expr} AS DOUBLE))
      AND abs(CAST({col_expr} AS DOUBLE)) != 'infinity'::DOUBLE
  ) GROUP BY {gby}
"""


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.001,
    group_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact frequent items: values of `col` carrying at least
    `min_share` of the (per-group) rows, with count and share, ordered
    facts for the caller to sort. Returns (groups…, value, n, share).

    Two aggregations, both combine-friendly: the per-value groupBy
    shuffles at most (distinct values) skinny rows, the total is a
    per-group scalar joined back (broadcast at any realistic group
    count). Exactness is the point — at a 0.1% support threshold the
    output is ≤ 1000 rows per group, so unlike sketch-based
    Misra–Gries there is no approximation to reason about, and the
    shuffled intermediates are already bounded by the distinct-value
    count, which a skewed hot-key distribution keeps small by
    definition.
    """
    assert 0.0 < min_share <= 1.0
    groups = list(group_by or [])
    counts = (
        df.select(*groups, F.col(col).alias("value"))
        .groupBy(*groups, "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy(*groups).agg(F.sum("n").alias("__tot"))
    joined = (
        counts.join(F.broadcast(totals), on=groups)
        if groups
        else counts.crossJoin(F.broadcast(totals))
    )
    return (
        joined.withColumn(
            "share", F.col("n").cast("double") / F.col("__tot").cast("double")
        )
        .filter(F.col("share") >= F.lit(float(min_share)))
        .drop("__tot")
    )


def profile_columns(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One-scan table profile: per column (column, n_nonnull, n_null,
    n_distinct, min_value, max_value, mean_value) — the
    sanity-check a pipeline runs on a new drop before partitioning
    decisions. min/max/mean are populated for numeric/temporal columns
    (mean numeric-only); strings profile min/max lexicographically.
    Values are emitted as strings so one skinny frame profiles a
    heterogeneous table.

    Plan: a single aggregate pass computes every column's stats
    side-by-side; the exact multi-column COUNT(DISTINCT) uses Spark's
    Expand (one logical scan, rows × #cols intermediate — profile very
    wide tables in batches, or swap in `hll_distinct` per column when
    ±2% distinct counts are enough).
    """
    from pyspark.sql import types as T

    cols = list(cols or df.columns)
    numeric = (T.NumericType,)
    orderable = (T.NumericType, T.StringType, T.TimestampType,
                 T.TimestampNTZType, T.DateType)
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__d_{c}"),
        ]
        if isinstance(dt, orderable):
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"__mi_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__ma_{c}"),
            ]
        else:
            aggs += [
                F.lit(None).cast("string").alias(f"__mi_{c}"),
                F.lit(None).cast("string").alias(f"__ma_{c}"),
            ]
        if isinstance(dt, numeric):
            # round(6): a raw double avg is summation-order dependent
            # (~1e-14 relative run-to-run / engine-to-engine) — the
            # rounding quantum sits far above that noise so the profile
            # is stable across partitionings and engines
            aggs.append(F.round(F.avg(F.col(c)), 6).alias(f"__av_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__av_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").alias("n_nonnull"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__d_{c}").alias("n_distinct"),
            F.col(f"__mi_{c}").alias("min_value"),
            F.col(f"__ma_{c}").alias("max_value"),
            F.col(f"__av_{c}").alias("mean_value"),
        )
        for c in cols
    ])
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    round_dp: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE
    aggregate pass (no joins, no per-pair scans): n(n-1)/2 corr +
    pair-count aggregates computed together, then exploded to tidy
    (col_a, col_b, n_pairs, corr) rows with col_a < col_b. The
    feature-redundancy / leakage screen before training-set assembly.
    Per-pair NULL handling is pairwise deletion (rows where either
    side is NULL are excluded from that pair only), matching SQL
    ``corr``; a pair with < 2 complete rows or zero variance yields
    NULL. Correlations are rounded to ``round_dp`` so the result is
    engine-stable (co-moment accumulation order differs between
    engines at ~1e-15)."""
    cs = list(cols)
    if len(cs) < 2:
        raise ValueError(f"corr_matrix needs >= 2 columns: {cs}")
    pairs = [(a, b) for i, a in enumerate(cs) for b in cs[i + 1:]]
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        aggs.append(F.count(F.when(both, F.lit(1))).alias(f"__n_{a}_{b}"))
        aggs.append(F.round(F.corr(x, y), int(round_dp)).alias(f"__c_{a}_{b}"))
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__n_{a}_{b}").alias("n_pairs"),
            F.col(f"__c_{a}_{b}").alias("corr"),
        )
        for a, b in pairs
    ])
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def corr_matrix_sql(
    from_sql: str,
    cols: Sequence[str],
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`corr_matrix` (same pairs, same
    rounding; one scan via a single aggregate subquery)."""
    cs = list(cols)
    pairs = [(a, b) for i, a in enumerate(cs) for b in cs[i + 1:]]
    aggs = ", ".join(
        f"count(CASE WHEN CAST({a} AS DOUBLE) IS NOT NULL "
        f"AND CAST({b} AS DOUBLE) IS NOT NULL THEN 1 END) AS __n_{a}_{b}, "
        f"round(corr(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), "
        f"{int(round_dp)}) AS __c_{a}_{b}"
        for a, b in pairs)
    sel = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"__n_{a}_{b} AS n_pairs, __c_{a}_{b} AS corr FROM w"
        for a, b in pairs)
    return f"WITH w AS (SELECT {aggs} FROM {from_sql})\n{sel}"


def cov_matrix(
    df: DataFrame,
    cols: Sequence[str],
    round_dp: int = 6,
) -> DataFrame:
    """Sample covariance matrix over numeric columns in ONE aggregate
    pass (diagonal included = variances): tidy (col_a, col_b, n_pairs,
    cov) rows with col_a <= col_b. Pairwise NULL deletion and rounding
    as in :func:`corr_matrix`; the input to feature scaling / PCA."""
    cs = list(cols)
    if not cs:
        raise ValueError("cov_matrix needs >= 1 column")
    pairs = [(a, b) for i, a in enumerate(cs) for b in cs[i:]]
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        aggs.append(F.count(F.when(both, F.lit(1))).alias(f"__n_{a}_{b}"))
        aggs.append(
            F.round(F.covar_samp(x, y), int(round_dp)).alias(f"__v_{a}_{b}"))
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__n_{a}_{b}").alias("n_pairs"),
            F.col(f"__v_{a}_{b}").alias("cov"),
        )
        for a, b in pairs
    ])
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def cov_matrix_sql(
    from_sql: str,
    cols: Sequence[str],
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`cov_matrix`."""
    cs = list(cols)
    pairs = [(a, b) for i, a in enumerate(cs) for b in cs[i:]]
    aggs = ", ".join(
        f"count(CASE WHEN CAST({a} AS DOUBLE) IS NOT NULL "
        f"AND CAST({b} AS DOUBLE) IS NOT NULL THEN 1 END) AS __n_{a}_{b}, "
        f"round(covar_samp(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), "
        f"{int(round_dp)}) AS __v_{a}_{b}"
        for a, b in pairs)
    sel = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"__n_{a}_{b} AS n_pairs, __v_{a}_{b} AS cov FROM w"
        for a, b in pairs)
    return f"WITH w AS (SELECT {aggs} FROM {from_sql})\n{sel}"


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/aggregation-key skew diagnostics: the ``top`` hottest keys
    with their row counts, share of the table, the ratio to a
    PERFECTLY UNIFORM key (count · n_distinct / n_rows — how many
    "fair shares" of the shuffle this key eats), and the salt factor
    (``ceil(count / target_rows_per_task)``) that would cap a salted
    repartition of that key at ``target_rows_per_task`` rows per task.

    Returns (key…, n, share, skew_ratio, suggested_salt) sorted by n
    desc then keys asc — the planning read before picking broadcast /
    salting / AQE skew-join for a 100 TB join (SCALE.md's salting
    entries quote exactly these quantities).

    One skinny groupBy(keys) + a 1-row global aggregate broadcast back;
    the top-k is a TakeOrderedAndProject (≤ ``top`` rows to the
    driver). Floats rounded to 6 so the report is engine-stable.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top < 1 or target_rows_per_task < 1:
        raise ValueError("top and target_rows_per_task must be >= 1")
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).alias("__distinct"),
    )
    return (
        counts.crossJoin(totals)
        .select(
            *key_cols,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            # divide FIRST: n·distinct as int64 overflows at trillions
            # of rows × billions of keys; n/total is double-safe
            F.round(
                F.col("n") / F.col("__total") * F.col("__distinct"), 6
            ).alias("skew_ratio"),
            F.ceil(
                F.col("n") / F.lit(float(target_rows_per_task))
            ).alias("suggested_salt"),
        )
        .orderBy(
            F.col("n").desc(), *[F.col(c).asc() for c in key_cols]
        )
        .limit(int(top))
    )


def skew_report_sql(
    from_sql: str,
    key_cols: Sequence[str],
    top: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> str:
    """DuckDB SQL mirror of :func:`skew_report`."""
    keys = ", ".join(key_cols)
    order_keys = ", ".join(f"{c} ASC" for c in key_cols)
    return f"""
WITH __c AS (
  SELECT {keys}, count(*) AS n FROM {from_sql} GROUP BY {keys}
), __t AS (
  SELECT sum(n) AS total, count(*) AS n_distinct FROM __c
)
SELECT {keys}, n,
       round(n / t.total, 6) AS share,
       round(n / t.total * t.n_distinct, 6) AS skew_ratio,
       CAST(ceil(n / {float(target_rows_per_task)!r}) AS BIGINT)
         AS suggested_salt
FROM __c, __t t
ORDER BY n DESC, {order_keys}
LIMIT {int(top)}
"""


def chisq_independence(
    df: DataFrame, col_a: str, col_b: str, round_to: int = 6
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: one row ``(chi2, dof, n, cramers_v)``. The feature/label
    dependence screen (e.g. is document source independent of language
    bucket) — Cramér's V gives the effect size the raw statistic
    can't (chi2 grows with n even for trivial dependence). Rows with a
    NULL on either side are excluded, as in every standard
    contingency-table treatment. The p-value is deliberately omitted:
    neither engine ships a chi-square CDF, and the statistic + dof
    feed any external table.

    Scale: one skinny groupBy(a, b) over the data (combine-friendly);
    expected counts come from the ROW-TOTAL × COL-TOTAL cross join —
    r×c skinny rows, never the data again — left-joined to observed so
    zero-observed cells still contribute their expectation. Everything
    after the first groupBy is sized by the category cardinalities.
    """
    a, b = F.col(col_a), F.col(col_b)
    obs = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    rows = obs.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cols = obs.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    tot = obs.agg(F.sum("__o").alias("__n"))
    cells = (
        rows.crossJoin(cols)
        .join(obs, ["__a", "__b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.pow(
                    F.coalesce(F.col("__o"), F.lit(0))
                    - F.col("__ra") * F.col("__cb") / F.col("__n"),
                    F.lit(2.0),
                )
                / (F.col("__ra") * F.col("__cb") / F.col("__n"))
            ).alias("__term")
        )
    )
    stats = cells.agg(F.sum("__term").alias("__chi2")).crossJoin(
        F.broadcast(
            rows.agg(F.count(F.lit(1)).alias("__r")).crossJoin(
                cols.agg(F.count(F.lit(1)).alias("__c"))
            ).crossJoin(tot)
        )
    )
    return stats.select(
        F.round("__chi2", round_to).alias("chi2"),
        ((F.col("__r") - 1) * (F.col("__c") - 1)).alias("dof"),
        F.col("__n").alias("n"),
        F.round(
            F.when(
                (F.least("__r", "__c") > 1) & (F.col("__chi2") > 0),
                F.sqrt(
                    F.col("__chi2")
                    / (F.col("__n") * (F.least("__r", "__c") - 1))
                ),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("cramers_v"),
    )


def chisq_independence_sql(
    from_sql: str, col_a: str, col_b: str, round_to: int = 6
) -> str:
    """DuckDB SQL mirror of :func:`chisq_independence`."""
    return f"""
WITH __obs AS (
  SELECT {col_a} AS a, {col_b} AS b, count(*) AS o
  FROM {from_sql}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
  GROUP BY 1, 2
), __r AS (SELECT a, sum(o)::BIGINT AS ra FROM __obs GROUP BY 1),
__c AS (SELECT b, sum(o)::BIGINT AS cb FROM __obs GROUP BY 1),
__t AS (SELECT sum(o)::BIGINT AS n FROM __obs),
__cells AS (
  SELECT pow(COALESCE(o.o, 0) - r.ra * c.cb / t.n, 2.0)
         / (r.ra * c.cb / t.n) AS term
  FROM __r r CROSS JOIN __c c
  LEFT JOIN __obs o ON o.a = r.a AND o.b = c.b
  CROSS JOIN __t t
), __s AS (
  SELECT sum(term) AS chi2,
         (SELECT count(*) FROM __r) AS r,
         (SELECT count(*) FROM __c) AS c,
         (SELECT n FROM __t) AS n
  FROM __cells
)
SELECT round(chi2, {int(round_to)}) AS chi2,
       (r - 1) * (c - 1) AS dof, n,
       round(CASE WHEN least(r, c) > 1 AND chi2 > 0
                  THEN sqrt(chi2 / (n * (least(r, c) - 1)))
                  ELSE 0.0::DOUBLE END, {int(round_to)}) AS cramers_v
FROM __s
"""


# ---------------------------------------------------------------------------
# Robust (median/MAD) outlier scoring


def robust_zscore(
    df: DataFrame,
    col: str,
    id_col: str,
    group_by: Optional[Sequence[str]] = None,
    threshold: float = 3.5,
    k: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Modified z-score outlier scoring (Iglewicz–Hoaglin): per group,
    ``robust_z = 0.6745 · (x − median) / MAD`` with MAD = median of
    |x − median|, plus ``is_outlier = |robust_z| > threshold`` (3.5 is
    the published default). Mean/std anomaly scoring (cf.
    ``analytics.volume_anomaly``) lets a single extreme value inflate
    σ and mask itself; median/MAD has a 50% breakdown point — the
    right screen for corpus quality metrics with heavy tails.

    Both the median and the MAD come from the mergeable bottom-k
    quantile sketch (≤ k rows per group cross the wire, two sketch
    passes) and join back as skinny frames — ONE lazy plan, no driver
    collect, bit-reproducible by :func:`robust_zscore_sql`. A
    zero-MAD group (over half the values identical) yields NULL
    scores and ``is_outlier=false`` for its rows — σ-scaling is
    undefined there, and flagging everything would be worse than
    flagging nothing. NULL/NaN values keep their rows with NULL score.

    Output: the input columns plus ``robust_z`` and ``is_outlier``.
    """
    from .sketches import quantile_digest

    groups = list(group_by or [])
    x = F.col(col).cast("double")
    med = quantile_digest(
        df, col, id_col, qs=(0.5,), group_by=groups, k=k, seed=seed
    ).withColumnRenamed("q500", "__med")
    j1 = (
        df.join(med, groups) if groups
        else df.crossJoin(F.broadcast(med))
    )
    dev = j1.withColumn("__dev", F.abs(x - F.col("__med")))
    mad = quantile_digest(
        dev, "__dev", id_col, qs=(0.5,), group_by=groups, k=k, seed=seed
    ).withColumnRenamed("q500", "__mad")
    j2 = (
        dev.join(mad, groups) if groups
        else dev.crossJoin(F.broadcast(mad))
    )
    z = F.when(
        x.isNotNull() & ~F.isnan(x) & (F.col("__mad") > 0),
        F.lit(0.6745) * (x - F.col("__med")) / F.col("__mad"),
    )
    return (
        j2.withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(
                F.abs(F.col("robust_z")) > F.lit(float(threshold)),
                F.lit(False),
            ),
        )
        .drop("__med", "__dev", "__mad")
    )


def robust_zscore_sql(
    from_sql: str,
    col_expr: str,
    id_expr: str,
    select_cols: Sequence[str],
    group_exprs: Optional[Sequence[str]] = None,
    threshold: float = 3.5,
    k: int = 2048,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`robust_zscore` — identical sketch rows,
    interpolation, and scoring arithmetic. ``select_cols`` lists the
    passthrough output columns (SQL has no ``df.*`` that dodges the
    internal names)."""
    from .sketches import quantile_estimate_sql, quantile_sketch_sql

    groups = list(group_exprs or [])
    gsel = "".join(f"{g}, " for g in groups)
    med_est = quantile_estimate_sql(
        quantile_sketch_sql(f"({from_sql})", col_expr, id_expr,
                            group_exprs=groups, k=k, seed=seed),
        qs=(0.5,), group_exprs=groups,
    )
    # plain equality matches Spark's name-based join (null group keys
    # drop in both engines)
    med_on = (
        " AND ".join(f"s.{g} = m.{g}" for g in groups)
        if groups else "1 = 1"
    )
    dev_src = f"""
  SELECT s.*, m.q500 AS __med,
         abs(CAST({col_expr} AS DOUBLE) - m.q500) AS __dev
  FROM ({from_sql}) s JOIN ({med_est}) m ON {med_on}
"""
    mad_est = quantile_estimate_sql(
        quantile_sketch_sql(f"({dev_src})", "__dev", id_expr,
                            group_exprs=groups, k=k, seed=seed),
        qs=(0.5,), group_exprs=groups,
    )
    mad_on = (
        " AND ".join(f"d.{g} = md.{g}" for g in groups)
        if groups else "1 = 1"
    )
    outs = ", ".join(f"d.{c}" for c in select_cols)
    z = (f"CASE WHEN md.q500 > 0 AND ({col_expr}) IS NOT NULL "
         f"AND NOT isnan(CAST({col_expr} AS DOUBLE)) THEN 0.6745::DOUBLE * "
         f"(CAST({col_expr} AS DOUBLE) - d.__med) / md.q500 END")
    return f"""
SELECT {outs}, robust_z,
       coalesce(abs(robust_z) > {float(threshold)!r}::DOUBLE, false)
         AS is_outlier
FROM (
  SELECT d.*, {z} AS robust_z
  FROM ({dev_src}) d JOIN ({mad_est}) md ON {mad_on}
) d
"""


# ---------------------------------------------------------------------------
# Population Stability Index (feature drift between two snapshots)


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    id_col: str,
    nbins: int = 10,
    k: int = 2048,
    seed: int = 42,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    current one — the standard train-vs-serve / week-over-week feature
    drift monitor (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 action).

    Bin edges are the REFERENCE's equal-frequency quantiles (from the
    mergeable bottom-k sketch, ≤ k rows over the wire), applied
    identically to both sides, so p_ref ≈ 1/nbins by construction and
    drift shows up purely as current-side mass movement. Returns one
    row per bin: ``(bin, n_ref, n_cur, p_ref, p_cur, psi_term)`` with
    ``psi_term = (p_cur' − p_ref')·ln(p_cur'/p_ref')`` where p' is the
    eps-clamped share (the standard guard — an empty bin would make
    ln() blow up); total PSI is ``sum(psi_term)``. psi_term rounds to
    ``round_to`` (ln() is a libm call — the engine's float-sum hash
    convention). NULL/NaN values carry no bin on either side.

    Scale shape: one sketch pass over ref, one zero-shuffle bin
    assignment per side (codegen comparison sum against the broadcast
    cut row), two skinny ≤ nbins-row aggregates, totals as 1-row
    broadcasts. Nothing data-sized is collected.
    """
    from .sketches import quantile_digest

    nbins = int(nbins)
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2: {nbins}")
    if not (0.0 < float(eps) < 1.0):
        raise ValueError(f"eps must be in (0, 1): {eps}")
    qs = tuple(i / nbins for i in range(1, nbins))
    cuts = [f"__pc{i}" for i in range(1, nbins)]
    # the 1-row cut frame feeds three plan branches (both bin
    # assignments and the bins spine) — EAGER checkpoint (r12): the
    # branches materialize concurrently, and a lazy checkpoint would
    # recompute the reference sketch once per concurrent branch
    qrow = quantile_digest(
        ref, col, id_col, qs=qs, k=k, seed=seed
    ).toDF(*cuts).localCheckpoint(eager=True)

    def _binned(df: DataFrame) -> DataFrame:
        x = F.col(col).cast("double")
        bin_expr = None
        for c in cuts:
            t = (x >= F.col(c)).cast("int")
            bin_expr = t if bin_expr is None else bin_expr + t
        return (
            df.crossJoin(F.broadcast(qrow))
            .filter(x.isNotNull() & ~F.isnan(x))
            .select(bin_expr.alias("__bin"))
        )

    rc = _binned(ref).groupBy("__bin").agg(F.count(F.lit(1)).alias("n_ref"))
    cc = _binned(cur).groupBy("__bin").agg(F.count(F.lit(1)).alias("n_cur"))
    bins = qrow.select(
        F.explode(F.expr(f"sequence(0, {nbins - 1})")).alias("__bin")
    )
    tot_r = rc.agg(F.sum("n_ref").alias("__tr"))
    tot_c = cc.agg(F.sum("n_cur").alias("__tc"))
    out = (
        bins.join(rc, "__bin", "left")
        .join(cc, "__bin", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_c))
        .select(
            F.col("__bin").alias("bin"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.col("__tr"), F.col("__tc"),
        )
    )
    e = F.lit(float(eps))
    p_ref = F.greatest(F.col("n_ref").cast("double") / F.col("__tr").cast("double"), e)
    p_cur = F.greatest(F.col("n_cur").cast("double") / F.col("__tc").cast("double"), e)
    return out.select(
        "bin", "n_ref", "n_cur",
        (F.col("n_ref").cast("double") / F.col("__tr").cast("double")).alias("p_ref"),
        (F.col("n_cur").cast("double") / F.col("__tc").cast("double")).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref),
                int(round_to)).alias("psi_term"),
    )


def psi_drift_sql(
    ref_sql: str,
    cur_sql: str,
    col_expr: str,
    id_expr: str,
    nbins: int = 10,
    k: int = 2048,
    seed: int = 42,
    eps: float = 1e-6,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`psi_drift` (same reference-side sketch
    cuts, comparison-sum binning, eps clamp and ln arithmetic)."""
    from .sketches import _q_name, quantile_estimate_sql, quantile_sketch_sql

    nbins = int(nbins)
    qs = tuple(i / nbins for i in range(1, nbins))
    qsql = quantile_estimate_sql(
        quantile_sketch_sql(f"({ref_sql})", col_expr, id_expr, k=k, seed=seed),
        qs=qs,
    )
    names = [_q_name(q) for q in qs]
    binsum = " + ".join(
        f"(CASE WHEN CAST({col_expr} AS DOUBLE) >= q.{n} THEN 1 ELSE 0 END)"
        for n in names
    )

    def _cnt(side_sql: str, out: str) -> str:
        return f"""
  SELECT __bin, count(*) AS {out} FROM (
    SELECT ({binsum}) AS __bin
    FROM ({side_sql}) s, __q q
    WHERE ({col_expr}) IS NOT NULL
      AND NOT isnan(CAST({col_expr} AS DOUBLE))
  ) GROUP BY 1
"""

    e = f"{float(eps)!r}::DOUBLE"
    return f"""
WITH __q AS ({qsql}),
__rc AS ({_cnt(ref_sql, "n_ref")}),
__cc AS ({_cnt(cur_sql, "n_cur")}),
__bins AS (SELECT unnest(range(0, {nbins})) AS __bin),
__tr AS (SELECT sum(n_ref) AS __tr FROM __rc),
__tc AS (SELECT sum(n_cur) AS __tc FROM __cc),
__j AS (
  SELECT b.__bin AS bin,
         coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur,
         __tr, __tc
  FROM __bins b
  LEFT JOIN __rc r ON b.__bin = r.__bin
  LEFT JOIN __cc c ON b.__bin = c.__bin
  CROSS JOIN __tr CROSS JOIN __tc
)
SELECT bin, n_ref::BIGINT AS n_ref, n_cur::BIGINT AS n_cur,
       CAST(n_ref AS DOUBLE) / CAST(__tr AS DOUBLE) AS p_ref,
       CAST(n_cur AS DOUBLE) / CAST(__tc AS DOUBLE) AS p_cur,
       round((greatest(CAST(n_cur AS DOUBLE) / CAST(__tc AS DOUBLE), {e})
              - greatest(CAST(n_ref AS DOUBLE) / CAST(__tr AS DOUBLE), {e}))
             * ln(greatest(CAST(n_cur AS DOUBLE) / CAST(__tc AS DOUBLE), {e})
                  / greatest(CAST(n_ref AS DOUBLE) / CAST(__tr AS DOUBLE), {e})),
             {int(round_to)}) AS psi_term
FROM __j
"""


# ---------------------------------------------------------------------------
# Two-sample tests (KS, Welch t) and categorical mutual information


def ks_test(
    df: DataFrame,
    val_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between the ``group_a`` and
    ``group_b`` slices of ``val_col``: D = max |F_a(v) - F_b(v)| over
    the pooled distinct values, plus the asymptotic one-term p-value
    ``p = min(1, 2 exp(-2 D^2 n_a n_b / (n_a + n_b)))``. The
    distribution-shift gate (A/B splits, snapshot drift) when
    :func:`psi_drift`'s fixed binning is too coarse.

    Returns one row ``(d_stat, p_value, n_a, n_b)``; D is NULL when
    either group is empty.

    Determinism: both CDFs are exact integer cumulative counts over
    the distinct-value order, so D is a max over exact-operand
    divisions — bit-identical in any engine.

    Scale: NaN/NULLs drop, one combine-friendly groupBy(value) with
    per-group counts (rows = distinct metric values, not input rows),
    then TWO two-phase cumulative sums via
    :func:`.pipeline.running_total` — range repartition +
    per-partition sums + broadcast offsets, never a single-partition
    window — a 1-row broadcast of the totals, and a 1-row final
    aggregate. For a continuous metric with ~row-cardinality distinct
    values, quantize first (e.g. ``F.round(x, 3)``) to bound the
    distinct frame.
    """
    return ks_test_battery(
        df, val_col, group_col, [(group_a, group_b)], round_to=round_to
    ).drop("test_id")


def ks_test_battery(
    df: DataFrame,
    val_col: str,
    group_col: str,
    pairs,
    round_to: int = 6,
) -> DataFrame:
    """Battery of two-sample KS tests sharing ONE pass over the data:
    the same statistic as :func:`ks_test` per ``(group_a, group_b)``
    pair, but every distinct group's CDF is computed from a single
    groupBy(value) + a single two-phase cumulative-sum program
    (:func:`.pipeline.running_totals`), and all the D maxima + group
    totals come out of ONE aggregate over the shared cumulative frame.
    A k-pair battery over g distinct groups costs one scan of the
    input instead of k scans + 2k cumulative programs.

    Returns one row per pair: ``(test_id, d_stat, p_value, n_a, n_b)``
    with ``test_id = '<a>_vs_<b>'``.

    Equivalence with per-pair :func:`ks_test`: the shared distinct-
    value frame may hold values belonging only to OTHER groups; at such
    a value both cumulative counts of a pair are unchanged from the
    previous value, so the pair's gap there duplicates an existing gap
    and the max is untouched. Totals are the final cumulative counts
    (exact integers). D and p stay bit-identical.
    """
    from .pipeline import running_totals

    pairs = [(a, b) for a, b in pairs]
    if not pairs:
        raise ValueError("pairs must be non-empty")
    groups: list = []
    for a, b in pairs:
        for g in (a, b):
            if g not in groups:
                groups.append(g)
    gi = {g: i for i, g in enumerate(groups)}
    x = F.col(val_col).cast("double")
    filt = df.filter(
        F.col(group_col).isin(groups) & x.isNotNull() & ~F.isnan(x)
    )
    vals = filt.groupBy(x.alias("__v")).agg(
        *[
            F.sum(F.when(F.col(group_col) == g, 1).otherwise(0))
            .alias(f"__c{i}")
            for i, g in enumerate(groups)
        ]
    )
    c = running_totals(
        vals,
        "__v",
        [f"__c{i}" for i in range(len(groups))],
        [f"__cu{i}" for i in range(len(groups))],
    )
    # group totals = the max (= last) cumulative count: saves the
    # separate re-scan of `vals` the chained formulation paid
    tot = c.agg(
        *[
            F.coalesce(F.max(f"__cu{i}"), F.lit(0).cast("long"))
            .alias(f"__n{i}")
            for i in range(len(groups))
        ]
    )
    aggs = []
    for k, (a, b) in enumerate(pairs):
        i, j = gi[a], gi[b]
        gap = F.abs(
            F.col(f"__cu{i}") / F.col(f"__n{i}")
            - F.col(f"__cu{j}") / F.col(f"__n{j}")
        )
        aggs.append(
            F.max(
                F.when(
                    (F.col(f"__n{i}") > 0) & (F.col(f"__n{j}") > 0), gap
                )
            ).alias(f"__d{k}")
        )
        aggs.append(F.max(f"__n{i}").alias(f"__na{k}"))
        aggs.append(F.max(f"__n{j}").alias(f"__nb{k}"))
    res = c.crossJoin(F.broadcast(tot)).agg(*aggs)
    rows = []
    for k, (a, b) in enumerate(pairs):
        d = F.col(f"__d{k}")
        ne = (
            F.col(f"__na{k}").cast("double") * F.col(f"__nb{k}")
            / (F.col(f"__na{k}") + F.col(f"__nb{k}"))
        )
        p = F.least(
            F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * d * d * ne)
        )
        rows.append(
            F.struct(
                F.lit(f"{a}_vs_{b}").alias("test_id"),
                F.round(d, int(round_to)).alias("d_stat"),
                F.round(p, int(round_to)).alias("p_value"),
                F.col(f"__na{k}").alias("n_a"),
                F.col(f"__nb{k}").alias("n_b"),
            )
        )
    return res.select(
        F.explode(F.array(*rows)).alias("__t")
    ).select("__t.test_id", "__t.d_stat", "__t.p_value", "__t.n_a",
             "__t.n_b")


def ks_test_sql(
    from_sql: str,
    val_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`ks_test` (string-typed groups; quote
    group literals accordingly)."""
    r = int(round_to)
    return f"""
WITH __f AS (
  SELECT CAST({val_col} AS DOUBLE) AS v, {group_col} AS g
  FROM {from_sql}
  WHERE {group_col} IN ({group_a!r}, {group_b!r})
    AND {val_col} IS NOT NULL
    AND NOT isnan(CAST({val_col} AS DOUBLE))
), __v AS (
  SELECT v,
         count(*) FILTER (WHERE g = {group_a!r})::BIGINT AS ca,
         count(*) FILTER (WHERE g = {group_b!r})::BIGINT AS cb
  FROM __f GROUP BY v
), __c AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cua,
         sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cub
  FROM __v
), __t AS (
  SELECT coalesce(sum(ca), 0)::BIGINT AS na,
         coalesce(sum(cb), 0)::BIGINT AS nb FROM __v
), __d AS (
  SELECT max(CASE WHEN t.na > 0 AND t.nb > 0
                  THEN abs(c.cua / t.na - c.cub / t.nb) END) AS d,
         max(t.na) AS n_a, max(t.nb) AS n_b
  FROM __c c CROSS JOIN __t t
)
SELECT round(d, {r}) AS d_stat,
       round(least(1.0::DOUBLE,
                   2.0::DOUBLE * exp(-2.0::DOUBLE * d * d *
                     (CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))), {r})
         AS p_value,
       n_a, n_b
FROM __d
"""


def welch_ttest(
    df: DataFrame,
    val_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic between the
    ``group_a`` and ``group_b`` slices of ``val_col``, with the
    Welch–Satterthwaite degrees of freedom. The mean-shift companion
    to :func:`ks_test`'s shape test (no p-value — the t CDF needs
    special functions; compare |t| against the caller's critical
    value).

    Returns one row
    ``(mean_a, mean_b, t_stat, df_welch, n_a, n_b)``; t/df are NULL
    when either group has < 2 rows or both variances are 0.

    Scale: ONE combine-friendly aggregate pass (six conditional
    moment sums), 1 row to the driver side. Identical moment-formula
    folds on both engines; the final arithmetic rounds to
    ``round_to``.
    """
    x = F.col(val_col).cast("double")
    ia = F.when(F.col(group_col) == group_a, x)
    ib = F.when(F.col(group_col) == group_b, x)
    m = df.filter(x.isNotNull() & ~F.isnan(x)).agg(
        F.count(ia).alias("n_a"),
        F.coalesce(F.sum(ia), F.lit(0.0)).alias("__sa"),
        F.coalesce(F.sum(ia * ia), F.lit(0.0)).alias("__saa"),
        F.count(ib).alias("n_b"),
        F.coalesce(F.sum(ib), F.lit(0.0)).alias("__sb"),
        F.coalesce(F.sum(ib * ib), F.lit(0.0)).alias("__sbb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("__sa") / na
    mb = F.col("__sb") / nb
    va = (F.col("__saa") - F.col("__sa") * F.col("__sa") / na) / (na - 1)
    vb = (F.col("__sbb") - F.col("__sb") * F.col("__sb") / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (va / na) * (va / na) / (na - 1)
        + (vb / nb) * (vb / nb) / (nb - 1)
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    return m.select(
        F.round(F.when(F.col("n_a") > 0, ma), int(round_to))
        .alias("mean_a"),
        F.round(F.when(F.col("n_b") > 0, mb), int(round_to))
        .alias("mean_b"),
        F.round(F.when(ok & (se2 > 0), t), int(round_to))
        .alias("t_stat"),
        F.round(F.when(ok & (se2 > 0), dfw), int(round_to))
        .alias("df_welch"),
        "n_a",
        "n_b",
    )


def welch_ttest_sql(
    from_sql: str,
    val_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`welch_ttest` (same moment folds)."""
    r = int(round_to)
    xa = f"CASE WHEN {group_col} = {group_a!r} THEN CAST({val_col} AS DOUBLE) END"
    xb = f"CASE WHEN {group_col} = {group_b!r} THEN CAST({val_col} AS DOUBLE) END"
    return f"""
WITH __m AS (
  SELECT count({xa})::BIGINT AS n_a,
         coalesce(sum({xa}), 0.0) AS sa,
         coalesce(sum(({xa}) * ({xa})), 0.0) AS saa,
         count({xb})::BIGINT AS n_b,
         coalesce(sum({xb}), 0.0) AS sb,
         coalesce(sum(({xb}) * ({xb})), 0.0) AS sbb
  FROM {from_sql}
  WHERE {val_col} IS NOT NULL AND NOT isnan(CAST({val_col} AS DOUBLE))
), __d AS (
  SELECT n_a, n_b,
         sa / n_a AS ma, sb / n_b AS mb,
         (saa - sa * sa / n_a) / (n_a - 1) AS va,
         (sbb - sb * sb / n_b) / (n_b - 1) AS vb
  FROM __m
), __e AS (
  SELECT n_a, n_b, ma, mb, va, vb, va / n_a + vb / n_b AS se2
  FROM __d
)
SELECT round(CASE WHEN n_a > 0 THEN ma END, {r}) AS mean_a,
       round(CASE WHEN n_b > 0 THEN mb END, {r}) AS mean_b,
       round(CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
                  THEN (ma - mb) / sqrt(se2) END, {r}) AS t_stat,
       round(CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
                  THEN se2 * se2 /
                       ((va / n_a) * (va / n_a) / (n_a - 1)
                        + (vb / n_b) * (vb / n_b) / (n_b - 1)) END, {r})
         AS df_welch,
       n_a, n_b
FROM __e
"""


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns,
    with both marginal entropies and the normalized
    ``nmi = MI / sqrt(H_a * H_b)``. The feature-redundancy /
    leakage-screening companion to :func:`chisq_independence`
    (chi-square tests independence; MI quantifies how MUCH the
    columns share).

    Returns one row ``(mi, h_a, h_b, nmi, n)``; nmi is NULL when
    either entropy is 0 (a constant column).

    Rows where either column is NULL are dropped (MI is defined over
    the joint distribution of observed pairs).

    Scale: one joint groupBy(a, b) count (combine-friendly; output
    rows = |A|x|B| category pairs, not input rows), two marginal
    re-aggregations OF THE JOINT FRAME (no second pass over the
    data), one broadcast-joined total. Term sums reassociate across
    partitions, hence the ``round_to`` contract (counts are exact;
    only the final ln-term additions are order-sensitive, ~1e-15
    relative).
    """
    filt = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    joint = filt.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__nab"))
    ma = joint.groupBy("__a").agg(F.sum("__nab").alias("__na"))
    mb = joint.groupBy("__b").agg(F.sum("__nab").alias("__nb"))
    tot = joint.agg(F.sum("__nab").alias("__n"))
    j = (
        joint.join(ma, "__a")
        .join(mb, "__b")
        .crossJoin(F.broadcast(tot))
    )
    nn = F.col("__n").cast("double")
    pab = F.col("__nab") / nn
    mi_term = pab * F.log(
        nn * F.col("__nab") / (F.col("__na") * F.col("__nb").cast("double"))
    )
    agg = j.agg(
        F.sum(mi_term).alias("__mi"),
        F.max("__n").alias("n"),
    )
    ha_df = ma.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            -(F.col("__na") / F.col("__n").cast("double"))
            * F.log(F.col("__na") / F.col("__n").cast("double"))
        ).alias("__ha")
    )
    hb_df = mb.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            -(F.col("__nb") / F.col("__n").cast("double"))
            * F.log(F.col("__nb") / F.col("__n").cast("double"))
        ).alias("__hb")
    )
    out = agg.crossJoin(F.broadcast(ha_df)).crossJoin(F.broadcast(hb_df))
    nmi = F.when(
        (F.col("__ha") > 0) & (F.col("__hb") > 0),
        F.col("__mi") / F.sqrt(F.col("__ha") * F.col("__hb")),
    )
    return out.select(
        F.round("__mi", int(round_to)).alias("mi"),
        F.round("__ha", int(round_to)).alias("h_a"),
        F.round("__hb", int(round_to)).alias("h_b"),
        F.round(nmi, int(round_to)).alias("nmi"),
        "n",
    )


def mutual_information_sql(
    from_sql: str,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`mutual_information` (same joint/
    marginal/total construction; ln-term sums round to
    ``round_to``)."""
    r = int(round_to)
    return f"""
WITH __f AS (
  SELECT {col_a} AS a, {col_b} AS b FROM {from_sql}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
), __j AS (
  SELECT a, b, count(*)::BIGINT AS nab FROM __f GROUP BY a, b
), __ma AS (
  SELECT a, sum(nab)::BIGINT AS na FROM __j GROUP BY a
), __mb AS (
  SELECT b, sum(nab)::BIGINT AS nb FROM __j GROUP BY b
), __t AS (
  SELECT sum(nab)::BIGINT AS n FROM __j
), __mi AS (
  SELECT sum((j.nab / CAST(t.n AS DOUBLE)) *
             ln(CAST(t.n AS DOUBLE) * j.nab /
                (ma.na * CAST(mb.nb AS DOUBLE)))) AS mi,
         max(t.n) AS n
  FROM __j j JOIN __ma ma USING (a) JOIN __mb mb USING (b)
  CROSS JOIN __t t
), __ha AS (
  SELECT sum(-(ma.na / CAST(t.n AS DOUBLE)) *
             ln(ma.na / CAST(t.n AS DOUBLE))) AS ha
  FROM __ma ma CROSS JOIN __t t
), __hb AS (
  SELECT sum(-(mb.nb / CAST(t.n AS DOUBLE)) *
             ln(mb.nb / CAST(t.n AS DOUBLE))) AS hb
  FROM __mb mb CROSS JOIN __t t
)
SELECT round(mi, {r}) AS mi,
       round(ha, {r}) AS h_a,
       round(hb, {r}) AS h_b,
       round(CASE WHEN ha > 0 AND hb > 0
                  THEN mi / sqrt(ha * hb) END, {r}) AS nmi,
       n
FROM __mi CROSS JOIN __ha CROSS JOIN __hb
"""


def gini(
    df: DataFrame,
    val_col: str,
    group_col: Optional[str] = None,
    round_to: int = 6,
) -> DataFrame:
    """Gini concentration coefficient of a non-negative measure —
    how unequally mass (tokens per document, spend per customer,
    requests per key) is distributed. 0 = uniform, →1 = one row holds
    everything. The one-number skew summary behind sampling-design
    and hot-key decisions; :func:`skew_report` names offenders, this
    scores the whole distribution.

    Computed by the sorted-rank identity
    ``G = 2 Σ_i i·x_(i) / (n Σ x) − (n+1)/n`` with ties broken by the
    sorted value (any tie order yields the same G — equal values
    commute in the weighted sum: swapping two equal x contributes the
    same Σ i·x). NULL/NaN/negative rows are dropped (Gini is defined
    for non-negative measures).

    Returns one row per group: ``(group?, n, total, gini)``; gini
    NULL for an empty group / zero total.

    Scale: with ``group_col`` the rank is an ordinary per-group
    window (each group sorts within its partition). Ungrouped, the
    global rank runs two-phase via :func:`.pipeline.running_total` —
    never a single-partition window.

    Exactness: both Σx and Σi·x aggregate as DECIMAL(38,6) — the
    measure is snapped to 6 decimal places ONCE (a deterministic,
    engine-identical rounding: a binary double can never sit exactly
    on a decimal half-tie at the 6th place) and every subsequent sum
    is exact integer arithmetic, so the result is independent of
    partition/summation order. A plain double sum over thousands of
    ~1e8-magnitude rows carries ~1e-5 order-dependent error — past
    the 1e-6 output rounding grid (the round-7 `gini_prices` driver
    red). Doubles re-enter only for the final ratio, where relative
    error ~1e-15 is harmless.
    """
    from pyspark.sql import Window

    x = F.col(val_col).cast("double")
    base = df.filter(x.isNotNull() & ~F.isnan(x) & (x >= 0)) \
             .select(*( [F.col(group_col)] if group_col else [] ),
                     x.alias("__x"))
    if group_col:
        w = Window.partitionBy(group_col).orderBy(F.col("__x").asc())
        ranked = base.withColumn("__i", F.row_number().over(w))
        grp = [group_col]
    else:
        from .pipeline import running_total

        withone = base.withColumn("__one", F.lit(1)).withColumn(
            "__ord", F.struct(F.col("__x"),
                              F.monotonically_increasing_id()))
        ranked = running_total(withone, "__ord", "__one", "__i") \
            .drop("__one", "__ord")
        grp = []
    xd = F.col("__x").cast("decimal(38,6)")
    agg = ranked.groupBy(*grp).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("__tot_dec"),
        F.sum(F.col("__i").cast("decimal(18,0)") * xd).alias("__ix_dec"),
    )
    total = F.col("__tot_dec").cast("double")
    ix = F.col("__ix_dec").cast("double")
    nn = F.col("n").cast("double")
    g = (F.lit(2.0) * ix) / (nn * total) - (nn + F.lit(1.0)) / nn
    return agg.select(
        *grp,
        "n",
        F.round(total, int(round_to)).alias("total"),
        F.round(F.when(total > 0, g), int(round_to)).alias("gini"),
    )


def gini_sql(
    from_sql: str,
    val_col: str,
    group_col: Optional[str] = None,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`gini` (same sorted-rank identity; tie
    order is irrelevant to the sum, so row_number suffices; the same
    DECIMAL(38,6) aggregation makes both sums summation-order-exact,
    so the hash cannot depend on partition order)."""
    r = int(round_to)
    gsel = f"{group_col}, " if group_col else ""
    part = f"PARTITION BY {group_col} " if group_col else ""
    gby = f"GROUP BY {group_col}" if group_col else ""
    return f"""
WITH __f AS (
  SELECT {gsel}CAST({val_col} AS DOUBLE) AS x
  FROM {from_sql}
  WHERE {val_col} IS NOT NULL
    AND NOT isnan(CAST({val_col} AS DOUBLE))
    AND CAST({val_col} AS DOUBLE) >= 0
), __r AS (
  SELECT {gsel}CAST(x AS DECIMAL(38,6)) AS xd,
         row_number() OVER ({part}ORDER BY x ASC) AS i
  FROM __f
), __a AS (
  SELECT {gsel}count(*)::BIGINT AS n,
         CAST(sum(xd) AS DOUBLE) AS total,
         CAST(sum(i * xd) AS DOUBLE) AS ix
  FROM __r {gby}
)
SELECT {gsel}n, round(total, {r}) AS total,
       round(CASE WHEN total > 0
                  THEN (2.0 * ix) / (n * total) - (n + 1.0) / n
             END, {r}) AS gini
FROM __a
"""


def benford(
    df: DataFrame,
    val_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/synthetic-data screen for naturally
    scale-spanning measures (amounts, populations, file sizes).

    Emits one row per digit 1-9: ``(digit, n, p_obs, p_benford,
    chisq_term)``; Σ chisq_term is the Pearson χ² statistic against
    the Benford expectation (compare to the caller's critical value
    at 8 df). Zero/NULL/NaN values are dropped (no first significant
    digit); negatives use their magnitude.

    The first significant digit is extracted arithmetically —
    ``floor(|x| / 10^floor(log10(|x|)))`` — identical in both
    engines, no string formatting involved.

    Scale: one filter-project + one 9-row groupBy — combine-friendly,
    nothing but 9 rows past the map side.
    """
    import math as _m

    x = F.abs(F.col(val_col).cast("double"))
    ok = F.col(val_col).isNotNull() & ~F.isnan(
        F.col(val_col).cast("double")) & (x > 0)
    # floor(log10(x)) can drift one off at power-of-ten boundaries in
    # IEEE doubles (log10(1e23) = 22.999999999999996 → raw digit 10;
    # a just-below-power value whose log10 rounds UP → raw digit 0).
    # Drift down only happens when the true leading digit is 1, drift
    # up only when it is 9 — so mapping 10→1 and 0→9 recovers the TRUE
    # digit regardless of which way (or whether) either engine's libm
    # drifts: the mapping is drift-free cross-engine.
    raw = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))) \
        .cast("int")
    digit = (
        F.when(raw <= 0, F.lit(9))
        .when(raw >= 10, F.lit(1))
        .otherwise(raw))
    counts = (
        df.filter(ok)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("__N"))
    pb = {d: _m.log10(1 + 1.0 / d) for d in range(1, 10)}
    pb_col = F.element_at(
        F.array(*[F.lit(pb[d]) for d in range(1, 10)]), F.col("digit"))
    j = counts.crossJoin(F.broadcast(tot))
    p_obs = F.col("n") / F.col("__N").cast("double")
    expect = F.col("__N") * pb_col
    chisq = (F.col("n") - expect) * (F.col("n") - expect) / expect
    return j.select(
        "digit",
        "n",
        F.round(p_obs, int(round_to)).alias("p_obs"),
        F.round(pb_col, int(round_to)).alias("p_benford"),
        F.round(chisq, int(round_to)).alias("chisq_term"),
    )


def benford_sql(
    from_sql: str,
    val_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`benford` (same arithmetic digit
    extraction and χ² terms)."""
    import math as _m

    r = int(round_to)
    # CAST each probability literal to DOUBLE — bare 16-digit
    # literals parse as DECIMAL in DuckDB and the chisq arithmetic
    # overflows DECIMAL precision (ref round-6 type-sweep failure)
    pb_list = ", ".join(
        f"CAST({_m.log10(1 + 1.0 / d)!r} AS DOUBLE)"
        for d in range(1, 10))
    return f"""
WITH __f AS (
  SELECT abs(CAST({val_col} AS DOUBLE)) AS x
  FROM {from_sql}
  WHERE {val_col} IS NOT NULL
    AND NOT isnan(CAST({val_col} AS DOUBLE))
    AND abs(CAST({val_col} AS DOUBLE)) > 0
), __d0 AS (
  SELECT CAST(floor(x / power(10.0, floor(log10(x)))) AS INT) AS rawd
  FROM __f
), __d AS (
  -- drift-free boundary mapping (see operators.stats.benford):
  -- log10 drift down ⇒ raw 10, true digit 1; drift up ⇒ raw 0, true 9
  SELECT CASE WHEN rawd <= 0 THEN 9
              WHEN rawd >= 10 THEN 1
              ELSE rawd END AS digit
  FROM __d0
), __c AS (
  SELECT digit, count(*)::BIGINT AS n FROM __d GROUP BY digit
), __t AS (
  SELECT sum(n)::BIGINT AS N FROM __c
)
SELECT c.digit, c.n,
       round(c.n / CAST(t.N AS DOUBLE), {r}) AS p_obs,
       round(([{pb_list}])[c.digit], {r}) AS p_benford,
       round((c.n - t.N * ([{pb_list}])[c.digit])
             * (c.n - t.N * ([{pb_list}])[c.digit])
             / (t.N * ([{pb_list}])[c.digit]), {r}) AS chisq_term
FROM __c c CROSS JOIN __t t
"""


def _avg_ranks(rows: DataFrame, col: str, out_col: str) -> DataFrame:
    """(value, average rank) over the DISTINCT values of ``col`` in
    ``rows`` — fractional (tie-averaged) ranks, the standard rank
    transform for Spearman/Mann–Whitney: rank(v) = #smaller + (t+1)/2
    for a value tied t times. Runs on the skinny distinct-value frame
    via the two-phase ``running_total`` (never a single-partition
    window); ranks are exact multiples of 0.5, so every downstream sum
    is exact in double and engine-identical."""
    from .pipeline import running_total

    counts = rows.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__t"))
    c = running_total(counts, "__v", "__t", "__cum")
    return c.select(
        F.col("__v"),
        (
            (F.col("__cum") - F.col("__t")).cast("double")
            + (F.col("__t").cast("double") + 1.0) / 2.0
        ).alias(out_col),
        F.col("__t").alias(f"{out_col}_t"),
    )


def spearman_corr(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Spearman rank correlation of two columns — Pearson over
    tie-averaged ranks: the monotone-association screen that survives
    outliers and nonlinear (but monotone) relations where
    :func:`corr_matrix`'s Pearson misreads. Pairwise NULL/NaN
    deletion. Returns one row ``(n, rho)``; rho NULL when either
    rank set is constant.

    Determinism: fractional ranks are exact multiples of 0.5 and the
    moment sums of n ranks stay below 2^53 for any realistic n, so
    the whole computation is EXACT integer-arithmetic-in-double —
    bit-identical across engines and partitionings (no gini-class
    order noise at all).

    Scale: two skinny distinct-value rank frames (groupBy + two-phase
    running_total each), two value joins back (the rank frame is
    ≤ distinct-values sized — broadcastable for discrete metrics),
    ONE six-sum Pearson aggregate.
    """
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    # EAGER checkpoint: `rows` feeds THREE consumers (both rank
    # programs and the final join); lazily each would re-materialize
    # the caller's upstream from scratch (profiled: the same 1.3 MB
    # exchange-writing stage ran 3x per call). One materialization,
    # three reuses — the blocking_eval/fdr_bh recompute-vs-reuse move.
    rows = df.filter(
        a.isNotNull() & b.isNotNull() & ~F.isnan(a) & ~F.isnan(b)
    ).select(a.alias("__a"), b.alias("__b")).localCheckpoint()
    ra = _avg_ranks(rows, "__a", "__ra").select("__v", "__ra") \
        .withColumnRenamed("__v", "__a")
    rb = _avg_ranks(rows, "__b", "__rb").select("__v", "__rb") \
        .withColumnRenamed("__v", "__b")
    j = rows.join(ra, "__a").join(rb, "__b")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__ra").alias("sx"),
        F.sum("__rb").alias("sy"),
        F.sum(F.col("__ra") * F.col("__ra")).alias("sxx"),
        F.sum(F.col("__ra") * F.col("__rb")).alias("sxy"),
        F.sum(F.col("__rb") * F.col("__rb")).alias("syy"),
    )
    nD = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / nD
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / nD
    vy = F.col("syy") - F.col("sy") * F.col("sy") / nD
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return agg.select(
        F.col("n"), F.round(rho, int(round_to)).alias("rho"))


def spearman_corr_sql(
    from_sql: str,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`spearman_corr` (same tie-averaged
    ranks and fixed Pearson tree)."""
    return f"""
WITH __r AS (
  SELECT CAST({col_a} AS DOUBLE) AS __a, CAST({col_b} AS DOUBLE) AS __b
  FROM {from_sql}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
    AND NOT isnan(CAST({col_a} AS DOUBLE))
    AND NOT isnan(CAST({col_b} AS DOUBLE))
),
__ra AS (
  SELECT __v AS __a,
         CAST(__cum - __t AS DOUBLE)
         + (CAST(__t AS DOUBLE) + 1.0::DOUBLE) / 2.0::DOUBLE AS __rka
  FROM (
    SELECT __v, __t, sum(__t) OVER (ORDER BY __v) AS __cum FROM (
      SELECT __a AS __v, count(*)::BIGINT AS __t FROM __r GROUP BY 1)
  )
),
__rb AS (
  SELECT __v AS __b,
         CAST(__cum - __t AS DOUBLE)
         + (CAST(__t AS DOUBLE) + 1.0::DOUBLE) / 2.0::DOUBLE AS __rkb
  FROM (
    SELECT __v, __t, sum(__t) OVER (ORDER BY __v) AS __cum FROM (
      SELECT __b AS __v, count(*)::BIGINT AS __t FROM __r GROUP BY 1)
  )
),
__m AS (
  SELECT count(*)::BIGINT AS n,
         sum(__rka) AS sx, sum(__rkb) AS sy,
         sum(__rka * __rka) AS sxx, sum(__rka * __rkb) AS sxy,
         sum(__rkb * __rkb) AS syy
  FROM __r JOIN __ra USING (__a) JOIN __rb USING (__b)
)
SELECT n,
       round(CASE WHEN (sxx - sx * sx / CAST(n AS DOUBLE)) > 0
                   AND (syy - sy * sy / CAST(n AS DOUBLE)) > 0 THEN
         (sxy - sx * sy / CAST(n AS DOUBLE))
         / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                * (syy - sy * sy / CAST(n AS DOUBLE)))
       END, {int(round_to)}) AS rho
FROM __m
"""


def mannwhitney_u(
    df: DataFrame,
    val_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups —
    the nonparametric location test that needs no normality where
    :func:`welch_ttest` does: U from tie-averaged pooled ranks, plus
    the tie-corrected normal z (compare |z| to 1.96 for ~5%; the
    asymptotic p needs erf, which Spark SQL lacks — the z statistic
    is the engine-portable report, exactly as :func:`ks_test` reports
    its own closed-form p).

    Returns one row ``(n_a, n_b, u_a, u_b, z)``; z NULL when either
    group is empty or all values are tied.

    Determinism: rank sums are exact 0.5-multiples; the tie
    correction is exact integer arithmetic; the one sqrt is IEEE
    correctly-rounded — bit-identical across engines.

    Scale: one skinny pooled distinct-value frame (groupBy + two-phase
    running_total), per-group rank sums from ONE aggregate over it
    (never touches input rows again), 1-row output.
    """
    from .pipeline import running_total

    x = F.col(val_col).cast("double")
    filt = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & x.isNotNull() & ~F.isnan(x)
    )
    vals = filt.groupBy(x.alias("__v")).agg(
        F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0))
        .alias("__ca"),
        F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0))
        .alias("__cb"),
    ).withColumn("__t", F.col("__ca") + F.col("__cb"))
    c = running_total(vals, "__v", "__t", "__cum")
    rank = (
        (F.col("__cum") - F.col("__t")).cast("double")
        + (F.col("__t").cast("double") + 1.0) / 2.0
    )
    agg = c.agg(
        F.sum("__ca").alias("na"),
        F.sum("__cb").alias("nb"),
        F.sum(rank * F.col("__ca").cast("double")).alias("ra"),
        F.sum(
            (F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
            .cast("double")
        ).alias("ties"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    n = na + nb
    ua = F.col("ra") - na * (na + 1.0) / 2.0
    ub = na * nb - ua
    var = (na * nb / 12.0) * (
        (n + 1.0) - F.col("ties") / (n * (n - 1.0))
    )
    z = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0) & (var > 0),
        (ua - na * nb / 2.0) / F.sqrt(var),
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(ua, int(round_to)).alias("u_a"),
        F.round(ub, int(round_to)).alias("u_b"),
        F.round(z, int(round_to)).alias("z"),
    )


def mannwhitney_u_sql(
    from_sql: str,
    val_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`mannwhitney_u` (same ranks, tie
    correction, and z tree).

    Group labels render as SQL literals via an explicit type map:
    int/float pass through, bool becomes TRUE/FALSE, everything else
    (str, date, ...) is single-quoted ``str(...)`` — Python ``repr``
    would emit invalid SQL for bool/None/date labels.
    """

    def _lit(v):
        if v is None:
            raise ValueError("mannwhitney_u_sql: group label may not be None")
        if isinstance(v, bool):  # before int: bool is an int subclass
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    qa = _lit(group_a)
    qb = _lit(group_b)
    return f"""
WITH __f AS (
  SELECT CAST({val_col} AS DOUBLE) AS __v, {group_col} AS __g
  FROM {from_sql}
  WHERE {group_col} IN ({qa}, {qb}) AND {val_col} IS NOT NULL
    AND NOT isnan(CAST({val_col} AS DOUBLE))
),
__c AS (
  SELECT __v,
         sum(CASE WHEN __g = {qa} THEN 1 ELSE 0 END)::BIGINT AS __ca,
         sum(CASE WHEN __g = {qb} THEN 1 ELSE 0 END)::BIGINT AS __cb
  FROM __f GROUP BY 1
),
__rk AS (
  SELECT *, __ca + __cb AS __t,
         sum(__ca + __cb) OVER (ORDER BY __v) AS __cum
  FROM __c
),
__m AS (
  SELECT sum(__ca)::BIGINT AS na, sum(__cb)::BIGINT AS nb,
         sum((CAST(__cum - __t AS DOUBLE)
              + (CAST(__t AS DOUBLE) + 1.0::DOUBLE) / 2.0::DOUBLE)
             * CAST(__ca AS DOUBLE)) AS ra,
         sum(CAST(__t * __t * __t - __t AS DOUBLE)) AS ties
  FROM __rk
)
SELECT na AS n_a, nb AS n_b,
       round(ra - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0::DOUBLE)
                  / 2.0::DOUBLE, {int(round_to)}) AS u_a,
       round(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
             - (ra - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0::DOUBLE)
                     / 2.0::DOUBLE), {int(round_to)}) AS u_b,
       round(CASE WHEN na > 0 AND nb > 0 AND
         (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0::DOUBLE)
         * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0::DOUBLE)
            - ties / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                      * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)
                         - 1.0::DOUBLE))) > 0 THEN
         ((ra - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0::DOUBLE)
                / 2.0::DOUBLE)
          - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0::DOUBLE)
         / sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0::DOUBLE)
                * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0::DOUBLE)
                   - ties / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                             * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)
                                - 1.0::DOUBLE))))
       END, {int(round_to)}) AS z
FROM __m
"""


def kruskal_wallis(
    df: DataFrame,
    val_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kruskal–Wallis H test across k groups — the k-sample extension
    of :func:`mannwhitney_u` (one-way ANOVA on tie-averaged pooled
    ranks, no normality assumption): with R_i the rank sum and n_i the
    size of group i over N pooled values,

        H  = 12/(N(N+1)) · Σ_i R_i²/n_i − 3(N+1)
        H_c = H / (1 − Σ_t(t³−t)/(N³−N))     (tie correction)

    Compare H_c to the chi-square(k−1) critical value (5.991 for k=3
    at ~5%); the asymptotic p needs the incomplete gamma, which Spark
    SQL lacks — H is the engine-portable report, the
    :func:`mannwhitney_u` z convention. Returns one row
    ``(n, k_groups, h, h_corrected)``; ``h_corrected`` NULL when all
    values tie (correction 0).

    Determinism: midranks are exact 0.5-multiples from the two-phase
    ``running_total`` (never a single-partition window); per-group
    rank sums are exact dyadic doubles; the Σ R_i²/n_i fold runs over
    the GROUP-SORTED array in both engines (k is human-scale), so no
    float accumulation order ever differs.

    Scale: one (value, group) aggregate, one skinny distinct-value
    frame with the two-phase cumulative, one k-row fold — input rows
    are touched once.
    """
    from .pipeline import running_total

    x = F.col(val_col).cast("double")
    filt = df.filter(
        F.col(group_col).isNotNull() & x.isNotNull() & ~F.isnan(x))
    vg = filt.groupBy(
        x.alias("__v"), F.col(group_col).cast("string").alias("__g")
    ).agg(F.count(F.lit(1)).alias("__c"))
    vt = vg.groupBy("__v").agg(F.sum("__c").alias("__t"))
    c = running_total(vt, "__v", "__t", "__cum")
    rank = (
        (F.col("__cum") - F.col("__t")).cast("double")
        + (F.col("__t").cast("double") + 1.0) / 2.0
    )
    per_g = (
        vg.join(c.select("__v", "__t", "__cum"), "__v")
        .groupBy("__g")
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(rank * F.col("__c").cast("double")).alias("__r"),
        )
    )
    ties = c.agg(
        F.sum(
            (F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
            .cast("double")
        ).alias("__ties")
    )
    # Σ R_i²/n_i folded in group order — k bounded, order fixed
    folded = per_g.agg(
        F.sum("__n").alias("__N"),
        F.count(F.lit(1)).alias("k_groups"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__g").alias("g"),
                    (F.col("__r") * F.col("__r")
                     / F.col("__n").cast("double")).alias("t"),
                ))),
                lambda s: s["t"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__rr"),
    ).crossJoin(F.broadcast(ties))
    N = F.col("__N").cast("double")
    h = 12.0 / (N * (N + 1.0)) * F.col("__rr") - 3.0 * (N + 1.0)
    corr = 1.0 - F.col("__ties") / (N * N * N - N)
    return folded.select(
        F.col("__N").alias("n"),
        "k_groups",
        F.round(h, int(round_to)).alias("h"),
        F.round(F.when(corr > 0, h / corr), int(round_to))
        .alias("h_corrected"),
    )


def kruskal_wallis_sql(
    from_sql: str,
    val_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`kruskal_wallis` (same midranks, the
    same group-ordered Σ R_i²/n_i fold, same H tree)."""
    rt = int(round_to)
    return f"""
WITH __f AS (
  SELECT CAST({val_col} AS DOUBLE) AS __v,
         CAST({group_col} AS VARCHAR) AS __g
  FROM {from_sql}
  WHERE {group_col} IS NOT NULL AND {val_col} IS NOT NULL
    AND NOT isnan(CAST({val_col} AS DOUBLE))
), __vg AS (
  SELECT __v, __g, count(*)::BIGINT AS __c FROM __f GROUP BY 1, 2
), __vt AS (
  SELECT __v, sum(__c)::BIGINT AS __t FROM __vg GROUP BY 1
), __cm AS (
  SELECT __v, __t, sum(__t) OVER (ORDER BY __v) AS __cum FROM __vt
), __pg AS (
  SELECT g.__g, sum(g.__c)::BIGINT AS __n,
         sum((CAST(c.__cum - c.__t AS DOUBLE)
              + (CAST(c.__t AS DOUBLE) + 1.0::DOUBLE) / 2.0::DOUBLE)
             * CAST(g.__c AS DOUBLE)) AS __r
  FROM __vg g JOIN __cm c ON g.__v = c.__v GROUP BY 1
), __ties AS (
  SELECT sum(CAST(__t * __t * __t - __t AS DOUBLE)) AS __ties FROM __cm
), __agg AS (
  SELECT sum(__n)::BIGINT AS __N, count(*)::BIGINT AS k_groups,
         list_reduce(list_prepend(0.0::DOUBLE,
           list(__r * __r / CAST(__n AS DOUBLE) ORDER BY __g)),
           (acc, v) -> acc + v) AS __rr
  FROM __pg
)
SELECT a.__N AS n, a.k_groups,
       round(12.0::DOUBLE / (CAST(a.__N AS DOUBLE)
               * (CAST(a.__N AS DOUBLE) + 1.0::DOUBLE)) * a.__rr
             - 3.0::DOUBLE * (CAST(a.__N AS DOUBLE) + 1.0::DOUBLE),
             {rt}) AS h,
       round(CASE WHEN 1.0::DOUBLE - t.__ties
                       / (CAST(a.__N AS DOUBLE) * CAST(a.__N AS DOUBLE)
                          * CAST(a.__N AS DOUBLE) - CAST(a.__N AS DOUBLE))
                       > 0
             THEN (12.0::DOUBLE / (CAST(a.__N AS DOUBLE)
                     * (CAST(a.__N AS DOUBLE) + 1.0::DOUBLE)) * a.__rr
                   - 3.0::DOUBLE * (CAST(a.__N AS DOUBLE) + 1.0::DOUBLE))
                  / (1.0::DOUBLE - t.__ties
                     / (CAST(a.__N AS DOUBLE) * CAST(a.__N AS DOUBLE)
                        * CAST(a.__N AS DOUBLE) - CAST(a.__N AS DOUBLE)))
             END, {rt}) AS h_corrected
FROM __agg a, __ties t
"""


def anova_oneway(
    df: DataFrame,
    val_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic across k groups — the parametric
    companion of :func:`kruskal_wallis` (mean differences under a
    normality assumption where KW tests rank distributions): with
    per-group moment sums n_i, S_i = Σx, SS_i = Σx²,

        SSB = Σ_i n_i (S_i/n_i − x̄)²   (between-group)
        SSW = Σ_i (SS_i − S_i²/n_i)    (within-group)
        F   = (SSB/(k−1)) / (SSW/(N−k))
        η²  = SSB / (SSB + SSW)        (effect size)

    Compare F against the F(k−1, N−k) critical value — the F CDF
    needs the incomplete beta, which Spark SQL lacks (the
    :func:`welch_ttest` convention). Returns one row ``(n, k_groups,
    f_stat, eta_sq)``; F is NULL when k < 2, N ≤ k, or SSW = 0
    (η² still reported when SSB + SSW > 0).

    Determinism: per-group moments are ONE combine-friendly aggregate;
    every cross-group reduction (S, SSW, SSB) folds over the
    GROUP-SORTED array (k is human-scale), so no float accumulation
    order ever differs between engines; outputs round to ``round_to``.

    Scale: input rows are touched once (k-row group aggregate); the
    folds and the 1-row grand-mean broadcast are k-bounded.
    """
    x = F.col(val_col).cast("double")
    filt = df.filter(
        F.col(group_col).isNotNull() & x.isNotNull() & ~F.isnan(x))
    per_g = filt.groupBy(
        F.col(group_col).cast("string").alias("__g")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__ss"),
    )

    def _fold(term, name):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__g").alias("g"), term.alias("t")))),
                lambda s: s["t"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(name)

    nn = F.col("__n").cast("double")
    grand = per_g.agg(
        F.sum("__n").alias("__N"),
        F.count(F.lit(1)).alias("k_groups"),
        _fold(F.col("__s"), "__S"),
        _fold(F.col("__ss") - F.col("__s") * F.col("__s") / nn, "__ssw"),
    ).withColumn("__gm", F.col("__S") / F.col("__N").cast("double"))
    ssb = (
        per_g.crossJoin(F.broadcast(grand.select("__gm")))
        .agg(_fold(
            nn * (F.col("__s") / nn - F.col("__gm"))
            * (F.col("__s") / nn - F.col("__gm")), "__ssb"))
    )
    out = grand.crossJoin(F.broadcast(ssb))
    N = F.col("__N").cast("double")
    k = F.col("k_groups").cast("double")
    f_ok = ((F.col("k_groups") >= 2) & (F.col("__N") > F.col("k_groups"))
            & (F.col("__ssw") > 0))
    fstat = (F.col("__ssb") / (k - 1.0)) / (F.col("__ssw") / (N - k))
    eta = F.col("__ssb") / (F.col("__ssb") + F.col("__ssw"))
    return out.select(
        F.col("__N").alias("n"),
        "k_groups",
        F.round(F.when(f_ok, fstat), int(round_to)).alias("f_stat"),
        F.round(F.when(F.col("__ssb") + F.col("__ssw") > 0, eta),
                int(round_to)).alias("eta_sq"),
    )


def anova_oneway_sql(
    from_sql: str,
    val_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`anova_oneway` (same group-ordered
    moment folds, same F/η² tree)."""
    rt = int(round_to)

    def fold(term):
        return (f"list_reduce(list_prepend(0.0::DOUBLE,"
                f" list({term} ORDER BY __g)), (acc, v) -> acc + v)")

    return f"""
WITH __f AS (
  SELECT CAST({val_col} AS DOUBLE) AS __v,
         CAST({group_col} AS VARCHAR) AS __g
  FROM {from_sql}
  WHERE {group_col} IS NOT NULL AND {val_col} IS NOT NULL
    AND NOT isnan(CAST({val_col} AS DOUBLE))
), __pg AS (
  SELECT __g, count(*)::BIGINT AS __n, sum(__v) AS __s,
         sum(__v * __v) AS __ss
  FROM __f GROUP BY 1
), __gr AS (
  SELECT sum(__n)::BIGINT AS __N, count(*)::BIGINT AS k_groups,
         {fold('__s')} AS __S,
         {fold('__ss - __s * __s / CAST(__n AS DOUBLE)')} AS __ssw
  FROM __pg
), __gm AS (
  SELECT __S / CAST(__N AS DOUBLE) AS __gm FROM __gr
), __sb AS (
  SELECT {fold('CAST(__n AS DOUBLE)'
               ' * (__s / CAST(__n AS DOUBLE) - __gm)'
               ' * (__s / CAST(__n AS DOUBLE) - __gm)')} AS __ssb
  FROM __pg CROSS JOIN __gm
)
SELECT g.__N AS n, g.k_groups,
       round(CASE WHEN g.k_groups >= 2 AND g.__N > g.k_groups
                       AND g.__ssw > 0
                  THEN (b.__ssb / (CAST(g.k_groups AS DOUBLE) - 1.0::DOUBLE))
                       / (g.__ssw / (CAST(g.__N AS DOUBLE)
                                     - CAST(g.k_groups AS DOUBLE)))
             END, {rt}) AS f_stat,
       round(CASE WHEN b.__ssb + g.__ssw > 0
                  THEN b.__ssb / (b.__ssb + g.__ssw) END, {rt}) AS eta_sq
FROM __gr g CROSS JOIN __sb b
"""


def fd_profile(
    df: DataFrame,
    pairs: Sequence[Tuple[str, str]],
    round_to: int = 6,
) -> DataFrame:
    """Approximate functional-dependency profile — for each candidate
    dependency A → B, the g3 violation measure (Kivinen–Mannila): the
    minimum fraction of rows to delete for the FD to hold exactly,
    i.e. ``1 − Σ_a max_b count(a, b) / N``. The schema-discovery /
    data-quality companion of :func:`profile_columns`: 0 means the FD
    holds (B is determined by A — a normalization or dedup-key
    candidate), small values flag dirty dimensions. NULL is treated as
    an ordinary value on both sides (SQL GROUP BY semantics). Returns
    one row per pair ``(determinant, dependent, n, n_det, violations,
    violation_rate)``.

    Determinism: counts and max-counts are exact integers; the one
    ratio rounds to ``round_to``.

    Scale: per pair, one (A, B) groupBy (map-side combine) reduced to
    a skinny per-A max — input rows are touched once per pair and the
    pair list is human-scale; no joins, no windows.
    """
    if not pairs:
        raise ValueError("fd_profile: pairs must be non-empty")
    out = None
    for det, dep in pairs:
        ab = df.groupBy(
            F.col(det).alias("__a"), F.col(dep).alias("__b")
        ).agg(F.count(F.lit(1)).alias("__c"))
        per_a = ab.groupBy("__a").agg(
            F.sum("__c").alias("__tot"), F.max("__c").alias("__mx"))
        one = per_a.agg(
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.sum("__tot").alias("n"),
            F.count(F.lit(1)).alias("n_det"),
            (F.sum("__tot") - F.sum("__mx")).alias("violations"),
            F.round(
                (F.sum("__tot") - F.sum("__mx")).cast("double")
                / F.sum("__tot").cast("double"), int(round_to)
            ).alias("violation_rate"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def fd_profile_sql(
    from_sql: str,
    pairs: Sequence[Tuple[str, str]],
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`fd_profile` (same counts and ratio)."""
    if not pairs:
        raise ValueError("fd_profile_sql: pairs must be non-empty")
    parts = []
    for det, dep in pairs:
        parts.append(f"""
SELECT '{det}' AS determinant, '{dep}' AS dependent,
       sum(__tot)::BIGINT AS n,
       count(*)::BIGINT AS n_det,
       (sum(__tot) - sum(__mx))::BIGINT AS violations,
       round(CAST(sum(__tot) - sum(__mx) AS DOUBLE)
             / CAST(sum(__tot) AS DOUBLE), {int(round_to)})
         AS violation_rate
FROM (
  SELECT __a, sum(__c)::BIGINT AS __tot, max(__c)::BIGINT AS __mx
  FROM (
    SELECT {det} AS __a, {dep} AS __b, count(*)::BIGINT AS __c
    FROM {from_sql} GROUP BY 1, 2
  ) GROUP BY 1
)""")
    return "\nUNION ALL\n".join(parts)


def fdr_bh(
    df: DataFrame,
    p_col: str = "p_value",
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg false-discovery-rate correction — the
    multiple-testing control the per-test battery (ks/welch/chi²/
    kruskal/anova/mannwhitney) needs the moment it fans out over many
    features or segments: with m valid p-values, the adjusted
    q-value of the rank-i smallest p is ``min_{j≥i} p_(j)·m/j``
    (clamped at 1), and ``reject = q ≤ alpha`` discovers at FDR
    level alpha. Returns the input rows + ``(q_value, reject)``; NULL
    or NaN p-values pass through with NULL q/reject and do not count
    toward m.

    Determinism: q is arithmetic over exact integers (m, ranks) and
    the input p — division and MIN only, no float summation anywhere,
    so no rounding is required for engine stability. Ties in p share
    one q by construction (the min over the tie block lands at the
    block's largest rank).

    Scale: works on the DISTINCT-p frame (tests with equal p collapse
    first); the cumulative rank and the reverse running min both run
    the two-phase range-repartition program (per-partition window +
    broadcast partition offsets — never a single-partition window
    over the test frame), so a million-hypothesis screen holds.
    """
    from pyspark.sql import Window

    if not (0 < float(alpha) < 1):
        raise ValueError("alpha must be in (0, 1)")
    # pin the test frame once: it is consumed by FOUR subtrees (m-count,
    # distinct-p, the valid-row re-join, the invalid passthrough), each
    # of which would otherwise recompute the caller's upstream pipeline
    # (e.g. a whole KS battery) from scratch. The frame is one row per
    # hypothesis — skinny at any scale.
    df = df.localCheckpoint(eager=True)
    p = F.col(p_col).cast("double")
    valid = df.filter(p.isNotNull() & ~F.isnan(p))
    invalid = df.filter(p.isNull() | F.isnan(p))
    mrow = valid.agg(F.count(F.lit(1)).alias("__m"))
    dp = valid.groupBy(p.alias("__p")).agg(
        F.count(F.lit(1)).alias("__c"))
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                     "200"))
    # two-phase cumulative count (ascending p): r = rank of the tie
    # block's LAST member = #(p' <= p)
    d = (
        dp.repartitionByRange(n, F.col("__p").asc())
        .sortWithinPartitions(F.col("__p").asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    woff = Window.orderBy(F.col("__pid").asc()) \
                 .rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        d.groupBy("__pid").agg(F.sum("__c").alias("__s"))
        .withColumn("__off", F.coalesce(F.sum("__s").over(woff),
                                        F.lit(0).cast("long")))
        .drop("__s")
    )
    wrun = (
        Window.partitionBy("__pid").orderBy(F.col("__p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        d.join(F.broadcast(offs), "__pid")
        .withColumn("__r", F.sum("__c").over(wrun) + F.col("__off"))
        .drop("__pid", "__off", "__c")
        .crossJoin(F.broadcast(mrow))
        .withColumn(
            "__cv",
            F.col("__p") * F.col("__m").cast("double")
            / F.col("__r").cast("double"))
        .select("__p", "__cv")
    )
    # two-phase reverse running min of __cv (descending p)
    d2 = (
        ranked.repartitionByRange(n, F.col("__p").desc())
        .sortWithinPartitions(F.col("__p").desc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offs2 = (
        d2.groupBy("__pid").agg(F.min("__cv").alias("__s"))
        .withColumn("__off", F.min("__s").over(woff))
        .drop("__s")
    )
    wrun2 = (
        Window.partitionBy("__pid").orderBy(F.col("__p").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    qv = (
        d2.join(F.broadcast(offs2), "__pid")
        .withColumn(
            "__q",
            F.least(F.lit(1.0),
                    F.least(F.min("__cv").over(wrun2),
                            F.coalesce(F.col("__off"),
                                       F.lit(float("inf"))))))
        .select(F.col("__p"), "__q")
    )
    out_valid = (
        valid.join(qv, p == F.col("__p"))
        .drop("__p")
        .withColumn("q_value", F.col("__q"))
        .withColumn("reject", F.col("__q") <= float(alpha))
        .drop("__q")
    )
    out_invalid = invalid \
        .withColumn("q_value", F.lit(None).cast("double")) \
        .withColumn("reject", F.lit(None).cast("boolean"))
    return out_valid.unionByName(out_invalid)


def fdr_bh_sql(
    table_sql: str,
    p_col: str = "p_value",
    alpha: float = 0.05,
) -> str:
    """DuckDB mirror of :func:`fdr_bh` — same distinct-p collapse,
    (p·m)/r tree, reverse running min, clamp-after-min."""
    return f"""
WITH __fdr_in AS (
  SELECT * FROM {table_sql}
), __fdr_v AS (
  SELECT * FROM __fdr_in
  WHERE {p_col} IS NOT NULL AND NOT isnan(CAST({p_col} AS DOUBLE))
), __fdr_m AS (
  SELECT count(*)::BIGINT AS m FROM __fdr_v
), __fdr_dp AS (
  SELECT CAST({p_col} AS DOUBLE) AS p, count(*)::BIGINT AS c
  FROM __fdr_v GROUP BY 1
), __fdr_r AS (
  SELECT p,
         CAST(sum(c) OVER (ORDER BY p ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS r
  FROM __fdr_dp
), __fdr_q AS (
  SELECT p,
         least(CAST(1.0 AS DOUBLE),
               min(p * CAST((SELECT m FROM __fdr_m) AS DOUBLE)
                   / CAST(r AS DOUBLE))
               OVER (ORDER BY p DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS q
  FROM __fdr_r
)
SELECT v.*, q.q AS q_value, q.q <= {float(alpha)!r} AS reject
FROM __fdr_v v JOIN __fdr_q q ON CAST(v.{p_col} AS DOUBLE) = q.p
UNION ALL
SELECT i.*, CAST(NULL AS DOUBLE) AS q_value,
       CAST(NULL AS BOOLEAN) AS reject
FROM __fdr_in i
WHERE i.{p_col} IS NULL OR isnan(CAST(i.{p_col} AS DOUBLE))
"""
