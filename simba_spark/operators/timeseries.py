"""Time-series resampling with gap fill (north-star §2.7 extension).

Fixed-width bucket aggregation that emits a row for EVERY bucket in
each series' span — including empty ones — with per-column fill
policies (NULL, zero, forward-fill). The operation behind dashboard
downsampling, feature windows at fixed cadence, and sensor-stream
regularization; Spark has `window()` aggregation but nothing that
densifies the gaps.

Scale shape: one groupBy on (key, bucket) (map-side combined — raw
event volume collapses to bucket counts before the shuffle), a
per-key span aggregate DERIVED FROM THE BUCKETED FRAME (not the raw
events), a `sequence`-explode of each key's span joined back on
(key, bucket), and one per-key window for forward-fill. All shuffles
hash on the key; no driver round-trips, no Python in the data path.
The explode fan-out is each key's span/bucket count — a stray ancient
timestamp would silently inflate it, so `max_buckets_per_key` is
enforced DISTRIBUTEDLY via raise_error (no driver job, no surprise
10^9-row key).

The reference engine has no time-series surface; this extends the
interval family (operators/interval.py) the same way sessionize does.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    bucket_us: int,
    aggs: Optional[Dict[str, Column]] = None,
    zero_fill: Sequence[str] = (),
    ffill: Sequence[str] = (),
    interp: Sequence[str] = (),
    max_buckets_per_key: int = 1 << 20,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Dense fixed-width resample of `df` per `key_col`.

    Parameters
    ----------
    ts_col : TIMESTAMP/TIMESTAMP_NTZ column, or an integer column in
        the same unit as `bucket_us`.
    bucket_us : bucket width — microseconds for timestamp inputs, the
        column's own unit otherwise.
    aggs : output name -> aggregate Column over the bucket's rows
        (default: ``{"n_events": count(*)}``).
    zero_fill : agg names whose empty-bucket NULL becomes 0.
    ffill : agg names forward-filled from the latest non-empty bucket
        (after zero_fill; a name in both gets zeros, not carries).
    interp : agg names linearly interpolated across empty buckets
        between the surrounding non-null buckets (TimescaleDB's
        ``interpolate()`` semantics: leading/trailing gaps with no
        bracketing value stay NULL). Values widen to double. An interp
        name cannot also appear in zero_fill/ffill.
    max_buckets_per_key : hard cap on one key's dense span, enforced
        inside the plan with `raise_error` — a single stray ancient
        timestamp otherwise explodes sequence() silently.

    Returns one row per (key, bucket) over each key's [min, max]
    bucket span; `bucket_col` is the bucket index (bucket start =
    index · bucket_us).
    """
    if aggs is None:
        aggs = {"n_events": F.count(F.lit(1))}
    for n in list(zero_fill) + list(ffill) + list(interp):
        if n not in aggs:
            raise ValueError(f"fill column {n!r} is not an agg output")
    overlap = set(interp) & (set(zero_fill) | set(ffill))
    if overlap:
        raise ValueError(
            f"interp columns cannot also zero_fill/ffill: {sorted(overlap)}")
    bw = int(bucket_us)
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype == "timestamp_ntz":
        tnum = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    elif dtype.startswith("timestamp"):
        tnum = F.unix_micros(F.col(ts_col))
    else:
        tnum = F.col(ts_col).cast("long")
    # exact integer floor division on longs (a double round-trip loses
    # precision above 2^53 and can mis-bucket near boundaries): `div`
    # truncates toward zero, so subtract 1 for inexact negative
    # quotients — overflow-free, sign-correct floor
    if "__tnum" in df.columns:
        raise ValueError("reserved column name '__tnum' in input")
    b = F.expr(
        f"(__tnum div {bw}L) - "
        f"(CASE WHEN __tnum % {bw}L != 0 AND __tnum < 0 THEN 1 ELSE 0 END)"
    )

    # rows with a NULL time cannot bucket — drop them here (a key whose
    # times are ALL null disappears entirely) so the span aggregate
    # below never sees NULL bounds and trips the guard spuriously
    g = (
        df.withColumn("__tnum", tnum)
        .withColumn(bucket_col, b)
        .drop("__tnum")
        .filter(F.col(bucket_col).isNotNull())
        .groupBy(key_col, bucket_col)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    span = g.groupBy(key_col).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    guard = F.when(
        F.col("__mx") - F.col("__mn") < F.lit(int(max_buckets_per_key)),
        F.sequence(F.col("__mn"), F.col("__mx")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"resample: key span exceeds max_buckets_per_key="
                    f"{int(max_buckets_per_key)} for key "
                ),
                F.col(key_col).cast("string"),
                F.lit(" — widen bucket_us or filter outlier timestamps"),
            )
        ).cast("array<long>")
    )
    dense = span.select(key_col, F.explode(guard).alias(bucket_col))
    out = dense.join(g, on=[key_col, bucket_col], how="left")
    for n in zero_fill:
        out = out.withColumn(n, F.coalesce(F.col(n), F.lit(0)))
    if ffill:
        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col(bucket_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for n in ffill:
            out = out.withColumn(n, F.last(F.col(n), ignorenulls=True).over(w))
    if interp:
        # bracketing (bucket, value) pairs via ignore-nulls window scans
        # in both directions; the two extra window passes reuse the same
        # per-key bucket-sorted partitioning (one exchange + sort total).
        wb = Window.partitionBy(key_col).orderBy(F.col(bucket_col).asc())
        wprev = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wnext = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        for n in interp:
            v = F.col(n).cast("double")
            mark = F.when(v.isNotNull(),
                          F.struct(F.col(bucket_col).alias("b"),
                                   v.alias("v")))
            pv = F.last(mark, ignorenulls=True).over(wprev)
            nx = F.first(mark, ignorenulls=True).over(wnext)
            frac = (F.col(bucket_col) - pv["b"]).cast("double") / \
                (nx["b"] - pv["b"]).cast("double")
            filled = F.when(v.isNotNull(), v).otherwise(
                pv["v"] + (nx["v"] - pv["v"]) * frac)
            out = out.withColumn(n, filled)
    return out


def ewma(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    alpha: float = 0.3,
    window: int = 8,
    tiebreak_col: Optional[str] = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Adjusted exponentially-weighted moving average over each key's
    last ``window`` observations (pandas ``ewm(alpha).mean()``
    semantics restricted to a bounded frame): newer values weigh
    (1-alpha)^age more, y = sum(w_i * x_i) / sum(w_i). The bounded
    frame is what makes it distributed-friendly — an unbounded EWMA is
    inherently sequential per key, while the last-W form is ONE
    ordered window pass (collect_list over a rows-between frame, two
    constant-size aggregate folds per row — JVM-side, no UDF).

    Determinism / oracle parity: the numerator folds oldest→newest as
    ``acc*(1-alpha) + x`` from a 0.0 init (bit-identical to DuckDB's
    first-element-init ``list_reduce`` because ``0.0*(c)+x1 == x1``
    exactly); the weight sum uses the SAME fold with x≡1.0 rather
    than a closed-form ``pow`` (libm pow is not correctly-rounded and
    differs across engines by ulps). Rows with NULL values are
    dropped first (they would silently shift the frame weights).
    ``tiebreak_col`` (default: none) makes the order total when one
    key can carry duplicate timestamps."""
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    wlen = int(window)
    if wlen < 1:
        raise ValueError(f"window must be >= 1: {window}")
    decay = F.lit(1.0 - a)
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(key_col).orderBy(*order)
        .rowsBetween(-(wlen - 1), Window.currentRow)
    )
    base = df.filter(F.col(value_col).isNotNull())
    lst = F.collect_list(F.col(value_col).cast("double")).over(w)
    s = F.aggregate(lst, F.lit(0.0), lambda acc, x: acc * decay + x)
    wsum = F.aggregate(lst, F.lit(0.0),
                       lambda acc, _: acc * decay + F.lit(1.0))
    # + 0.0 canonicalizes -0.0 (a lone -0.0 value folds to +0.0 here
    # but stays -0.0 under DuckDB's first-element-init list_reduce;
    # numerically equal, bit-divergent — the oracle adds the same)
    return base.withColumn(out_col, s / wsum + F.lit(0.0))


def rollup_state(
    df: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
    keys: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """Continuous-aggregate state (the TimescaleDB hypertable-rollup /
    materialized-rollup analog): per (time-bucket, keys…) the EXACT
    mergeable partials ``(n, sum_c, sumsq_c, vmin, vmax)`` — counts
    and fixed-point 1e-2 / 1e-4 integer sums, so
    ``rollup_merge(state(A), state(B)) == rollup_state(A ∪ B)``
    bit-for-bit (long addition is exact and associative; double
    partial sums would be neither). The incremental-maintenance
    pattern: persist the state per day/partition, fold new batches in
    with :func:`rollup_merge`, read with :func:`rollup_finalize` —
    never re-scan history.

    One combine-friendly groupBy; ≤ #buckets×#keys skinny rows leave
    any partition regardless of data size. NULL values are excluded
    (SQL aggregate semantics).
    """
    v = F.col(value_col)
    cents = F.round(v * 100.0, 0).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_c"),
            F.sum(cents * cents).alias("sumsq_c"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
        )
    )


def rollup_merge(*states: DataFrame) -> DataFrame:
    """Merge rollup states (same schema) into one: union + re-aggregate
    the partials. Exactly associative and commutative — any merge tree
    over any batch split yields the identical state."""
    if not states:
        raise ValueError("rollup_merge needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    gcols = [c for c in u.columns
             if c not in ("n", "sum_c", "sumsq_c", "vmin", "vmax")]
    return u.groupBy(*gcols).agg(
        F.sum("n").alias("n"),
        F.sum("sum_c").alias("sum_c"),
        F.sum("sumsq_c").alias("sumsq_c"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def rollup_finalize(state: DataFrame, round_to: int = 6) -> DataFrame:
    """Read a rollup state as final aggregates: (groups…, n, vsum,
    vavg, vvar, vmin, vmax). vsum is the exact cent sum; variance is
    the population form from the fixed-point moments (deterministic —
    no float partials ever crossed a merge)."""
    mean_c = F.col("sum_c") / F.col("n")
    var_c = F.col("sumsq_c") / F.col("n") - mean_c * mean_c
    gcols = [c for c in state.columns
             if c not in ("n", "sum_c", "sumsq_c", "vmin", "vmax")]
    return state.select(
        *gcols,
        "n",
        (F.col("sum_c") / 100.0).alias("vsum"),
        F.round(mean_c / 100.0, round_to).alias("vavg"),
        F.round(var_c / 10000.0, round_to).alias("vvar"),
        "vmin",
        "vmax",
    )


def rollup_sql(
    from_sql: str,
    ts_col: str = "ts",
    bucket: str = "hour",
    keys: Sequence[str] = (),
    value_col: str = "value",
    round_to: int = 6,
) -> str:
    """DuckDB SQL mirror of ``rollup_finalize(rollup_state(df))`` —
    the direct (non-incremental) computation, which the exact merge
    property makes equal to ANY batched/merged evaluation."""
    gsel = "".join(f"{k}, " for k in keys)
    gby = ", ".join(["bucket_ts", *keys])
    return f"""
WITH __st AS (
  -- TIMESTAMP cast: DuckDB's date_trunc('day') yields DATE where
  -- Spark yields TIMESTAMP — same instant, type-divergent hash
  SELECT CAST(date_trunc('{bucket}', {ts_col}) AS TIMESTAMP) AS bucket_ts,
         {gsel}
         count(*) AS n,
         sum(CAST(round({value_col} * 100.0, 0) AS BIGINT)) AS sum_c,
         sum(CAST(round({value_col} * 100.0, 0) AS BIGINT)
             * CAST(round({value_col} * 100.0, 0) AS BIGINT)) AS sumsq_c,
         min({value_col}) AS vmin, max({value_col}) AS vmax
  FROM {from_sql} WHERE {value_col} IS NOT NULL
  GROUP BY {gby}
)
SELECT bucket_ts, {gsel} n,
       (sum_c / 100.0::DOUBLE) AS vsum,
       round((sum_c / CAST(n AS DOUBLE)) / 100.0::DOUBLE,
             {int(round_to)}) AS vavg,
       round((sumsq_c / CAST(n AS DOUBLE)
              - (sum_c / CAST(n AS DOUBLE)) * (sum_c / CAST(n AS DOUBLE)))
             / 10000.0::DOUBLE, {int(round_to)}) AS vvar,
       vmin, vmax
FROM __st
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecasting


def forecast_seasonal_naive(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    period: int,
    horizon: int,
    drift: bool = False,
) -> DataFrame:
    """Seasonal-naive forecast over a bucketed series (the output of
    :func:`resample`): the prediction for future bucket T+h is the
    observed value one season back, ŷ(T+h) = y(T+h − period·⌈h/period⌉)
    — the standard strong baseline every fancier model must beat, and
    the capacity-planning default for event volumes. With
    ``drift=True`` a linear trend term is added: the per-bucket slope
    (y_last − y_first)/(last − first) times h (Hyndman's drift
    method), so level shifts between seasons are extrapolated.

    Returns ``(key, bucket, yhat, h)`` — ``horizon`` rows per key,
    ``bucket`` continuing the input indexing. A source bucket missing
    from a sparse input yields yhat NULL for that h (compose with
    ``resample(zero_fill=...)`` for dense series).

    Scale shape: one skinny per-key aggregate (last/first bucket and
    their values), an explode to `horizon` rows per key, and ONE
    equi-join back to the series on (key, source-bucket). Nothing is
    collected; cost is O(rows + keys·horizon).

    CONTRACT: (key, bucket) must be unique (resample output is) —
    duplicate buckets would fan out the source join and make
    max_by/min_by tiebreaks engine-dependent.
    """
    period = int(period)
    horizon = int(horizon)
    if period < 1:
        raise ValueError(f"period must be >= 1: {period}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    b = F.col(bucket_col)
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(key_col).agg(
        F.max(b).alias("__last"),
        F.min(b).alias("__first"),
        F.max_by(v, b).alias("__vlast"),
        F.min_by(v, b).alias("__vfirst"),
    )
    fut = bounds.select(
        key_col, "__last", "__first", "__vlast", "__vfirst",
        F.explode(F.expr(f"sequence(1, {horizon})")).alias("h"),
    )
    # integer ceil-div: go (⌈h/period⌉) seasons back into observed data
    wrap = F.expr(f"(h + {period} - 1) div {period}")
    src = F.col("__last") + F.col("h") - wrap * period
    fut = fut.withColumn("__src", src)
    series = df.select(
        F.col(key_col).alias("__k"),
        b.alias("__b"),
        v.alias("__v"),
    )
    out = fut.join(
        series,
        (F.col(key_col) == F.col("__k")) & (F.col("__src") == F.col("__b")),
        "left",
    )
    yhat = F.col("__v")
    if drift:
        span = (F.col("__last") - F.col("__first")).cast("double")
        slope = F.when(
            span > 0,
            (F.col("__vlast") - F.col("__vfirst")) / span,
        ).otherwise(F.lit(0.0))
        yhat = yhat + slope * F.col("h").cast("double")
    return out.select(
        F.col(key_col),
        (F.col("__last") + F.col("h")).alias(bucket_col),
        yhat.alias("yhat"),
        F.col("h"),
    )


def forecast_seasonal_naive_sql(
    series_sql: str,
    key: str,
    bucket: str,
    value: str,
    period: int,
    horizon: int,
    drift: bool = False,
) -> str:
    """DuckDB mirror of :func:`forecast_seasonal_naive` (same season
    wrap-around, drift slope, and NULL semantics)."""
    period = int(period)
    horizon = int(horizon)
    dexpr = (
        f" + (CASE WHEN (bd.__last - bd.__first) > 0 THEN "
        f"(bd.__vlast - bd.__vfirst) / CAST(bd.__last - bd.__first AS DOUBLE)"
        f" ELSE 0.0::DOUBLE END) * CAST(f.h AS DOUBLE)"
        if drift else ""
    )
    return f"""
WITH __s AS (SELECT {key} AS __k, {bucket} AS __b,
                    CAST({value} AS DOUBLE) AS __v FROM ({series_sql})),
__bd AS (
  SELECT __k, max(__b) AS __last, min(__b) AS __first,
         max_by(__v, __b) AS __vlast, min_by(__v, __b) AS __vfirst
  FROM __s GROUP BY 1
),
__f AS (
  SELECT bd.__k, bd.__last, h
  FROM __bd bd, (SELECT unnest(range(1, {horizon} + 1)) AS h)
)
SELECT f.__k AS {key}, f.__last + f.h AS {bucket},
       (s.__v{dexpr}) AS yhat, f.h AS h
FROM __f f
JOIN __bd bd ON f.__k = bd.__k
LEFT JOIN __s s
  ON s.__k = f.__k
 AND s.__b = f.__last + f.h - ((f.h + {period} - 1) // {period}) * {period}
"""


def acf(
    df: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    val_col: str = "n_events",
    lags: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-key sample autocorrelation at lags 1..``lags`` over a
    bucketed series frame (one row per (key, bucket) — the shape
    :func:`resample` emits, or any groupBy-bucket aggregate). The
    seasonality/memory diagnostic behind lag selection for
    :func:`forecast_seasonal_naive` and anomaly baselines.

    ``acf`` here is Pearson correlation over the lag-ℓ pair set
    {(x_b, x_{b-ℓ})} — the "cross-correlation of the series with
    itself" variant, computed only where BOTH buckets exist. On a
    sparse series gaps are skipped pairwise; zero-fill first (via
    ``resample(zero_fill=...)``) when an empty bucket means 0, not
    missing.

    Returns ``(key, lag, n, acf)``; ``acf`` is NULL when either side
    of a pair set is constant (zero variance), ``n`` is the pair
    count.

    Determinism: on integer-valued series (counts) every moment sum
    is an exact integer in double range, so Spark and any SQL engine
    compute bit-identical correlations regardless of partition order
    — no rounding leeway needed beyond ``round_to``.

    Scale: lags explode each series row ``lags`` times (skinny
    (key, bucket, x) rows), then ONE equi-join on
    (key, bucket - lag) = (key, bucket) and ONE combine-friendly
    groupBy(key, lag) of five moment sums. Everything shuffles on the
    key, so a million independent series parallelize; no window over
    a global sort, no driver state.
    """
    if lags < 1:
        raise ValueError("lags must be >= 1")
    x = F.col(val_col).cast("double")
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(bucket_col).cast("long").alias("__b"),
        x.alias("__x"),
    )
    left = base.withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(int(lags))))
    )
    right = base.select(
        F.col("__k").alias("__k2"),
        F.col("__b").alias("__b2"),
        F.col("__x").alias("__y"),
    )
    pairs = left.join(
        right,
        (left["__k"] == right["__k2"])
        & (right["__b2"] == left["__b"] - left["lag"]),
    )
    agg = pairs.groupBy(F.col("__k").alias(key_col), "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nn = F.col("n").cast("double")
    num = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dl = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dr = nn * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        key_col,
        "lag",
        "n",
        F.when(
            (dl > 0) & (dr > 0),
            F.round(num / F.sqrt(dl * dr), int(round_to)),
        ).alias("acf"),
    )


def acf_sql(
    series_sql: str,
    key_col: str = "key",
    bucket_col: str = "bucket",
    val_col: str = "x",
    lags: int = 6,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`acf`. ``series_sql`` is a relation
    with (key, bucket, value) columns — mirror whatever bucketing
    produced the Spark-side series."""
    return f"""
WITH __s AS (
  SELECT {key_col} AS k, CAST({bucket_col} AS BIGINT) AS b,
         CAST({val_col} AS DOUBLE) AS x
  FROM {series_sql}
), __p AS (
  SELECT a.k, g.lag, a.x AS x, b.x AS y
  FROM __s a
  CROSS JOIN (SELECT CAST(range AS INT) AS lag
              FROM range(1, {int(lags) + 1})) g
  JOIN __s b ON b.k = a.k AND b.b = a.b - g.lag
), __m AS (
  SELECT k, lag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM __p GROUP BY k, lag
)
SELECT k AS {key_col}, lag, n,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round((n * sxy - sx * sy) /
                       sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                       {int(round_to)})
       END AS acf
FROM __m
"""


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    val_col: str = "n_events",
    period: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Classical additive decomposition of a bucketed series into
    trend + seasonal + residual — the day-of-week/hour-of-day
    structure screen behind anomaly baselining and
    :func:`forecast_seasonal_naive` period choice.

    Per (key, bucket) row: ``trend`` is the centered moving average
    over ``period`` buckets (the standard 2×MA with half-weight ends
    for even periods), NULL where the window is incomplete (series
    edges / gaps — compose with :func:`resample` for dense series);
    ``seasonal`` is the per-(key, bucket % period) mean of the
    detrended series, centered so the period sums to ~0; ``resid`` is
    the leftover. Returns (key, bucket, value, trend, seasonal,
    resid).

    Engine-exactness (the `gini` lesson applied by construction): on
    integer-valued series every aggregated quantity here is an EXACT
    integer sum — the moving-average numerators (window sums), the
    seasonal numerators Σx and Σ(trend-numerator) — and doubles enter
    only in per-row divisions of identical exact operands, so no
    result depends on partition/summation order. The one
    multi-element float reduction (the centering mean over the
    period's seasonal means) runs as a FIXED-ORDER fold over the
    pos-sorted array in both engines.

    Scale: two RANGE-frame window passes sharing one (key, bucket)
    exchange + one skinny (key, pos) groupBy (≤ period rows per key)
    + one ≤ period-element per-key fold broadcast back by join — no
    global windows, a million independent series parallelize.
    """
    from pyspark.sql import Window

    p = int(period)
    if p < 2:
        raise ValueError("period must be >= 2")
    x = F.col(val_col).cast("double")
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(bucket_col).cast("long").alias("__b"),
        x.alias("__x"),
    )
    w = Window.partitionBy("__k").orderBy("__b")
    if p % 2:
        h = (p - 1) // 2
        fr = w.rangeBetween(-h, h)
        snum = F.sum("__x").over(fr)
        cnt = F.count("__x").over(fr)
        ok = cnt == p
        denom = float(p)
    else:
        h = p // 2
        f1 = w.rangeBetween(-h, h - 1)
        f2 = w.rangeBetween(-h + 1, h)
        snum = F.sum("__x").over(f1) + F.sum("__x").over(f2)
        ok = (F.count("__x").over(f1) == p) & (F.count("__x").over(f2) == p)
        denom = float(2 * p)
    t = base.withColumn("__snum", F.when(ok, snum)) \
            .withColumn("__pos", F.pmod(F.col("__b"), F.lit(p)))
    # seasonal mean of (x − snum/denom) computed as
    # (Σx − (Σsnum)/denom)/n — algebraically identical, but the sums
    # are exact integers so the value is partition-order-independent
    sea = (
        t.filter(F.col("__snum").isNotNull())
        .groupBy("__k", "__pos")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum("__x").alias("__sx"),
             F.sum("__snum").alias("__ss"))
        .withColumn(
            "__sraw",
            (F.col("__sx") - F.col("__ss") / F.lit(denom))
            / F.col("__n").cast("double"))
    )
    # center: fixed-order fold over the pos-sorted seasonal means
    cen = (
        sea.groupBy("__k")
        .agg(F.sort_array(
            F.collect_list(F.struct("__pos", "__sraw"))).alias("__l"))
        .select(
            "__k",
            (F.aggregate("__l", F.lit(0.0),
                         lambda acc, s: acc + s["__sraw"])
             / F.size("__l").cast("double")).alias("__cen"))
    )
    out = (
        t.join(sea.select("__k", "__pos", "__sraw"),
               on=["__k", "__pos"], how="left")
        .join(cen, on="__k", how="left")
    )
    trend = F.col("__snum") / F.lit(denom)
    seasonal = F.col("__sraw") - F.col("__cen")
    return out.select(
        F.col("__k").alias(key_col),
        F.col("__b").alias(bucket_col),
        F.col("__x").alias(val_col),
        F.round(trend, int(round_to)).alias("trend"),
        F.round(seasonal, int(round_to)).alias("seasonal"),
        F.round(F.col("__x") - trend - seasonal,
                int(round_to)).alias("resid"),
    )


def seasonal_decompose_sql(
    series_sql: str,
    key_col: str = "key",
    bucket_col: str = "bucket",
    val_col: str = "x",
    period: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`seasonal_decompose` — same window
    frames, same exact-integer seasonal arithmetic, same fixed-order
    centering fold (list_reduce over the pos-sorted means)."""
    p = int(period)
    r = int(round_to)
    if p % 2:
        h = (p - 1) // 2
        snum = f"sum(x) OVER (PARTITION BY k ORDER BY b RANGE BETWEEN {h} PRECEDING AND {h} FOLLOWING)"
        cond = (f"count(x) OVER (PARTITION BY k ORDER BY b RANGE BETWEEN {h} "
                f"PRECEDING AND {h} FOLLOWING) = {p}")
        denom = float(p)
    else:
        h = p // 2
        s1 = (f"sum(x) OVER (PARTITION BY k ORDER BY b RANGE BETWEEN {h} "
              f"PRECEDING AND {h - 1} FOLLOWING)")
        s2 = (f"sum(x) OVER (PARTITION BY k ORDER BY b RANGE BETWEEN {h - 1} "
              f"PRECEDING AND {h} FOLLOWING)")
        c1 = (f"count(x) OVER (PARTITION BY k ORDER BY b RANGE BETWEEN {h} "
              f"PRECEDING AND {h - 1} FOLLOWING) = {p}")
        c2 = (f"count(x) OVER (PARTITION BY k ORDER BY b RANGE BETWEEN {h - 1} "
              f"PRECEDING AND {h} FOLLOWING) = {p}")
        snum = f"({s1} + {s2})"
        cond = f"({c1} AND {c2})"
        denom = float(2 * p)
    return f"""
WITH __s AS (
  SELECT {key_col} AS k, CAST({bucket_col} AS BIGINT) AS b,
         CAST({val_col} AS DOUBLE) AS x
  FROM {series_sql}
), __t AS (
  SELECT k, b, x,
         CASE WHEN {cond} THEN {snum} END AS snum,
         CAST(b % {p} + {p} AS BIGINT) % {p} AS pos
  FROM __s
), __sea AS (
  SELECT k, pos, count(*) AS n, sum(x) AS sx, sum(snum) AS ss,
         (sum(x) - sum(snum) / {denom!r}) / count(*) AS sraw
  FROM __t WHERE snum IS NOT NULL GROUP BY k, pos
), __cen AS (
  SELECT k,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(
               list_sort(list({{'pos': pos, 'sraw': sraw}})),
               s -> s.sraw)),
           (acc, v) -> acc + v) / count(*) AS cen
  FROM __sea GROUP BY k
)
SELECT t.k AS {key_col}, t.b AS {bucket_col}, t.x AS {val_col},
       round(t.snum / {denom!r}, {r}) AS trend,
       round(s.sraw - c.cen, {r}) AS seasonal,
       round(t.x - t.snum / {denom!r} - (s.sraw - c.cen), {r}) AS resid
FROM __t t
LEFT JOIN __sea s ON s.k = t.k AND s.pos = t.pos
LEFT JOIN __cen c ON c.k = t.k
"""


def cusum(
    df: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    val_col: str = "n_events",
    slack: float = 0.5,
    threshold: float = 5.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-key two-sided CUSUM change-point scores over a bucketed
    series frame (the :func:`resample` shape). The classic
    mean-shift detector: standardize against the key's own mean/std,
    then accumulate excursions beyond ``slack`` sigmas; an alarm at
    ``cusum_up``/``cusum_dn`` > ``threshold`` flags a sustained level
    shift (where :func:`.stats.robust_zscore` flags single spikes).

    The textbook recursion S_t = max(0, S_{t-1} + z_t - slack) is not
    window-expressible directly, but unrolls exactly: with prefix sum
    C_t = Σ(z_i - slack), S_t = C_t - min(0, min_{i<=t} C_i) — two
    running windows, no recursion. Same trick mirrored for the
    downward side.

    Returns ``(key, bucket, z, cusum_up, cusum_dn, alarm)`` for every
    series row.

    Determinism: mean/std come from explicit moment sums (exact
    integers on count series), and window prefix sums fold in bucket
    order in any engine — bit-identical vs the SQL mirror.

    Scale: one combine-friendly moment aggregate per key (joined back
    on the key), then windows partitioned BY KEY ordered by bucket —
    each key's series sorts within its partition, a million
    independent series parallelize, no global sort, no driver state.
    """
    from pyspark.sql import Window

    x = F.col(val_col).cast("double")
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(bucket_col).cast("long").alias("__b"),
        x.alias("__x"),
    )
    mom = base.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    nn = F.col("__n").cast("double")
    mean = F.col("__sx") / nn
    var = F.col("__sxx") / nn - mean * mean
    withz = (
        base.join(mom, "__k")
        .withColumn("__sd", F.when(var > 0, F.sqrt(var)))
        .withColumn(
            "__z",
            F.when(F.col("__sd").isNotNull(),
                   (F.col("__x") - mean) / F.col("__sd"))
            .otherwise(F.lit(0.0)),
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = float(slack)
    cu = F.sum(F.col("__z") - F.lit(s)).over(w)
    cd = F.sum(-F.col("__z") - F.lit(s)).over(w)
    stepped = (
        withz.withColumn("__cu", cu)
        .withColumn("__cd", cd)
        .withColumn("__mu", F.least(F.lit(0.0), F.min("__cu").over(w)))
        .withColumn("__md", F.least(F.lit(0.0), F.min("__cd").over(w)))
    )
    up = F.col("__cu") - F.col("__mu")
    dn = F.col("__cd") - F.col("__md")
    return stepped.select(
        F.col("__k").alias(key_col),
        F.col("__b").alias(bucket_col),
        F.round("__z", int(round_to)).alias("z"),
        F.round(up, int(round_to)).alias("cusum_up"),
        F.round(dn, int(round_to)).alias("cusum_dn"),
        ((up > float(threshold)) | (dn > float(threshold)))
        .alias("alarm"),
    )


def cusum_sql(
    series_sql: str,
    key_col: str = "key",
    bucket_col: str = "bucket",
    val_col: str = "x",
    slack: float = 0.5,
    threshold: float = 5.0,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`cusum` — identical moment-sum
    standardization and running-min unrolling."""
    s = float(slack)
    h = float(threshold)
    return f"""
WITH __s AS (
  SELECT {key_col} AS k, CAST({bucket_col} AS BIGINT) AS b,
         CAST({val_col} AS DOUBLE) AS x
  FROM {series_sql}
), __m AS (
  SELECT k, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
  FROM __s GROUP BY k
), __z AS (
  SELECT s.k, s.b,
         CASE WHEN (m.sxx / m.n - (m.sx / m.n) * (m.sx / m.n)) > 0
              THEN (s.x - m.sx / m.n) /
                   sqrt(m.sxx / m.n - (m.sx / m.n) * (m.sx / m.n))
              ELSE 0.0 END AS z
  FROM __s s JOIN __m m USING (k)
), __c AS (
  SELECT k, b, z,
         sum(z - {s!r}::DOUBLE) OVER (
           PARTITION BY k ORDER BY b
           ROWS UNBOUNDED PRECEDING) AS cu,
         sum(-z - {s!r}::DOUBLE) OVER (
           PARTITION BY k ORDER BY b
           ROWS UNBOUNDED PRECEDING) AS cd
  FROM __z
), __mm AS (
  SELECT k, b, z, cu, cd,
         least(0.0, min(cu) OVER (
           PARTITION BY k ORDER BY b
           ROWS UNBOUNDED PRECEDING)) AS mu,
         least(0.0, min(cd) OVER (
           PARTITION BY k ORDER BY b
           ROWS UNBOUNDED PRECEDING)) AS md
  FROM __c
)
SELECT k AS {key_col}, b AS {bucket_col},
       round(z, {int(round_to)}) AS z,
       round(cu - mu, {int(round_to)}) AS cusum_up,
       round(cd - md, {int(round_to)}) AS cusum_dn,
       (cu - mu > {h!r}::DOUBLE OR cd - md > {h!r}::DOUBLE) AS alarm
FROM __mm
"""


def cusum_baseline(
    df: DataFrame,
    key_col: str,
    val_col: str = "n_events",
) -> DataFrame:
    """Per-key (mean, std) fitted with EXACTLY :func:`cusum`'s moment
    formulas (population variance from sum/sum-of-squares) — the
    offline-fit half of the streaming CUSUM deployment
    (:func:`..streaming.ops.streaming_cusum` scores live series
    points against this frame). Returns ``(key, __mu, __sd)``;
    ``__sd`` is NULL for a constant (or single-point) key."""
    x = F.col(val_col).cast("double")
    mom = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
    )
    nn = F.col("__n").cast("double")
    mean = F.col("__sx") / nn
    var = F.col("__sxx") / nn - mean * mean
    return mom.select(
        F.col(key_col),
        mean.alias("__mu"),
        F.when(var > 0, F.sqrt(var)).alias("__sd"),
    )


def linreg_series(
    df: DataFrame,
    key_col: str,
    bucket_col: str = "bucket",
    val_col: str = "n_events",
    round_to: int = 6,
) -> DataFrame:
    """Per-key OLS trend line over a bucketed series frame: slope /
    intercept of value on the bucket index plus r² — the
    grows-or-shrinks screen run across a million metrics at once
    (:func:`cusum` finds level SHIFTS; this ranks sustained DRIFT).

    Returns ``(key, n, slope, intercept, r2)``; slope/intercept are
    NULL for keys with a single bucket (or identical buckets), r2
    additionally NULL for a constant value series.

    Determinism: one groupBy computes the five moment sums; on count
    series with integer bucket indexes every sum is an exact integer,
    so the closed-form OLS arithmetic is bit-identical across engines.

    Scale: ONE combine-friendly aggregate keyed on the series key —
    a partition forwards five doubles per key regardless of series
    length; no window, no sort, no driver state.
    """
    x = F.col(bucket_col).cast("double")
    y = F.col(val_col).cast("double")
    m = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    nn = F.col("n").cast("double")
    dx = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = nn * F.col("__syy") - F.col("__sy") * F.col("__sy")
    num = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = num / dx
    intercept = (F.col("__sy") - slope * F.col("__sx")) / nn
    r2 = (num * num) / (dx * dy)
    return m.select(
        key_col,
        "n",
        F.round(F.when(dx > 0, slope), int(round_to)).alias("slope"),
        F.round(F.when(dx > 0, intercept), int(round_to))
        .alias("intercept"),
        F.round(F.when((dx > 0) & (dy > 0), r2), int(round_to))
        .alias("r2"),
    )


def linreg_series_sql(
    series_sql: str,
    key_col: str = "key",
    bucket_col: str = "bucket",
    val_col: str = "x",
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`linreg_series` (same moment folds and
    guards)."""
    r = int(round_to)
    return f"""
WITH __s AS (
  SELECT {key_col} AS k, CAST({bucket_col} AS DOUBLE) AS x,
         CAST({val_col} AS DOUBLE) AS y
  FROM {series_sql}
), __m AS (
  SELECT k, count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM __s GROUP BY k
), __d AS (
  SELECT k, n,
         n * sxx - sx * sx AS dx,
         n * syy - sy * sy AS dy,
         n * sxy - sx * sy AS num,
         sx, sy
  FROM __m
)
SELECT k AS {key_col}, n,
       round(CASE WHEN dx > 0 THEN num / dx END, {r}) AS slope,
       round(CASE WHEN dx > 0
                  THEN (sy - (num / dx) * sx) / n END, {r}) AS intercept,
       round(CASE WHEN dx > 0 AND dy > 0
                  THEN num * num / (dx * dy) END, {r}) AS r2
FROM __d
"""


def ohlc(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    key_cols: Optional[Sequence[str]] = None,
    bucket: str = "1 day",
    tiebreak_col: Optional[str] = None,
    cents: bool = True,
) -> DataFrame:
    """Per-(key, time-bucket) OHLC bars: open (earliest value), high,
    low, close (latest), n, and the bucket's exact value sum — the
    resample-to-bars primitive for tick/metric streams.

    Open/close are picked by row_number over (ts, tiebreak) — NOT by a
    float min/max on ts — so same-timestamp rows resolve
    deterministically and the result is partitioning/engine-stable.
    Plan: ONE shuffle on (keys, bucket) shared by both window passes
    (same partition keys, opposite sort orders) and the final
    aggregate; the sum is exact integer cents when ``cents`` (float
    sums are order-dependent and would break hash parity).
    """
    keys = list(key_cols or [])
    b = F.window(F.col(ts_col), bucket)["start"].alias("bucket")
    order = [F.col(ts_col).asc()]
    order_d = [F.col(ts_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
        order_d.append(F.col(tiebreak_col).desc())
    base = (
        df.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .select(*keys, F.col(ts_col), F.col(tiebreak_col)
                if tiebreak_col else F.lit(0).alias("__tb"),
                F.col(val_col).cast("double").alias("__v"), b)
    )
    wa = Window.partitionBy(*keys, "bucket").orderBy(*order)
    wd = Window.partitionBy(*keys, "bucket").orderBy(*order_d)
    ranked = base.withColumn("__ra", F.row_number().over(wa)) \
                 .withColumn("__rd", F.row_number().over(wd))
    val_sum = (
        F.sum(F.round(F.col("__v") * 100.0, 0).cast("long")) / 100.0
        if cents else F.sum("__v")
    )
    return (
        ranked.groupBy(*keys, "bucket")
        .agg(
            F.max(F.when(F.col("__ra") == 1, F.col("__v"))).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(F.when(F.col("__rd") == 1, F.col("__v"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
            val_sum.alias("val_sum"),
        )
    )


def ohlc_sql(
    from_sql: str,
    ts_col: str,
    val_col: str,
    key_cols: Optional[Sequence[str]] = None,
    bucket_sql: str = "CAST(date_trunc('day', {ts}) AS TIMESTAMP)",
    tiebreak_col: Optional[str] = None,
    cents: bool = True,
) -> str:
    """DuckDB mirror of :func:`ohlc` (daily buckets by default —
    mirror Spark's window('1 day') via date_trunc; the CAST matters:
    DuckDB's day-precision date_trunc returns DATE, Spark's window
    start is TIMESTAMP, and the driver hash is type-sensitive)."""
    keys = list(key_cols or [])
    gsel = "".join(f"{k}, " for k in keys)
    gby = ", ".join(keys + ["bucket"])
    bexpr = bucket_sql.format(ts=ts_col)
    tb = f", {tiebreak_col}" if tiebreak_col else ""
    tbd = f", {tiebreak_col} DESC" if tiebreak_col else ""
    vs = (f"CAST(sum(CAST(round(__v * 100.0, 0) AS BIGINT)) AS DOUBLE)"
          f" / 100.0" if cents else "sum(__v)")
    return f"""
WITH __b AS (
  SELECT {gsel} {bexpr} AS bucket, {ts_col} AS __ts{tb},
         CAST({val_col} AS DOUBLE) AS __v
  FROM {from_sql}
  WHERE {ts_col} IS NOT NULL AND {val_col} IS NOT NULL
), __r AS (
  SELECT *,
         row_number() OVER (PARTITION BY {gby}
                            ORDER BY __ts{tb}) AS __ra,
         row_number() OVER (PARTITION BY {gby}
                            ORDER BY __ts DESC{tbd}) AS __rd
  FROM __b
)
SELECT {gsel} bucket,
       max(CASE WHEN __ra = 1 THEN __v END) AS open,
       max(__v) AS high,
       min(__v) AS low,
       max(CASE WHEN __rd = 1 THEN __v END) AS close,
       count(*)::BIGINT AS n,
       {vs} AS val_sum
FROM __r
GROUP BY {gby}
"""


def holt_forecast(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 6,
) -> DataFrame:
    """Holt's linear-trend (double exponential smoothing) forecast over
    a bucketed series — the standard next step up from
    :func:`forecast_seasonal_naive` when the series trends but has no
    strong season: level and trend are smoothed jointly,
    ŷ(T+h) = l_T + h·b_T (Holt 1957 / Hyndman fpp formulation):

        l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    with the textbook init l_1 = y_1, b_1 = y_2 − y_1 (b_1 = 0 for a
    single-point series). NULL values are dropped first; keys with no
    non-NULL points are absent.

    Returns ``(key, bucket, yhat, h)`` — ``horizon`` rows per key,
    ``bucket`` continuing the input indexing.

    Determinism / oracle parity: the recursion is inherently
    sequential per key, so it runs as ONE fixed-order aggregate fold
    over the key's sorted value array (JVM-side ``aggregate`` with a
    (l, b) struct accumulator — the :func:`ewma` pattern with joint
    state). Spark and DuckDB fold the identical expression tree over
    the identical order, so results are bit-identical — no closed
    form, no libm ``pow``. ``+ 0.0`` canonicalizes −0.0 in both.

    Scale shape: one combine-unfriendly but SKINNY per-key
    collect_list (the per-key series must meet in one place — that is
    the algorithm, not an implementation choice; state per key is the
    series itself, bounded by buckets-per-key, not raw rows when fed
    from :func:`resample`/rollups), then a parameter-sized explode.
    A million independent keys parallelize on the key shuffle.

    CONTRACT: (key, bucket) must be unique (resample output is) —
    duplicate buckets would make the sort order engine-dependent.
    """
    a = float(alpha)
    bb = float(beta)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    if not 0.0 <= bb <= 1.0:
        raise ValueError(f"beta must be in [0, 1]: {beta}")
    horizon = int(horizon)
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    oma, omb = 1.0 - a, 1.0 - bb
    b = F.col(bucket_col)
    v = F.col(value_col).cast("double")
    g = (
        df.filter(v.isNotNull())
        .groupBy(key_col)
        .agg(
            F.max(b).alias("__last"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(b.alias("b"), v.alias("v")))
                ),
                lambda s: s["v"],
            ).alias("__xs"),
        )
    )
    n = F.size("__xs")
    x1 = F.element_at("__xs", 1)
    x2 = F.element_at("__xs", 2)
    init = F.when(
        n >= 2,
        F.struct(x1.alias("l"), (x2 - x1).alias("b")),
    ).otherwise(F.struct(x1.alias("l"), F.lit(0.0).alias("b")))

    def _step(acc, x):
        lnew = F.lit(a) * x + F.lit(oma) * (acc["l"] + acc["b"])
        return F.struct(
            lnew.alias("l"),
            (F.lit(bb) * (lnew - acc["l"]) + F.lit(omb) * acc["b"]).alias("b"),
        )

    st = F.aggregate(
        F.slice("__xs", 2, F.greatest(n - 1, F.lit(0))), init, _step
    )
    out = g.select(key_col, "__last", st.alias("__st")).select(
        key_col,
        "__last",
        "__st",
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
    )
    return out.select(
        F.col(key_col),
        (F.col("__last") + F.col("h")).alias(bucket_col),
        (
            F.col("__st")["l"]
            + F.col("h").cast("double") * F.col("__st")["b"]
            + F.lit(0.0)
        ).alias("yhat"),
        F.col("h"),
    )


def holt_forecast_sql(
    series_sql: str,
    key: str,
    bucket: str,
    value: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 6,
) -> str:
    """DuckDB mirror of :func:`holt_forecast` — the smoothing
    recursion as a RECURSIVE CTE (one textbook (l, b) step per
    iteration, the series array carried along each key's row),
    identical expression tree and fold order to the Spark aggregate
    fold, all float literals CAST to DOUBLE (a bare decimal literal
    is DECIMAL in DuckDB and would change the arithmetic).

    Deliberately NOT ``list_reduce`` with a struct accumulator:
    DuckDB (v1.0.0) evaluates ``struct_pack`` fields in the reduce
    lambda IN PLACE — a later field referencing ``acc.l`` sees the
    value just written by an earlier field, not the previous
    accumulator — so any coupled two-field recursion silently
    corrupts (verified; the recursive CTE has no such aliasing)."""
    a, bb = float(alpha), float(beta)
    oma, omb = 1.0 - a, 1.0 - bb
    A = f"CAST({a!r} AS DOUBLE)"
    OMA = f"CAST({oma!r} AS DOUBLE)"
    B = f"CAST({bb!r} AS DOUBLE)"
    OMB = f"CAST({omb!r} AS DOUBLE)"
    lnew = f"{A} * __xs[t + 1] + {OMA} * (l + b)"
    return f"""
WITH RECURSIVE __s AS (
  SELECT {key} AS __k, {bucket} AS __b, CAST({value} AS DOUBLE) AS __v
  FROM ({series_sql}) WHERE {value} IS NOT NULL),
__g AS (
  SELECT __k, max(__b) AS __last,
         list_transform(
           list_sort(list(struct_pack(b := __b, v := __v))),
           s -> s.v) AS __xs
  FROM __s GROUP BY 1
),
__r AS (
  SELECT __k, __last, __xs, length(__xs) AS n, 1 AS t,
         __xs[1] AS l,
         CASE WHEN length(__xs) >= 2 THEN __xs[2] - __xs[1]
              ELSE 0.0::DOUBLE END AS b
  FROM __g
  UNION ALL
  SELECT __k, __last, __xs, n, t + 1,
         {lnew} AS l,
         {B} * (({lnew}) - l) + {OMB} * b AS b
  FROM __r WHERE t < n
)
SELECT __k AS {key}, __last + h AS {bucket},
       (l + CAST(h AS DOUBLE) * b) + 0.0::DOUBLE AS yhat, h
FROM (SELECT * FROM __r WHERE t = n),
     (SELECT unnest(range(1, {int(horizon)} + 1)) AS h)
"""


def holt_winters_forecast(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 7,
) -> DataFrame:
    """Holt–Winters ADDITIVE seasonal forecast (triple exponential
    smoothing, Winters 1960 / Hyndman fpp formulation) — the step up
    from :func:`holt_forecast` when the series both trends AND
    repeats with period m:

        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
        s_t = γ(y_t − l_{t−1} − b_{t−1}) + (1−γ) s_{t−m}
        ŷ(T+h) = l_T + h·b_T + s_{T+h−m⌈h/m⌉}

    Textbook init over the first two seasons: l_m = mean(y_1..y_m),
    b_m = (mean(y_{m+1}..y_{2m}) − l_m)/m, s_i = y_i − l_m — so keys
    with fewer than 2·``period`` points are ABSENT from the output
    (no defensible seasonal state; feed :func:`resample` output and
    check coverage upstream). Buckets must be consecutive integers
    per key (the :func:`holt_forecast` contract — season position is
    bucket mod m).

    Returns ``(key, bucket, yhat, h)``, ``horizon`` rows per key.

    Determinism / oracle parity: the recursion folds the identical
    expression tree over the identical sorted order in both engines
    (Spark ``aggregate`` with a (l, b, seasonal-array) struct
    accumulator; DuckDB a RECURSIVE CTE — never ``list_reduce`` with
    a struct accumulator, whose in-place field aliasing corrupts
    coupled recursions, the :func:`holt_forecast_sql` lesson). The
    init means fold the season slices in index order, never an
    engine SUM.

    Scale shape: identical to :func:`holt_forecast` — one skinny
    per-key collect (bounded by buckets-per-key), a parameter-sized
    explode; a million independent keys parallelize on the key
    shuffle. CONTRACT: (key, bucket) unique.
    """
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2: {period}")
    a, bb, gg = float(alpha), float(beta), float(gamma)
    for nm, vv in (("alpha", a), ("beta", bb), ("gamma", gg)):
        if not 0.0 <= vv <= 1.0:
            raise ValueError(f"{nm} must be in [0, 1]: {vv}")
    oma, omb, omg = 1.0 - a, 1.0 - bb, 1.0 - gg
    b = F.col(bucket_col).cast("long")
    v = F.col(value_col).cast("double")
    g = (
        df.filter(v.isNotNull())
        .groupBy(F.col(key_col))
        .agg(
            F.max(b).alias("__last"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(b.alias("b"), v.alias("v")))
                ),
                lambda s: s["v"],
            ).alias("__xs"),
        )
        .filter(F.size("__xs") >= 2 * m)
    )
    n = F.size("__xs")

    def _ordered_mean(arr):
        return F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x
        ) / F.lit(float(m))

    mean1 = _ordered_mean(F.slice("__xs", 1, m))
    mean2 = _ordered_mean(F.slice("__xs", m + 1, m))
    init = F.struct(
        mean1.alias("l"),
        ((mean2 - mean1) / F.lit(float(m))).alias("b"),
        F.transform(
            F.slice("__xs", 1, m), lambda x: x - mean1
        ).alias("s"),
    )

    def _step(acc, x):
        shead = F.element_at(acc["s"], 1)
        lnew = (F.lit(a) * (x - shead)
                + F.lit(oma) * (acc["l"] + acc["b"]))
        bnew = F.lit(bb) * (lnew - acc["l"]) + F.lit(omb) * acc["b"]
        snew = (F.lit(gg) * (x - acc["l"] - acc["b"])
                + F.lit(omg) * shead)
        return F.struct(
            lnew.alias("l"),
            bnew.alias("b"),
            F.concat(
                F.slice(acc["s"], 2, m - 1), F.array(snew)
            ).alias("s"),
        )

    st = F.aggregate(
        F.slice("__xs", m + 1, F.greatest(n - m, F.lit(0))), init, _step
    )
    out = g.select(key_col, "__last", st.alias("__st")).select(
        key_col,
        "__last",
        "__st",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
    )
    season = F.element_at(
        F.col("__st")["s"], ((F.col("h") - 1) % m + 1).cast("int"))
    return out.select(
        F.col(key_col),
        (F.col("__last") + F.col("h")).alias(bucket_col),
        (
            F.col("__st")["l"]
            + F.col("h").cast("double") * F.col("__st")["b"]
            + season
            + F.lit(0.0)
        ).alias("yhat"),
        F.col("h"),
    )


def holt_winters_sql(
    series_sql: str,
    key: str,
    bucket: str,
    value: str,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 7,
) -> str:
    """DuckDB mirror of :func:`holt_winters_forecast` — the smoothing
    recursion as a RECURSIVE CTE carrying (l, b, seasonal list),
    identical expression tree and fold order; init means fold the
    season slices in index order via scalar list_reduce (scalar
    accumulators have no struct-aliasing hazard)."""
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2: {period}")
    a, bb, gg = float(alpha), float(beta), float(gamma)
    oma, omb, omg = 1.0 - a, 1.0 - bb, 1.0 - gg
    A = f"CAST({a!r} AS DOUBLE)"
    OMA = f"CAST({oma!r} AS DOUBLE)"
    B = f"CAST({bb!r} AS DOUBLE)"
    OMB = f"CAST({omb!r} AS DOUBLE)"
    G = f"CAST({gg!r} AS DOUBLE)"
    OMG = f"CAST({omg!r} AS DOUBLE)"
    M = f"CAST({float(m)!r} AS DOUBLE)"
    mean1 = (f"list_reduce(list_prepend(0.0::DOUBLE, __xs[1:{m}]), "
             f"(acc, x) -> acc + x) / {M}")
    mean2 = (f"list_reduce(list_prepend(0.0::DOUBLE, "
             f"__xs[{m + 1}:{2 * m}]), (acc, x) -> acc + x) / {M}")
    lnew = f"{A} * (__xs[t + 1] - s[1]) + {OMA} * (l + b)"
    return f"""
WITH RECURSIVE __sr AS (
  SELECT {key} AS __k, {bucket} AS __b, CAST({value} AS DOUBLE) AS __v
  FROM ({series_sql}) WHERE {value} IS NOT NULL),
__g AS (
  SELECT __k, max(__b) AS __last,
         list_transform(
           list_sort(list(struct_pack(b := __b, v := __v))),
           s -> s.v) AS __xs
  FROM __sr GROUP BY 1
  HAVING count(*) >= {2 * m}
),
__r AS (
  SELECT __k, __last, __xs, length(__xs) AS n, {m} AS t,
         {mean1} AS l,
         ({mean2} - ({mean1})) / {M} AS b,
         list_transform(__xs[1:{m}], x -> x - ({mean1})) AS s
  FROM __g
  UNION ALL
  SELECT __k, __last, __xs, n, t + 1,
         {lnew} AS l,
         {B} * (({lnew}) - l) + {OMB} * b AS b,
         list_append(s[2:],
           {G} * (__xs[t + 1] - l - b) + {OMG} * s[1]) AS s
  FROM __r WHERE t < n
)
SELECT __k AS {key}, __last + h AS {bucket},
       (l + CAST(h AS DOUBLE) * b
        + s[CAST((h - 1) % {m} + 1 AS INT)]) + 0.0::DOUBLE AS yhat, h
FROM (SELECT * FROM __r WHERE t = n),
     (SELECT unnest(range(1, {int(horizon)} + 1)) AS h)
"""


def theil_sen(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    round_to: int = 6,
    max_points: int = 2000,
) -> DataFrame:
    """Per-key Theil–Sen robust trend over a bucketed series: slope =
    MEDIAN of all pairwise slopes (y_j − y_i)/(b_j − b_i), intercept =
    median of (y − slope·b) — the 29%-breakdown estimator that one
    spiked bucket cannot bend, where :func:`linreg_series`' OLS
    follows the outlier. Returns ``(key, n_points, n_pairs, slope,
    intercept)``; keys with < 2 points have NULL slope.

    Determinism: on count series each pairwise slope is a division of
    exact integers (bit-identical across engines); medians come from
    sorted-array element arithmetic (fixed tree, even-length average
    of the two middles), not an engine median() whose interpolation
    convention could differ.

    Scale shape: pairs explode per key — O(n²/2) per series — so the
    per-key series length is the contract (``max_points``, enforced
    with a distributed raise, keeps a runaway key from exploding a
    stage; resample/rollup first for long series). A million
    independent short series parallelize on the key shuffle.
    """
    b = F.col(bucket_col).cast("double")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(key_col).alias("__k"), b.alias("__b"), v.alias("__v"))
    npts = base.groupBy("__k").agg(F.count(F.lit(1)).alias("n_points"))
    guard = F.when(
        F.col("n_points") <= int(max_points), F.col("n_points")
    ).otherwise(F.raise_error(F.lit(
        f"theil_sen: a key has more than {int(max_points)} points — "
        "resample/rollup the series first")).cast("long"))
    npts = npts.select("__k", guard.alias("n_points"))
    a = base.select("__k", F.col("__b").alias("__b1"), F.col("__v").alias("__v1"))
    c = base.select("__k", F.col("__b").alias("__b2"), F.col("__v").alias("__v2"))
    pairs = a.join(c, "__k").filter(F.col("__b1") < F.col("__b2")).select(
        "__k",
        ((F.col("__v2") - F.col("__v1"))
         / (F.col("__b2") - F.col("__b1"))).alias("__s"),
    )

    def _median(arr):
        n = F.size(arr)
        mid = F.element_at(arr, ((n + 1) / 2).cast("int"))
        mid2 = F.element_at(arr, (n / 2 + 1).cast("int"))
        return F.when(n % 2 == 1, mid).otherwise(
            (F.element_at(arr, (n / 2).cast("int")) + mid2) / 2.0)

    slopes = pairs.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.array_sort(F.collect_list("__s")).alias("__sl"),
    ).select("__k", "n_pairs", _median(F.col("__sl")).alias("__slope"))
    resid = base.join(slopes, "__k").groupBy("__k").agg(
        F.array_sort(
            F.collect_list(F.col("__v") - F.col("__slope") * F.col("__b"))
        ).alias("__r"),
    ).select("__k", _median(F.col("__r")).alias("__icept"))
    return (
        npts.join(slopes, "__k", "left").join(resid, "__k", "left")
        .select(
            F.col("__k").alias(key_col),
            "n_points",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            F.round(F.col("__slope"), int(round_to)).alias("slope"),
            F.round(F.col("__icept"), int(round_to)).alias("intercept"),
        )
    )


def theil_sen_sql(
    series_sql: str,
    key: str,
    bucket: str,
    value: str,
    round_to: int = 6,
    max_points: int = 2000,
) -> str:
    """DuckDB mirror of :func:`theil_sen` (same pair set and
    sorted-array median arithmetic). Mirrors the Spark side's
    ``max_points`` contract too — an oversized key raises via
    ``error()`` instead of silently computing the O(n²) pair
    explosion, so oracle and engine diverge on NO input class."""
    med = (
        "CASE WHEN length({a}) % 2 = 1 "
        "THEN {a}[CAST((length({a}) + 1) / 2 AS INT)] "
        "ELSE ({a}[CAST(length({a}) / 2 AS INT)] "
        "      + {a}[CAST(length({a}) / 2 + 1 AS INT)]) / 2.0::DOUBLE END"
    )
    ms = med.format(a="__sl")
    mr = med.format(a="__r")
    return f"""
WITH __s AS (
  SELECT {key} AS __k, CAST({bucket} AS DOUBLE) AS __b,
         CAST({value} AS DOUBLE) AS __v
  FROM ({series_sql}) WHERE {value} IS NOT NULL
),
__n AS (
  SELECT __k,
         CASE WHEN count(*) > {int(max_points)}
              THEN CAST(error('theil_sen: a key has more than '
                              || '{int(max_points)} points — '
                              || 'resample/rollup the series first')
                        AS BIGINT)
              ELSE count(*)::BIGINT END AS n_points
  FROM __s GROUP BY 1),
__sl AS (
  SELECT __k, count(*)::BIGINT AS n_pairs,
         list_sort(list((__v2 - __v1) / (__b2 - __b1))) AS __sl
  FROM (
    SELECT a.__k, a.__b AS __b1, a.__v AS __v1, c.__b AS __b2, c.__v AS __v2
    FROM __s a JOIN __s c ON a.__k = c.__k AND a.__b < c.__b
  ) GROUP BY 1
),
__m AS (SELECT __k, n_pairs, {ms} AS __slope FROM __sl),
__r AS (
  SELECT s.__k,
         list_sort(list(s.__v - m.__slope * s.__b)) AS __r
  FROM __s s JOIN __m m ON s.__k = m.__k GROUP BY 1
)
SELECT n.__k AS {key}, n.n_points,
       coalesce(m.n_pairs, 0) AS n_pairs,
       round(m.__slope, {int(round_to)}) AS slope,
       round({mr}, {int(round_to)}) AS intercept
FROM __n n
LEFT JOIN __m m ON n.__k = m.__k
LEFT JOIN __r r ON n.__k = r.__k
"""
