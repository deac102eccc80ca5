"""Event/product analytics over event-log DataFrames: ordered funnels,
cohort retention, and volume-anomaly detection.

The reference engine has no event-analytics operators; these are the
standard session/event-log questions (did users progress view→click→
purchase, how many week-0 users are still active in week N, which hours
saw anomalous traffic) every large-scale telemetry or training-data
pipeline asks of its event tables. All three are pure DataFrame
programs with exact SQL mirrors.

Scale design (the 100 TB shapes):

- :func:`funnel` is k-1 chained min-aggregate joins on the user key —
  NOT a per-user ``collect_list`` fold, so no user's event history is
  ever materialized as one array (a bot with 10M events costs the same
  as anyone else: each step is a map-side-combinable ``min``). Every
  join is a skinny (user, timestamp) equi-join on the same key, so AQE
  reuses the exchange.
- :func:`cohort_retention` is two shuffles total: one groupBy(user) for
  first-touch, one distinct-count on (cohort, offset) — both skinny.
- :func:`volume_anomaly` aggregates to (group, bucket) counts first
  (combine-friendly), then joins per-group moments back via broadcast
  (#groups rows), so the big table is scanned once with zero extra
  wide shuffles.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    window_seconds: Optional[int] = None,
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached each step of
    ``steps`` in order (step i's event at-or-after their step i-1
    time, and — when ``window_seconds`` is set — within that many
    seconds of their FIRST step).

    Returns one row per step: ``(step_idx, step, users)`` with
    ``step_idx`` 1-based; ``users`` is non-increasing by construction.

    Semantics: a user's step-1 time is their earliest step-1 event;
    step i's time is their earliest step-i event at-or-after (``>=``)
    their step-(i-1) time. ``>=`` (not ``>``) so distinct step types
    logged with identical timestamps still count as ordered.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    u, t = F.col(user_col), F.col(ts_col)
    reached = (
        df.filter(F.col(step_col) == steps[0])
        .groupBy(u.alias("__u"))
        .agg(F.min(t).alias("__t1"))
    )
    # one frame per step; counts are taken from ONE union'd aggregate at
    # the end so the whole funnel is a single Spark action
    per_step = [reached.select("__u")]
    prev = reached.withColumn("__tprev", F.col("__t1"))
    for step in steps[1:]:
        ev = df.filter(F.col(step_col) == step).select(
            u.alias("__u"), t.alias("__ts")
        )
        j = ev.join(prev, "__u").filter(F.col("__ts") >= F.col("__tprev"))
        if window_seconds is not None:
            j = j.filter(
                F.col("__ts")
                <= F.col("__t1") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
            )
        prev = j.groupBy("__u").agg(
            F.min("__ts").alias("__tprev"), F.min("__t1").alias("__t1")
        )
        per_step.append(prev.select("__u"))
    out = None
    for i, (name, frame) in enumerate(zip(steps, per_step), start=1):
        row = frame.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("step_idx"), F.lit(name).alias("step"), "users"
        )
        out = row if out is None else out.unionByName(row)
    return out


def funnel_sql(
    from_sql: str,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    window_seconds: Optional[int] = None,
) -> str:
    """DuckDB SQL mirror of :func:`funnel` (same chained min-aggregate
    joins, same ``>=`` ordering and first-step window semantics)."""
    steps = list(steps)
    q = lambda s: "'" + s.replace("'", "''") + "'"  # noqa: E731
    parts = [
        f"""__s1 AS (
  SELECT {user_col} AS __u, min({ts_col}) AS __t, min({ts_col}) AS __t1
  FROM {from_sql} WHERE {step_col} = {q(steps[0])} GROUP BY 1
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        win = (
            f" AND e.{ts_col} <= p.__t1 + INTERVAL {int(window_seconds)} SECOND"
            if window_seconds is not None
            else ""
        )
        parts.append(
            f"""__s{i} AS (
  SELECT e.{user_col} AS __u, min(e.{ts_col}) AS __t, min(p.__t1) AS __t1
  FROM {from_sql} e
  JOIN __s{i - 1} p ON e.{user_col} = p.__u AND e.{ts_col} >= p.__t{win}
  WHERE e.{step_col} = {q(step)}
  GROUP BY 1
)"""
        )
    selects = [
        f"SELECT {i} AS step_idx, {q(s)} AS step, count(*) AS users FROM __s{i}"
        for i, s in enumerate(steps, start=1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by the period of their
    first event (the cohort), counted distinct in each later period.

    Returns ``(cohort, period_offset, active_users)`` where ``cohort``
    is the truncated first-touch date and ``period_offset`` counts
    periods since the cohort period (0 = the cohort period itself).

    Two skinny shuffles: groupBy(user) for first-touch, then a
    distinct-count keyed on (cohort, offset). The join back to events
    is on the user key — broadcastable whenever the user dimension
    fits, hash otherwise.
    """
    if period not in ("week", "month", "day"):
        raise ValueError("period must be week | month | day")
    u, t = F.col(user_col), F.col(ts_col)
    first = df.groupBy(u.alias("__u")).agg(
        F.date_trunc(period, F.min(t)).cast("date").alias("cohort")
    )
    ev = df.select(
        u.alias("__u"), F.date_trunc(period, t).cast("date").alias("__p")
    )
    j = ev.join(first, "__u")
    if period == "week":
        off = (F.datediff("__p", "cohort") / 7).cast("long")
    elif period == "day":
        off = F.datediff("__p", "cohort").cast("long")
    else:  # month
        off = F.months_between("__p", "cohort").cast("long")
    return (
        j.select("__u", "cohort", off.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct("__u").alias("active_users"))
    )


def cohort_retention_sql(
    from_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB SQL mirror of :func:`cohort_retention`."""
    if period == "week":
        off = "(date_diff('day', f.cohort, date_trunc('week', e.{t})::DATE) // 7)"
    elif period == "day":
        off = "date_diff('day', f.cohort, date_trunc('day', e.{t})::DATE)"
    else:
        off = "date_diff('month', f.cohort, date_trunc('month', e.{t})::DATE)"
    off = off.format(t=ts_col)
    return f"""
WITH __first AS (
  SELECT {user_col} AS __u,
         date_trunc('{period}', min({ts_col}))::DATE AS cohort
  FROM {from_sql} GROUP BY 1
)
SELECT f.cohort, {off}::BIGINT AS period_offset,
       count(DISTINCT e.{user_col}) AS active_users
FROM {from_sql} e
JOIN __first f ON e.{user_col} = f.__u
GROUP BY 1, 2
"""


def _bucket_counts(
    df: DataFrame, group_col: str, ts_col: str, bucket: str
) -> DataFrame:
    return df.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).alias("n"))


_SEASONS = {"hour_of_day": F.hour, "day_of_week": F.dayofweek}


def _season_col(seasonality: Optional[str]):
    if seasonality is None:
        return None
    if seasonality not in _SEASONS:
        raise ValueError(
            f"seasonality must be one of {sorted(_SEASONS)} or None"
        )
    return _SEASONS[seasonality](F.col("bucket_ts"))


def _count_moments(
    counts: DataFrame, seasonality: Optional[str] = None
) -> DataFrame:
    season = _season_col(seasonality)
    if season is None:
        return counts.groupBy("grp").agg(
            F.avg("n").alias("__mu"), F.stddev_samp("n").alias("__sd")
        )
    return counts.groupBy("grp", season.alias("__season")).agg(
        F.avg("n").alias("__mu"), F.stddev_samp("n").alias("__sd")
    )


def volume_baseline(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
) -> DataFrame:
    """Per-group volume baseline: mean (``__mu``) and sample stddev
    (``__sd``) of the (group, time-bucket) event counts — #groups rows.
    The offline-fitted input to ``streaming.ops.
    streaming_volume_anomaly`` (train the baseline on history in
    batch, score live windows against it); :func:`volume_anomaly`
    computes the same moments inline for the self-baselined batch
    case."""
    return _count_moments(_bucket_counts(df, group_col, ts_col, bucket))


def volume_anomaly(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    z_threshold: float = 2.0,
    round_to: int = 6,
    seasonality: Optional[str] = None,
) -> DataFrame:
    """Event-volume anomaly detection: bucket the stream into
    (group, time-bucket) counts, compute each group's count mean and
    sample stddev across its buckets, and flag buckets whose z-score
    exceeds ``z_threshold`` in absolute value.

    ``seasonality='hour_of_day'`` / ``'day_of_week'`` computes the
    moments PER SEASON SLOT (each bucket compared to other buckets at
    the same hour / weekday) — real traffic is periodic, and a global
    mean flags every rush hour; the seasonal baseline flags departures
    from the pattern instead.

    Returns ``(group, bucket_ts, n, z)`` for flagged buckets only,
    ``z`` rounded to ``round_to`` (float addition order across
    partitions is not deterministic at full precision; the rounding
    sits far above that noise — same policy as ``graph.pagerank``).

    Scale: the raw table collapses to (group, bucket) counts in one
    combine-friendly shuffle; the moment table is #groups (× season
    slots) rows (broadcast); groups with zero/NULL stddev (constant or
    single bucket) produce no flags rather than dividing by zero.
    """
    counts = _bucket_counts(df, group_col, ts_col, bucket)
    moments = _count_moments(counts, seasonality)
    season = _season_col(seasonality)
    if season is not None:
        counts = counts.withColumn("__season", season)
    keys = ["grp"] + (["__season"] if season is not None else [])
    z = (F.col("n") - F.col("__mu")) / F.col("__sd")
    return (
        counts.join(F.broadcast(moments), keys)
        .filter(
            F.col("__sd").isNotNull()
            & (F.col("__sd") > 0)
            & (F.abs(z) > float(z_threshold))
        )
        .select(
            F.col("grp").alias(group_col),
            "bucket_ts",
            "n",
            F.round(z, round_to).alias("z"),
        )
    )


def volume_anomaly_sql(
    from_sql: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    z_threshold: float = 2.0,
    round_to: int = 6,
    seasonality: Optional[str] = None,
) -> str:
    """DuckDB SQL mirror of :func:`volume_anomaly` (``dayofweek`` is
    Sunday=1..Saturday=7 in Spark vs Sunday=0 in DuckDB — the mirror
    shifts to match)."""
    if seasonality == "hour_of_day":
        season = "CAST(hour(bucket_ts) AS INT)"
    elif seasonality == "day_of_week":
        season = "CAST(dayofweek(bucket_ts) + 1 AS INT)"
    elif seasonality is None:
        season = None
    else:
        raise ValueError("seasonality must be hour_of_day|day_of_week|None")
    skey = f", {season} AS season" if season else ""
    mkey = ", season" if season else ""
    jkey = " AND c.season = m.season" if season else ""
    return f"""
WITH __c AS (
  SELECT *{skey} FROM (
    SELECT {group_col} AS grp, date_trunc('{bucket}', {ts_col}) AS bucket_ts,
           count(*) AS n
    FROM {from_sql} GROUP BY 1, 2
  )
), __m AS (
  SELECT grp{mkey}, avg(n) AS mu, stddev_samp(n) AS sd
  FROM __c GROUP BY grp{mkey}
)
SELECT c.grp AS {group_col}, c.bucket_ts, c.n,
       round((c.n - m.mu) / m.sd, {int(round_to)}) AS z
FROM __c c JOIN __m m ON c.grp = m.grp{jkey}
WHERE m.sd IS NOT NULL AND m.sd > 0
  AND abs((c.n - m.mu) / m.sd) > {float(z_threshold)!r}
"""


def attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    model: str = "linear",
    lookback_seconds: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch conversion attribution: each conversion event's
    value is credited to the user's touch events in the
    ``lookback_seconds`` window ending at the conversion —
    ``model='linear'`` splits it equally, ``'first'``/``'last'`` give
    it all to the earliest/latest touch (timestamp ties broken by
    ``id_col`` so the credit assignment is a pure function of the
    data). Returns per-channel totals: ``(channel, n_touches,
    credited_value)``.

    Semantics: a touch qualifies if ``conv_ts - lookback < touch_ts <=
    conv_ts``. Conversions with no qualifying touch contribute
    nothing (they'd be the "direct/unattributed" bucket — filter the
    input differently to report them).

    Scale: ONE user-keyed equi-join (conversions ⋈ touches) with the
    window range as a join-level predicate — co-partitioned on the
    user key, AQE splits hot users; per-conversion touch counts /
    first / last come from a window over (user, conv id), never a
    collected array. Credits are summed in fixed-point 1e-4 units
    (exact long addition) so the total is independent of partitioning
    and engine — the float-sum-order lesson from the money aggregates.
    """
    if model not in ("linear", "first", "last"):
        raise ValueError("model must be linear | first | last")
    from pyspark.sql import Window

    conv = df.filter(F.col(step_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        F.col(ts_col).alias("__cts"),
        F.col(value_col).alias("__val"),
    )
    touch = df.filter(F.col(step_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__tid"),
        F.col(ts_col).alias("__tts"),
        F.col(step_col).alias("channel"),
    )
    j = conv.join(touch, "__u").filter(
        (F.col("__tts") <= F.col("__cts"))
        & (
            F.col("__tts")
            > F.col("__cts") - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS")
        )
    )
    per_conv = Window.partitionBy("__u", "__cid")
    if model == "linear":
        credit = F.col("__val") / F.count(F.lit(1)).over(per_conv)
        credited = j.withColumn("__credit", credit)
    else:
        asc = [F.col("__tts").asc(), F.col("__tid").asc()]
        desc = [F.col("__tts").desc(), F.col("__tid").desc()]
        w = per_conv.orderBy(*(asc if model == "first" else desc))
        credited = (
            j.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .withColumn("__credit", F.col("__val"))
        )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        (
            F.sum(F.round(F.col("__credit") * 10000.0, 0).cast("long"))
            / 10000.0
        ).alias("credited_value"),
    )


def attribution_sql(
    from_sql: str,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    model: str = "linear",
    lookback_seconds: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> str:
    """DuckDB SQL mirror of :func:`attribution` (same join window,
    tie-breaks, and fixed-point credit summation)."""
    touches = ", ".join("'" + t.replace("'", "''") + "'" for t in touch_types)
    join = f"""
  SELECT c.{user_col} AS u, c.{id_col} AS cid, c.{value_col} AS val,
         t.{id_col} AS tid, t.{ts_col} AS tts, t.{step_col} AS channel
  FROM {from_sql} c
  JOIN {from_sql} t
    ON t.{user_col} = c.{user_col}
   AND t.{ts_col} <= c.{ts_col}
   AND t.{ts_col} > c.{ts_col} - INTERVAL {int(lookback_seconds)} SECOND
   AND t.{step_col} IN ({touches})
  WHERE c.{step_col} = '{conversion_type}'"""
    if model == "linear":
        body = f"""
WITH __j AS ({join}),
__c AS (
  SELECT channel, val / count(*) OVER (PARTITION BY u, cid) AS credit
  FROM __j
)"""
    else:
        direction = "ASC" if model == "first" else "DESC"
        body = f"""
WITH __j AS ({join}),
__c AS (
  SELECT channel, val AS credit FROM (
    SELECT channel, val,
           row_number() OVER (
             PARTITION BY u, cid
             ORDER BY tts {direction}, tid {direction}
           ) AS rn
    FROM __j
  ) WHERE rn = 1
)"""
    return f"""{body}
SELECT channel, count(*) AS n_touches,
       sum(CAST(round(credit * 10000.0, 0) AS BIGINT)) / 10000.0
         AS credited_value
FROM __c GROUP BY channel
"""


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: Optional[str] = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: for every observed (from_step, to_step) pair of
    CONSECUTIVE events (ordered by timestamp, ties broken by
    ``id_col``), the transition count and row-normalized probability
    ``p = n / Σ n(from_step, ·)``. The next-event model behind path
    analysis, drop-off diagnosis, and sequence featurization.

    Returns ``(from_step, to_step, n, p)``.

    Scale: one window lead() pass partitioned on the user key (each
    user's history sorts within its partition — no global sort), then
    a skinny (from, to) count whose totals join back on the tiny
    from-step dimension. ``p`` is an exact long/long division rounded
    to ``round_to``.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(F.col(user_col)).orderBy(*order)
    pairs = (
        df.select(
            F.col(step_col).alias("from_step"),
            F.lead(F.col(step_col)).over(w).alias("to_step"),
        )
        .filter(F.col("to_step").isNotNull())
    )
    counts = pairs.groupBy("from_step", "to_step").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_step").agg(F.sum("n").alias("__tot"))
    return counts.join(totals, "from_step").select(
        "from_step",
        "to_step",
        "n",
        F.round(F.col("n") / F.col("__tot"), round_to).alias("p"),
    )


def transition_matrix_sql(
    from_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: Optional[str] = "event_id",
    round_to: int = 6,
) -> str:
    """DuckDB SQL mirror of :func:`transition_matrix`."""
    order = f"{ts_col} ASC" + (f", {id_col} ASC" if id_col else "")
    return f"""
WITH __p AS (
  SELECT {step_col} AS from_step,
         lead({step_col}) OVER (
           PARTITION BY {user_col} ORDER BY {order}
         ) AS to_step
  FROM {from_sql}
), __c AS (
  SELECT from_step, to_step, count(*) AS n
  FROM __p WHERE to_step IS NOT NULL GROUP BY 1, 2
), __t AS (
  SELECT from_step, sum(n) AS tot FROM __c GROUP BY 1
)
SELECT c.from_step, c.to_step, c.n, round(c.n / t.tot, {int(round_to)}) AS p
FROM __c c JOIN __t t USING (from_step)
"""


# ---------------------------------------------------------------------------
# Market-basket association rules (pairwise Apriori)


def basket_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Pairwise association rules with support / confidence / lift —
    the market-basket co-purchase screen (and, over (doc, token)
    pairs, a phrase-collocation miner).

    Returns one row per unordered frequent pair ``(item_a < item_b)``:
    ``n_ab`` (baskets containing both), ``support`` (n_ab / n
    baskets), ``conf_a_b`` / ``conf_b_a`` (directed confidences), and
    ``lift`` (support / (supp_a · supp_b)) — lift > 1 means the pair
    co-occurs more than independence predicts. Rows must pass
    ``min_support`` on the PAIR and ``min_confidence`` on at least one
    direction.

    Scale shape (the Apriori property does the pruning): items are
    filtered to frequent ones FIRST (one skinny (item) groupBy vs
    min_support·n), so the pair self-join on the basket key explodes
    only frequent items — per-basket fanout is m²/2 where m counts
    FREQUENT items in that basket, not all items. n_baskets and
    per-item counts ride along as broadcast-joined skinny frames; all
    ratios are fixed-tree double divisions of exact longs, so the
    DuckDB mirror (:func:`basket_rules_sql`) matches bit-for-bit. A
    pathological mega-basket still costs m² — cap with an upstream
    ``group_quota`` if the domain allows unbounded baskets.
    """
    if not (0.0 < float(min_support) <= 1.0):
        raise ValueError(f"min_support must be in (0, 1]: {min_support}")
    pairs_base = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it"))
        .distinct()
    )
    n_b = pairs_base.agg(
        F.countDistinct("__bk").alias("__n")
    )
    item_counts = pairs_base.groupBy("__it").agg(
        F.count(F.lit(1)).alias("__ni")
    )
    freq = (
        item_counts.crossJoin(F.broadcast(n_b))
        .filter(
            F.col("__ni").cast("double")
            >= F.lit(float(min_support)) * F.col("__n").cast("double")
        )
        .select("__it", "__ni")
    )
    fb = pairs_base.join(F.broadcast(freq), "__it").select("__bk", "__it")
    a = fb.select("__bk", F.col("__it").alias("item_a"))
    b = fb.select("__bk", F.col("__it").alias("item_b"))
    pair_counts = (
        a.join(b, "__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = freq.select(F.col("__it").alias("item_a"), F.col("__ni").alias("__na"))
    nb = freq.select(F.col("__it").alias("item_b"), F.col("__ni").alias("__nb"))
    out = (
        pair_counts.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_b))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    support = d("n_ab") / d("__n")
    conf_ab = d("n_ab") / d("__na")
    conf_ba = d("n_ab") / d("__nb")
    lift = (d("n_ab") * d("__n")) / (d("__na") * d("__nb"))
    return (
        out.filter(support >= F.lit(float(min_support)))
        .filter(
            (conf_ab >= F.lit(float(min_confidence)))
            | (conf_ba >= F.lit(float(min_confidence)))
        )
        .select(
            "item_a", "item_b", "n_ab",
            support.alias("support"),
            conf_ab.alias("conf_a_b"),
            conf_ba.alias("conf_b_a"),
            lift.alias("lift"),
        )
    )


def basket_rules_sql(
    from_sql: str,
    basket_expr: str,
    item_expr: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
) -> str:
    """DuckDB mirror of :func:`basket_rules` — identical frequent-item
    prefilter and fixed-tree double ratios."""
    ms = float(min_support)
    mc = float(min_confidence)
    return f"""
WITH __bi AS (
  SELECT DISTINCT {basket_expr} AS __bk, {item_expr} AS __it
  FROM ({from_sql})
  WHERE ({basket_expr}) IS NOT NULL AND ({item_expr}) IS NOT NULL
),
__n AS (SELECT count(DISTINCT __bk) AS __n FROM __bi),
__ic AS (SELECT __it, count(*) AS __ni FROM __bi GROUP BY 1),
__freq AS (
  SELECT __it, __ni FROM __ic, __n
  WHERE CAST(__ni AS DOUBLE) >= {ms!r}::DOUBLE * CAST(__n AS DOUBLE)
),
__fb AS (SELECT b.__bk, b.__it FROM __bi b JOIN __freq f USING (__it)),
__pc AS (
  SELECT a.__it AS item_a, b.__it AS item_b, count(*) AS n_ab
  FROM __fb a JOIN __fb b ON a.__bk = b.__bk AND a.__it < b.__it
  GROUP BY 1, 2
)
SELECT item_a, item_b, n_ab,
       CAST(n_ab AS DOUBLE) / CAST(__n AS DOUBLE) AS support,
       CAST(n_ab AS DOUBLE) / CAST(na.__ni AS DOUBLE) AS conf_a_b,
       CAST(n_ab AS DOUBLE) / CAST(nb.__ni AS DOUBLE) AS conf_b_a,
       (CAST(n_ab AS DOUBLE) * CAST(__n AS DOUBLE))
         / (CAST(na.__ni AS DOUBLE) * CAST(nb.__ni AS DOUBLE)) AS lift
FROM __pc
JOIN __freq na ON __pc.item_a = na.__it
JOIN __freq nb ON __pc.item_b = nb.__it
CROSS JOIN __n
WHERE CAST(n_ab AS DOUBLE) / CAST(__n AS DOUBLE) >= {ms!r}::DOUBLE
  AND (CAST(n_ab AS DOUBLE) / CAST(na.__ni AS DOUBLE) >= {mc!r}::DOUBLE
       OR CAST(n_ab AS DOUBLE) / CAST(nb.__ni AS DOUBLE) >= {mc!r}::DOUBLE)
"""


# ---------------------------------------------------------------------------
# Top-k user paths (sequence mining)


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: Optional[str] = "event_id",
    max_len: int = 5,
    k: int = 20,
) -> DataFrame:
    """Most common user journeys: each user's first ``max_len`` events
    (ordered by timestamp, ties broken by ``id_col``) joined into a
    ``'a>b>c'`` path string, counted across users, top ``k`` paths by
    user count (ties broken by path asc). The classic navigation /
    onboarding-flow mining query.

    Returns ``(path, n_users)``.

    Scale: a row_number window partitioned on the user key (each
    user's history sorts within its partition — no global sort)
    filters to at most ``max_len`` rows per user BEFORE any
    collection, so per-group state is parameter-bounded even for
    million-event power users; the path build is one combine-friendly
    groupBy(user) over those capped rows, and the final count is a
    skinny groupBy(path) + TakeOrderedAndProject (k rows to the
    driver).
    """
    from pyspark.sql import Window

    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    order = [F.col(ts_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(F.col(user_col)).orderBy(*order)
    capped = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_len))
    )
    paths = capped.groupBy(F.col(user_col)).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__rn"),
                                 F.col(step_col).alias("__s"))
                    )
                ),
                lambda x: x["__s"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(int(k))
    )


def top_paths_sql(
    from_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    id_col: Optional[str] = "event_id",
    max_len: int = 5,
    k: int = 20,
) -> str:
    """DuckDB mirror of :func:`top_paths` (same ordering, cap, and
    deterministic top-k tie-break)."""
    order = f"{ts_col} ASC" + (f", {id_col} ASC" if id_col else "")
    return f"""
WITH __r AS (
  SELECT {user_col} AS u, {step_col} AS s,
         row_number() OVER (PARTITION BY {user_col} ORDER BY {order}) AS rn
  FROM {from_sql}
), __p AS (
  SELECT u, string_agg(s, '>' ORDER BY rn) AS path
  FROM __r WHERE rn <= {int(max_len)} GROUP BY u
)
SELECT path, count(*) AS n_users
FROM __p GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {int(k)}
"""


def stickiness(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_to: int = 6,
) -> DataFrame:
    """DAU/MAU stickiness per calendar month — the standard engagement
    ratio (what fraction of the month's actives show up on an average
    day): ``stickiness = avg(DAU over the month's OBSERVED days) /
    MAU``. Returns ``(month, days_observed, mau, avg_dau,
    stickiness)`` — month as its first-day DATE; days with no events
    don't dilute the average (document the divisor; a calendar-day
    variant is ``avg_dau * days_observed / days_in_month``).

    Determinism: DAU/MAU are exact distinct counts, avg_dau is one
    exact-integer division, rounded per the float convention.

    Scale: two combine-friendly distinct aggregates ((day, user) →
    day counts → month average; (month, user) → MAU) joined on the
    month — shuffles carry distinct (bucket, user) pairs, not events.
    """
    day = F.date_trunc("day", F.col(ts_col))
    month = F.date_trunc("month", F.col(ts_col))
    base = df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    dau = (
        base.groupBy(month.alias("__m"), day.alias("__d"))
        .agg(F.countDistinct(user_col).alias("__dau"))
        .groupBy("__m")
        .agg(
            F.count(F.lit(1)).alias("days_observed"),
            F.sum("__dau").alias("__dau_sum"),
        )
    )
    mau = base.groupBy(month.alias("__m")).agg(
        F.countDistinct(user_col).alias("mau"))
    avg_dau = F.col("__dau_sum").cast("double") / F.col("days_observed").cast("double")
    return (
        dau.join(mau, "__m")
        .select(
            F.col("__m").cast("date").alias("month"),
            "days_observed",
            "mau",
            F.round(avg_dau, int(round_to)).alias("avg_dau"),
            F.round(avg_dau / F.col("mau").cast("double"), int(round_to))
            .alias("stickiness"),
        )
    )


def stickiness_sql(
    from_sql: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`stickiness` (same observed-days
    divisor and fixed division tree)."""
    return f"""
WITH __b AS (
  SELECT CAST(date_trunc('month', {ts_col}) AS DATE) AS __m,
         date_trunc('day', {ts_col}) AS __d, {user_col} AS __u
  FROM {from_sql}
  WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL
),
__dau AS (
  SELECT __m, count(*)::BIGINT AS days_observed,
         sum(__dau)::BIGINT AS __dau_sum
  FROM (SELECT __m, __d, count(DISTINCT __u) AS __dau
        FROM __b GROUP BY 1, 2)
  GROUP BY 1
),
__mau AS (
  SELECT __m, count(DISTINCT __u)::BIGINT AS mau FROM __b GROUP BY 1
)
SELECT d.__m AS month, d.days_observed, m.mau,
       round(CAST(d.__dau_sum AS DOUBLE) / CAST(d.days_observed AS DOUBLE),
             {int(round_to)}) AS avg_dau,
       round((CAST(d.__dau_sum AS DOUBLE) / CAST(d.days_observed AS DOUBLE))
             / CAST(m.mau AS DOUBLE), {int(round_to)}) AS stickiness
FROM __dau d JOIN __mau m ON d.__m = m.__m
"""


def km_survival(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    round_to: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival curve — the right-censoring-aware
    retention/churn estimator (the statistical upgrade of
    :func:`cohort_retention`, which treats still-active users as
    churned at the horizon): one subject per row with a ``duration``
    and an ``event`` flag (truthy = the event was observed, falsy =
    censored at that duration); at each distinct duration t,

        S(t) = Π_{u ≤ t} (1 − d_u / n_u)

    with d_u observed events at u and n_u subjects still at risk
    (duration ≥ u). Returns one row per distinct duration ``(t,
    n_risk, n_event, n_censor, survival)``. Rows with NULL duration
    or event are dropped (no deterministic placement).

    Determinism: counts and at-risk are exact integers (two-phase
    :func:`~simba_spark.operators.pipeline.running_total`, never a
    single-partition window); each S(t) is the SAME left-fold product
    ``((1·f₁)·f₂)…`` in both engines — no logs, no reassociation —
    rounded to ``round_to``.

    Scale: one groupBy(duration) (map-side combine) reduces the input
    to the distinct-duration frame; the at-risk cumulative is the
    two-phase running total; the prefix products fold over the
    TIME-SORTED array in one row — O(T²) multiplies where T is the
    distinct-duration count, which is CALENDAR-BOUNDED (days/hours
    buckets), not data-bounded, so the fold stays driver-free and
    constant-size at any corpus scale.
    """
    from .pipeline import running_total

    ev = F.when(F.col(event_col).cast("boolean"), 1).otherwise(0)
    base = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull())
    per_t = base.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(ev).alias("__d"),
        F.sum(1 - ev).alias("__c"),
        F.count(F.lit(1)).alias("__tot"),
    )
    cum = running_total(per_t, "t", "__tot", "__cum")
    total = base.agg(F.count(F.lit(1)).alias("__N"))
    risk = cum.crossJoin(F.broadcast(total)).select(
        "t", "__d", "__c",
        (F.col("__N") - (F.col("__cum") - F.col("__tot"))).alias("__n"),
    )
    one = risk.agg(F.array_sort(F.collect_list(F.struct(
        F.col("t"), F.col("__d"), F.col("__c"), F.col("__n")))).alias("__arr"))
    factors = F.transform(
        F.col("__arr"),
        lambda s: F.lit(1.0) - s["__d"].cast("double") / s["__n"].cast("double"),
    )
    rows = one.select(F.col("__arr"), factors.alias("__f")).select(
        F.posexplode("__arr").alias("__i", "__s"), "__f")
    surv = F.aggregate(
        F.slice(F.col("__f"), F.lit(1), F.col("__i") + 1),
        F.lit(1.0),
        lambda acc, v: acc * v,
    )
    return rows.select(
        F.col("__s")["t"].alias("t"),
        F.col("__s")["__n"].alias("n_risk"),
        F.col("__s")["__d"].alias("n_event"),
        F.col("__s")["__c"].alias("n_censor"),
        F.round(surv, int(round_to)).alias("survival"),
    )


def km_survival_sql(
    from_sql: str,
    duration_col: str = "duration",
    event_col: str = "event",
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`km_survival` (same counts, the same
    left-fold prefix products over the time-sorted factor list)."""
    return f"""
WITH __b AS (
  SELECT {duration_col} AS t,
         CASE WHEN CAST({event_col} AS BOOLEAN) THEN 1 ELSE 0 END AS e
  FROM {from_sql}
  WHERE {duration_col} IS NOT NULL AND {event_col} IS NOT NULL
), __pt AS (
  SELECT t, sum(e)::BIGINT AS d, sum(1 - e)::BIGINT AS c,
         count(*)::BIGINT AS tot
  FROM __b GROUP BY 1
), __rk AS (
  SELECT t, d, c,
         ((SELECT count(*) FROM __b)
          - (sum(tot) OVER (ORDER BY t) - tot))::BIGINT AS n
  FROM __pt
), __ar AS (
  SELECT list(struct_pack(t := t, d := d, c := c, n := n) ORDER BY t)
           AS arr,
         list(1.0::DOUBLE - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
              ORDER BY t) AS f
  FROM __rk
)
SELECT arr[i].t AS t,
       arr[i].n AS n_risk,
       arr[i].d AS n_event,
       arr[i].c AS n_censor,
       round(list_reduce(list_prepend(1.0::DOUBLE, f[1:i]),
                         (acc, v) -> acc * v), {int(round_to)}) AS survival
FROM __ar, (SELECT unnest(range(1, len(arr) + 1)) AS i FROM __ar)
"""
