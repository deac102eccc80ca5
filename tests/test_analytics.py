"""Event analytics: ordered funnel, cohort retention, volume anomaly."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, ts_str, event_type)"""
    return spark.createDataFrame(
        [
            (u, dt.datetime.fromisoformat(ts), e)
            for u, ts, e in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )


# ---------------------------------------------------------------------------
# funnel


def test_funnel_ordering_is_enforced(spark):
    from simba_spark.operators.analytics import funnel

    ev = _events(spark, [
        # user 1 completes in order
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 01:00:00", "b"),
        (1, "2024-01-01 02:00:00", "c"),
        # user 2 has b BEFORE a — b must not count
        (2, "2024-01-01 05:00:00", "b"),
        (2, "2024-01-01 06:00:00", "a"),
        # user 3 only reaches a
        (3, "2024-01-01 00:00:00", "a"),
    ])
    out = {r["step"]: r["users"] for r in funnel(ev, ["a", "b", "c"]).collect()}
    assert out == {"a": 3, "b": 1, "c": 1}


def test_funnel_equal_timestamps_count(spark):
    from simba_spark.operators.analytics import funnel

    ev = _events(spark, [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:00:00", "b"),  # same instant: >= counts it
    ])
    out = {r["step"]: r["users"] for r in funnel(ev, ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 1}


def test_funnel_window_from_first_step(spark):
    from simba_spark.operators.analytics import funnel

    ev = _events(spark, [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:30:00", "b"),   # inside the 1h window
        (2, "2024-01-01 00:00:00", "a"),
        (2, "2024-01-01 02:00:00", "b"),   # outside
    ])
    out = {
        r["step"]: r["users"]
        for r in funnel(ev, ["a", "b"], window_seconds=3600).collect()
    }
    assert out == {"a": 2, "b": 1}


def test_funnel_monotone_and_matches_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.analytics import funnel, funnel_sql

    ev = spark.range(500).select(
        (F.col("id") % 37).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 977) % 100000
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("x")),
            ((F.col("id") * 7) % 4 + 1).cast("int"),
        ).alias("event_type"),
    )
    got = {
        r["step"]: r["users"]
        for r in funnel(ev, ["a", "b", "c"]).collect()
    }
    assert got["a"] >= got["b"] >= got["c"]

    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = {
        s: u
        for _, s, u in con.sql(funnel_sql("ev", ["a", "b", "c"])).fetchall()
    }
    assert got == want


def test_funnel_rejects_bad_steps(spark):
    from simba_spark.operators.analytics import funnel

    ev = _events(spark, [(1, "2024-01-01 00:00:00", "a")])
    with pytest.raises(ValueError):
        funnel(ev, ["a"])
    with pytest.raises(ValueError):
        funnel(ev, ["a", "a"])


# ---------------------------------------------------------------------------
# cohort retention


def test_cohort_retention_basic(spark):
    from simba_spark.operators.analytics import cohort_retention

    ev = _events(spark, [
        # user 1: first event Mon Jan 1 week, active again 2 weeks later
        (1, "2024-01-02 10:00:00", "x"),
        (1, "2024-01-16 10:00:00", "x"),
        # user 2: same cohort, only week 0
        (2, "2024-01-03 10:00:00", "x"),
        # user 3: next week's cohort
        (3, "2024-01-09 10:00:00", "x"),
    ])
    out = {
        (str(r["cohort"]), r["period_offset"]): r["active_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_cohort_retention_offset0_counts_every_user(spark):
    from simba_spark.operators.analytics import cohort_retention

    ev = spark.range(300).select(
        (F.col("id") % 41).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 8641) % 4000000
        ).alias("ts"),
        F.lit("x").alias("event_type"),
    )
    rows = cohort_retention(ev).collect()
    week0 = sum(r["active_users"] for r in rows if r["period_offset"] == 0)
    assert week0 == 41  # every user is active in their own cohort period
    assert all(r["period_offset"] >= 0 for r in rows)


def test_cohort_retention_month_period(spark):
    from simba_spark.operators.analytics import cohort_retention

    ev = _events(spark, [
        (1, "2024-01-15 00:00:00", "x"),
        (1, "2024-03-02 00:00:00", "x"),
    ])
    out = {
        (str(r["cohort"]), r["period_offset"]): r["active_users"]
        for r in cohort_retention(ev, period="month").collect()
    }
    assert out == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1}


# ---------------------------------------------------------------------------
# volume anomaly


def test_volume_anomaly_flags_the_spike(spark):
    from simba_spark.operators.analytics import volume_anomaly

    # 24 hourly buckets of ~10 events, one bucket with 100
    rows = []
    base = dt.datetime(2024, 1, 1)
    for h in range(24):
        n = 100 if h == 7 else 10
        for i in range(n):
            rows.append((1, base + dt.timedelta(hours=h, seconds=i), "t"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = volume_anomaly(ev, z_threshold=3.0).collect()
    assert len(out) == 1
    assert out[0]["bucket_ts"] == base + dt.timedelta(hours=7)
    assert out[0]["n"] == 100 and out[0]["z"] > 3


def test_volume_anomaly_constant_group_never_divides_by_zero(spark):
    from simba_spark.operators.analytics import volume_anomaly

    rows = []
    base = dt.datetime(2024, 1, 1)
    for h in range(6):
        rows.append((1, base + dt.timedelta(hours=h), "flat"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    assert volume_anomaly(ev).count() == 0  # sd=0 → no flags, no error


# ---------------------------------------------------------------------------
# attribution


def _attr_events(spark):
    return spark.createDataFrame(
        [
            # user 1: view@1:30, click@2h, purchase@3h val=30 (the
            # lookback lower bound is EXCLUSIVE: a touch at exactly
            # cts - lookback does not qualify)
            (10, 1, "2024-01-01 01:30:00", "view", 0.0),
            (11, 1, "2024-01-01 02:00:00", "click", 0.0),
            (12, 1, "2024-01-01 03:00:00", "purchase", 30.0),
            # user 2: touch OUTSIDE the 1h lookback → unattributed
            (20, 2, "2024-01-01 00:00:00", "view", 0.0),
            (21, 2, "2024-01-01 05:00:00", "purchase", 50.0),
        ],
        "event_id long, user_id long, ts_s string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_attribution_linear_splits_evenly(spark):
    from simba_spark.operators.analytics import attribution

    out = {
        r["channel"]: (r["n_touches"], r["credited_value"])
        for r in attribution(
            _attr_events(spark), lookback_seconds=7200, model="linear"
        ).collect()
    }
    # user 1's both touches are within 2h of the purchase: 15 each;
    # user 2's view is 5h before: no credit anywhere
    assert out == {"view": (1, 15.0), "click": (1, 15.0)}


def test_attribution_first_and_last(spark):
    from simba_spark.operators.analytics import attribution

    ev = _attr_events(spark)
    first = {
        r["channel"]: r["credited_value"]
        for r in attribution(ev, lookback_seconds=7200, model="first").collect()
    }
    last = {
        r["channel"]: r["credited_value"]
        for r in attribution(ev, lookback_seconds=7200, model="last").collect()
    }
    assert first == {"view": 30.0}   # earliest touch takes all
    assert last == {"click": 30.0}   # latest touch takes all


def test_attribution_tie_on_ts_breaks_by_event_id(spark):
    from simba_spark.operators.analytics import attribution

    ev = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 01:00:00", "view", 0.0),
            (2, 1, "2024-01-01 01:00:00", "click", 0.0),  # same instant
            (3, 1, "2024-01-01 02:00:00", "purchase", 10.0),
        ],
        "event_id long, user_id long, ts_s string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    first = {r["channel"]: r["credited_value"]
             for r in attribution(ev, model="first").collect()}
    last = {r["channel"]: r["credited_value"]
            for r in attribution(ev, model="last").collect()}
    assert first == {"view": 10.0}   # min event_id on the tie
    assert last == {"click": 10.0}   # max event_id on the tie


def test_attribution_matches_duckdb_all_models(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.analytics import attribution, attribution_sql

    ev = spark.range(600).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 29).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 1201) % 90000
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            ((F.col("id") * 11) % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.round((F.col("id") % 97) * 1.37, 2).alias("value"),
    )
    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    for model in ("linear", "first", "last"):
        got = {
            r["channel"]: (r["n_touches"], r["credited_value"])
            for r in attribution(ev, model=model, lookback_seconds=3600).collect()
        }
        want = {
            c: (n, v)
            for c, n, v in con.sql(
                attribution_sql("ev", model=model, lookback_seconds=3600)
            ).fetchall()
        }
        assert got == want, model


def test_attribution_rejects_bad_model(spark):
    from simba_spark.operators.analytics import attribution

    with pytest.raises(ValueError):
        attribution(_attr_events(spark), model="shapley")


# ---------------------------------------------------------------------------
# transition matrix


def test_transition_matrix_counts_and_probs(spark):
    from simba_spark.operators.analytics import transition_matrix

    ev = spark.createDataFrame(
        [
            # user 1: a → b → a → c ; user 2: a → b
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 1, "2024-01-01 00:01:00", "b"),
            (3, 1, "2024-01-01 00:02:00", "a"),
            (4, 1, "2024-01-01 00:03:00", "c"),
            (5, 2, "2024-01-01 00:00:00", "a"),
            (6, 2, "2024-01-01 00:05:00", "b"),
        ],
        "event_id long, user_id long, ts_s string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        (r["from_step"], r["to_step"]): (r["n"], r["p"])
        for r in transition_matrix(ev).collect()
    }
    assert out == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }
    # rows sum to 1 per from_step
    from collections import defaultdict
    sums = defaultdict(float)
    for (f_, _), (_, p) in out.items():
        sums[f_] += p
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_transition_matrix_never_crosses_users_and_matches_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.analytics import (transition_matrix,
                                                 transition_matrix_sql)

    # single-event users produce NO transitions
    ev = spark.range(400).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 57).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 331) % 50000
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            ((F.col("id") * 13) % 3 + 1).cast("int"),
        ).alias("event_type"),
    )
    got = {
        (r["from_step"], r["to_step"]): (r["n"], r["p"])
        for r in transition_matrix(ev).collect()
    }
    assert sum(n for n, _ in got.values()) == 400 - 57  # n_events - n_users
    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = {
        (a, b): (n, p)
        for a, b, n, p in con.sql(transition_matrix_sql("ev")).fetchall()
    }
    assert got == want


def test_volume_anomaly_seasonal_baseline(spark):
    """A consistent daily rush hour is NOT an anomaly under the
    hour-of-day baseline, but a one-off spike at a normally-quiet hour
    is; the global baseline would flag every rush hour."""
    from simba_spark.operators.analytics import volume_anomaly

    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(10):
        for h in range(24):
            n = 50 if h == 9 else 5            # daily 9am rush
            if d == 6 and h == 3:
                n = 40                          # one-off 3am spike
            for i in range(n):
                rows.append((1, base + dt.timedelta(days=d, hours=h, seconds=i), "t"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    # z_threshold 2.5, not 3: the spike is IN its own baseline and a
    # single outlier among n=10 samples caps the attainable z at
    # (n-1)/sqrt(n) ~ 2.85 (self-masking)
    seasonal = volume_anomaly(ev, z_threshold=2.5,
                              seasonality="hour_of_day").collect()
    assert [r["bucket_ts"] for r in seasonal] == [
        base + dt.timedelta(days=6, hours=3)
    ]
    # the global baseline flags the rush hours instead (all 10 of them)
    global_flags = volume_anomaly(ev, z_threshold=2.5).collect()
    assert sum(1 for r in global_flags if r["bucket_ts"].hour == 9) == 10


def test_volume_anomaly_seasonal_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.analytics import (volume_anomaly,
                                                 volume_anomaly_sql)

    ev = spark.range(4000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 4099) % 1209600
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b")),
            (F.col("id") % 2 + 1).cast("int"),
        ).alias("event_type"),
    )
    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    for season in ("hour_of_day", "day_of_week"):
        got = {
            (r["event_type"], r["bucket_ts"].isoformat()): (r["n"], r["z"])
            for r in volume_anomaly(
                ev, z_threshold=1.0, seasonality=season
            ).collect()
        }
        want = {
            (t, b.isoformat()): (n, z)
            for t, b, n, z in con.sql(
                volume_anomaly_sql("ev", z_threshold=1.0, seasonality=season)
            ).fetchall()
        }
        assert got == want, season
    with pytest.raises(ValueError):
        volume_anomaly(ev, seasonality="lunar_phase")


# ---------------------------------------------------------------------------
# Market-basket association rules


def test_basket_rules_hand_computed(spark):
    from simba_spark.operators.analytics import basket_rules

    rows = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "eggs"),
        (4, "bread"),
        (4, "bread"),  # duplicate item in basket counts once
    ]
    df = spark.createDataFrame(rows, ["bk", "it"])
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_rules(df, "bk", "it", min_support=0.4).collect()
    }
    # n=4 baskets; milk:3 bread:3 eggs:2 all frequent at 0.4
    r = out[("bread", "milk")]
    assert r["n_ab"] == 2 and r["support"] == 0.5
    assert r["conf_a_b"] == 2 / 3 and r["conf_b_a"] == 2 / 3
    assert r["lift"] == (2 * 4) / (3 * 3)
    r = out[("eggs", "milk")]
    assert r["n_ab"] == 2 and r["lift"] == (2 * 4) / (2 * 3)
    # bread+eggs co-occur once: support 0.25 < 0.4 -> pruned
    assert ("bread", "eggs") not in out


def test_basket_rules_apriori_prunes_rare_items(spark):
    from simba_spark.operators.analytics import basket_rules

    rows = [(i, "common") for i in range(10)] + [(0, "rare"), (1, "rare2")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    out = basket_rules(df, "bk", "it", min_support=0.5).collect()
    assert out == []  # rare items never reach the pair join
    import pytest as _pt
    with _pt.raises(ValueError):
        basket_rules(df, "bk", "it", min_support=0.0)


def test_basket_rules_matches_duckdb(spark):
    import pytest as _pt
    duckdb = _pt.importorskip("duckdb")
    from simba_spark.operators.analytics import basket_rules, basket_rules_sql

    df = spark.range(200).select(
        (F.col("id") % 40).alias("bk"),
        F.concat(F.lit("i"), (F.col("id") * 7 % 11).cast("string")).alias("it"),
    )
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["support"], r["conf_a_b"],
                                     r["conf_b_a"], r["lift"])
        for r in basket_rules(df, "bk", "it", min_support=0.05,
                              min_confidence=0.2).collect()
    }
    con = duckdb.connect()
    q = basket_rules_sql(
        "SELECT (i % 40) AS bk, 'i' || ((i * 7) % 11) AS it FROM range(200) r(i)",
        "bk", "it", min_support=0.05, min_confidence=0.2,
    )
    want = {(r[0], r[1]): tuple(r[2:]) for r in con.execute(q).fetchall()}
    assert got == want  # bit-for-bit double ratios


def test_stickiness_values_and_parity(spark):
    import datetime as dt

    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.analytics import stickiness, stickiness_sql

    rows = []
    for d in range(1, 6):
        for u in (1, 2, 3):
            rows.append((f"2024-01-{d:02d} 10:00:00", u))
    for u in range(10):
        rows.append((f"2024-02-{u + 1:02d} 09:00:00", 100 + u))
    rows.append((None, 5))
    rows.append(("2024-01-02 11:00:00", None))
    df = spark.createDataFrame(rows, "ts_s string, user_id long").withColumn(
        "ts", F.to_timestamp("ts_s")).drop("ts_s")
    got = {str(r.month): (r.days_observed, r.mau, r.avg_dau, r.stickiness)
           for r in stickiness(df).collect()}
    # every user every day -> stickiness 1; one-off users -> 1/MAU
    assert got["2024-01-01"] == (5, 3, 3.0, 1.0)
    assert got["2024-02-01"] == (10, 10, 1.0, 0.1)
    con = duckdb.connect()
    pdf = pd.DataFrame(
        [(dt.datetime.fromisoformat(t) if t else None, u) for t, u in rows],
        columns=["ts", "user_id"])
    con.register("ev", pdf)
    o = {str(r[0]): tuple(r[1:])
         for r in con.execute(stickiness_sql("ev")).fetchall()}
    assert got == o


# --- Kaplan–Meier survival -------------------------------------------------------

def test_km_survival_textbook_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.analytics import km_survival, km_survival_sql

    # classic small example: durations with events and censorings
    rows = [(6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
            (11, 0), (13, 1), (16, 1)]
    df = spark.createDataFrame(rows, "duration long, event int")
    got = {r.t: r for r in km_survival(df).collect()}
    # t=6: n=10, d=2 -> S = 1 - 2/10 = 0.8
    assert (got[6].n_risk, got[6].n_event, got[6].n_censor) == (10, 2, 1)
    assert got[6].survival == 0.8
    # t=7: n=7 at risk, d=1 -> S = 0.8 * 6/7
    assert got[7].n_risk == 7
    assert got[7].survival == round(0.8 * 6 / 7, 6)
    # censoring-only time: factor 1, S unchanged from previous step
    assert got[9].n_event == 0 and got[9].survival == got[7].survival
    # monotone non-increasing, ends with the last event's drop
    ts = sorted(got)
    ss = [got[t].survival for t in ts]
    assert all(a >= b for a, b in zip(ss, ss[1:]))
    # hand-roll the full curve
    s, n_left = 1.0, len(rows)
    import collections
    byt = collections.OrderedDict()
    for t in ts:
        d = sum(1 for u, e in rows if u == t and e == 1)
        n = sum(1 for u, _ in rows if u >= t)
        s *= 1 - d / n
        assert got[t].survival == round(s, 6)
    # NULL rows drop
    withnull = df.unionByName(spark.createDataFrame(
        [(None, 1), (5, None)], "duration long, event int"))
    assert {r.t for r in km_survival(withnull).collect()} == set(ts)

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["duration", "event"]))
    oracle = sorted(map(tuple, con.execute(km_survival_sql("t")).fetchall()))
    assert sorted(map(tuple, (tuple(r) for r in got.values()))) == oracle
