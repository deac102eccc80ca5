"""Session batch: acf, cusum, ks_test, welch_ttest,
mutual_information, top_paths — hand-computable cases + recursion /
formula equivalence."""

import math

import pytest
from pyspark.sql import functions as F


def _series(spark, xs, key="k"):
    rows = [(key, i, float(x)) for i, x in enumerate(xs)]
    return spark.createDataFrame(rows, "k string, bucket long, x double")


# --- acf -------------------------------------------------------------------

def test_acf_alternating_is_minus_one(spark):
    from simba_spark.operators.timeseries import acf

    s = _series(spark, [1, 2, 1, 2, 1, 2, 1, 2])
    got = {r["lag"]: (r["n"], r["acf"])
           for r in acf(s, "k", val_col="x", lags=2).collect()}
    assert got[1] == (7, -1.0)
    assert got[2] == (6, 1.0)


def test_acf_constant_series_is_null(spark):
    from simba_spark.operators.timeseries import acf

    s = _series(spark, [5, 5, 5, 5])
    rows = acf(s, "k", val_col="x", lags=1).collect()
    assert rows[0]["acf"] is None and rows[0]["n"] == 3


def test_acf_matches_numpy_pearson(spark):
    import numpy as np

    from simba_spark.operators.timeseries import acf

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    s = _series(spark, xs)
    got = {r["lag"]: r["acf"]
           for r in acf(s, "k", val_col="x", lags=3).collect()}
    a = np.asarray(xs, dtype=float)
    for lag in (1, 2, 3):
        want = np.corrcoef(a[lag:], a[:-lag])[0, 1]
        assert got[lag] == pytest.approx(want, abs=1e-6)


def test_acf_gaps_skip_pairwise(spark):
    from simba_spark.operators.timeseries import acf

    rows = [("k", 0, 1.0), ("k", 1, 2.0), ("k", 3, 4.0), ("k", 4, 8.0)]
    s = spark.createDataFrame(rows, "k string, bucket long, x double")
    got = {r["lag"]: r["n"]
           for r in acf(s, "k", val_col="x", lags=1).collect()}
    assert got[1] == 2  # (1,0) and (4,3); bucket 2 missing breaks both


# --- cusum -----------------------------------------------------------------

def _cusum_ref(xs, slack):
    """Textbook recursion the window formulation must reproduce."""
    n = len(xs)
    mean = sum(xs) / n
    var = sum(x * x for x in xs) / n - mean * mean
    sd = math.sqrt(var) if var > 0 else None
    zs = [((x - mean) / sd) if sd else 0.0 for x in xs]
    up, dn, outs = 0.0, 0.0, []
    for z in zs:
        up = max(0.0, up + z - slack)
        dn = max(0.0, dn - z - slack)
        outs.append((round(up, 6), round(dn, 6)))
    return outs


def test_cusum_matches_textbook_recursion(spark):
    from simba_spark.operators.timeseries import cusum

    xs = [10, 11, 9, 10, 10, 11, 30, 31, 29, 30]
    s = _series(spark, xs)
    got = {r["bucket"]: (r["cusum_up"], r["cusum_dn"])
           for r in cusum(s, "k", val_col="x", slack=0.5,
                          threshold=2.0).collect()}
    for b, want in enumerate(_cusum_ref([float(x) for x in xs], 0.5)):
        assert got[b] == pytest.approx(want, abs=1e-9), b


def test_cusum_alarm_fires_after_level_shift_only(spark):
    from simba_spark.operators.timeseries import cusum

    # threshold 4.0: the pre-shift run's DOWNWARD drift tops out at
    # 12 * 0.3165 = 3.8 (two-sided CUSUM legitimately tracks it), so
    # only the post-shift upward excursion crosses
    xs = [10] * 12 + [14] * 8
    s = _series(spark, xs)
    rows = cusum(s, "k", val_col="x", slack=0.5,
                 threshold=4.0).collect()
    alarms = sorted(r["bucket"] for r in rows if r["alarm"])
    assert alarms and min(alarms) >= 12
    assert all(not r["alarm"] for r in rows if r["bucket"] < 12)


def test_cusum_constant_series_never_alarms(spark):
    from simba_spark.operators.timeseries import cusum

    s = _series(spark, [7] * 6)
    rows = cusum(s, "k", val_col="x").collect()
    assert all(r["z"] == 0.0 and not r["alarm"] for r in rows)


# --- ks_test ---------------------------------------------------------------

def _gdf(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "g string, v double")


def test_ks_identical_samples_zero(spark):
    from simba_spark.operators.stats import ks_test

    df = _gdf(spark, [1, 2, 3, 4, 5], [1, 2, 3, 4, 5])
    r = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r["d_stat"] == 0.0 and r["p_value"] == 1.0
    assert r["n_a"] == 5 and r["n_b"] == 5


def test_ks_disjoint_samples_one(spark):
    from simba_spark.operators.stats import ks_test

    df = _gdf(spark, [1, 2, 3, 4], [10, 11, 12, 13])
    r = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r["d_stat"] == 1.0
    want_p = min(1.0, 2.0 * math.exp(-2.0 * 1.0 * (4 * 4 / 8)))
    assert r["p_value"] == pytest.approx(want_p, abs=1e-6)


def test_ks_matches_bruteforce_d(spark):
    from simba_spark.operators.stats import ks_test

    a = [1, 1, 2, 3, 5, 8, 13]
    b = [2, 2, 3, 4, 4, 9]
    df = _gdf(spark, a, b)
    r = ks_test(df, "v", "g", "a", "b").collect()[0]
    vals = sorted(set(a) | set(b))
    want = max(
        abs(sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b))
        for v in vals
    )
    assert r["d_stat"] == pytest.approx(want, abs=1e-6)


def test_ks_empty_group_null(spark):
    from simba_spark.operators.stats import ks_test

    df = _gdf(spark, [1, 2], [])
    r = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r["d_stat"] is None


# --- welch_ttest -----------------------------------------------------------

def test_welch_matches_manual_formula(spark):
    from simba_spark.operators.stats import welch_ttest

    a = [2.1, 2.5, 2.3, 2.7, 2.4]
    b = [3.1, 3.0, 3.4, 2.9]
    df = _gdf(spark, a, b)
    r = welch_ttest(df, "v", "g", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                      + (vb / nb) ** 2 / (nb - 1))
    assert r["mean_a"] == pytest.approx(ma, abs=1e-6)
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["df_welch"] == pytest.approx(dfw, abs=1e-5)
    assert (r["n_a"], r["n_b"]) == (na, nb)


def test_welch_degenerate_group_null_t(spark):
    from simba_spark.operators.stats import welch_ttest

    df = _gdf(spark, [1.0], [2.0, 3.0])
    r = welch_ttest(df, "v", "g", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["mean_a"] == 1.0


# --- mutual_information ----------------------------------------------------

def test_mi_identical_columns_equal_entropy(spark):
    from simba_spark.operators.stats import mutual_information

    rows = [(c, c) for c in "aabbbcc"]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi"] == r["h_a"] == r["h_b"]
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert r["n"] == 7


def test_mi_independent_columns_zero(spark):
    from simba_spark.operators.stats import mutual_information

    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(3)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi"] == 0.0 and r["nmi"] == pytest.approx(0.0, abs=1e-9)


def test_mi_matches_manual(spark):
    from simba_spark.operators.stats import mutual_information

    rows = [("a", "u")] * 4 + [("a", "v")] * 1 + [("b", "u")] * 1 \
        + [("b", "v")] * 4
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    n = 10.0
    mi = sum((c / n) * math.log(n * c / (5 * 5))
             for c in (4, 1, 1, 4))
    assert r["mi"] == pytest.approx(mi, abs=1e-6)


# --- top_paths -------------------------------------------------------------

def test_top_paths_caps_and_orders(spark):
    from simba_spark.operators.analytics import top_paths

    rows = []
    # three users do a>b>c, one does a>b, one power user does
    # a>b>c>d>e>f (capped at max_len)
    for u, seq in ((1, "abc"), (2, "abc"), (3, "abc"), (4, "ab"),
                   (5, "abcdef")):
        for i, s in enumerate(seq):
            rows.append((u, i, s, u * 100 + i))
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long")
    got = [(r["path"], r["n_users"])
           for r in top_paths(df, max_len=3, k=10).collect()]
    assert got == [("a>b>c", 4), ("a>b", 1)]


def test_top_paths_tiebreak_by_ts_then_id(spark):
    from simba_spark.operators.analytics import top_paths

    # same ts: event_id orders the path deterministically
    rows = [(1, 0, "x", 2), (1, 0, "y", 1)]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long")
    got = top_paths(df, max_len=5, k=5).collect()
    assert got[0]["path"] == "y>x"


# --- linreg_series ----------------------------------------------------------

def test_linreg_exact_line(spark):
    from simba_spark.operators.timeseries import linreg_series

    s = _series(spark, [3 + 2 * b for b in range(8)])
    r = linreg_series(s, "k", val_col="x").collect()[0]
    assert (r["slope"], r["intercept"], r["r2"]) == (2.0, 3.0, 1.0)
    assert r["n"] == 8


def test_linreg_constant_series(spark):
    from simba_spark.operators.timeseries import linreg_series

    s = _series(spark, [5, 5, 5, 5])
    r = linreg_series(s, "k", val_col="x").collect()[0]
    assert r["slope"] == 0.0 and r["intercept"] == 5.0
    assert r["r2"] is None  # zero variance in y


def test_linreg_single_point_null(spark):
    from simba_spark.operators.timeseries import linreg_series

    s = _series(spark, [7])
    r = linreg_series(s, "k", val_col="x").collect()[0]
    assert r["slope"] is None and r["intercept"] is None


def test_linreg_matches_numpy(spark):
    import numpy as np

    from simba_spark.operators.timeseries import linreg_series

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    s = _series(spark, xs)
    r = linreg_series(s, "k", val_col="x").collect()[0]
    b = np.arange(len(xs), dtype=float)
    slope, intercept = np.polyfit(b, np.asarray(xs, float), 1)
    cc = np.corrcoef(b, np.asarray(xs, float))[0, 1]
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert r["r2"] == pytest.approx(cc * cc, abs=1e-6)


# --- modularity -------------------------------------------------------------

def _two_triangles(spark):
    # triangles 1-2-3 and 4-5-6 bridged by 3-4
    rows = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_modularity_two_communities(spark):
    from simba_spark.operators.graph import modularity

    edges = _two_triangles(spark)
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 2) for n in range(1, 7)],
        "node long, label long")
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    # m=7; each side: 3 internal edges, total degree 7
    for lbl in (1, 2):
        r = rows[lbl]
        assert (r["n_nodes"], r["m_in"], r["d_c"]) == (3, 3, 7)
        assert r["q_c"] == pytest.approx(3 / 7 - (7 / 14) ** 2, abs=1e-6)


def test_modularity_single_community_zero(spark):
    from simba_spark.operators.graph import modularity

    edges = _two_triangles(spark)
    labels = spark.createDataFrame(
        [(n, 9) for n in range(1, 7)], "node long, label long")
    r = modularity(edges, labels).collect()[0]
    assert r["m_in"] == 7 and r["d_c"] == 14
    assert r["q_c"] == pytest.approx(0.0, abs=1e-9)


def test_modularity_good_split_beats_bad_split(spark):
    from simba_spark.operators.graph import modularity

    edges = _two_triangles(spark)
    good = spark.createDataFrame(
        [(n, 1 if n <= 3 else 2) for n in range(1, 7)],
        "node long, label long")
    bad = spark.createDataFrame(
        [(n, n % 2) for n in range(1, 7)], "node long, label long")
    q_good = sum(r["q_c"] for r in modularity(edges, good).collect())
    q_bad = sum(r["q_c"] for r in modularity(edges, bad).collect())
    assert q_good > q_bad


def test_modularity_sql_mirror(spark):
    import duckdb

    from simba_spark.operators.graph import modularity, modularity_sql

    edges = _two_triangles(spark)
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 2) for n in range(1, 7)],
        "node long, label long")
    got = {tuple(r) for r in modularity(edges, labels).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)",
                    [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6),
                     (3, 4)])
    con.sql("CREATE TABLE lab(node BIGINT, label BIGINT)")
    con.executemany("INSERT INTO lab VALUES (?, ?)",
                    [(n, 1 if n <= 3 else 2) for n in range(1, 7)])
    want = {tuple(r) for r in
            con.sql(modularity_sql("e", "lab")).fetchall()}
    assert got == want


# --- gini -------------------------------------------------------------------

def test_gini_uniform_zero_and_concentrated_high(spark):
    from simba_spark.operators.stats import gini

    uni = spark.createDataFrame([(float(5),)] * 10, "x double")
    r = gini(uni, "x").collect()[0]
    assert r["gini"] == pytest.approx(0.0, abs=1e-9) and r["n"] == 10

    conc = spark.createDataFrame([(0.0,)] * 9 + [(100.0,)], "x double")
    r2 = gini(conc, "x").collect()[0]
    assert r2["gini"] == pytest.approx(0.9, abs=1e-9)


def test_gini_matches_manual(spark):
    from simba_spark.operators.stats import gini

    xs = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    r = gini(df, "x").collect()[0]
    s = sorted(xs)
    n, tot = len(s), sum(s)
    want = 2 * sum((i + 1) * x for i, x in enumerate(s)) / (n * tot) \
        - (n + 1) / n
    assert r["gini"] == pytest.approx(want, abs=1e-9)


def test_gini_grouped_and_negatives_dropped(spark):
    from simba_spark.operators.stats import gini

    rows = [("a", 5.0), ("a", 5.0), ("b", 0.0), ("b", 10.0),
            ("b", -3.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: (r["n"], r["gini"])
           for r in gini(df, "x", group_col="g").collect()}
    assert got["a"] == (2, pytest.approx(0.0, abs=1e-9))
    assert got["b"] == (2, pytest.approx(0.5, abs=1e-9))


# --- benford ----------------------------------------------------------------

def test_benford_digit_extraction(spark):
    from simba_spark.operators.stats import benford

    rows = [(1.0,), (19.5,), (0.032,), (200.0,), (999.0,), (-45.0,),
            (0.0,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    got = {r["digit"]: r["n"] for r in benford(df, "x").collect()}
    # digits: 1,1,3,2,9,4 — zeros/NULLs dropped
    assert got == {1: 2, 2: 1, 3: 1, 4: 1, 9: 1}


def test_benford_conforming_sample_low_chisq(spark):
    import math

    from simba_spark.operators.stats import benford

    # geometric ramp spans 4 decades -> near-Benford digits
    rows = [(1.07 ** i,) for i in range(1, 300)]
    df = spark.createDataFrame(rows, "x double")
    out = benford(df, "x").collect()
    chisq = sum(r["chisq_term"] for r in out)
    assert chisq < 16.0  # chi2(8df, .95)=15.5; conforming data passes
    p = {r["digit"]: r["p_obs"] for r in out}
    assert abs(p[1] - math.log10(2)) < 0.05


def test_ohlc_bars_deterministic_and_sql_parity(spark):
    import duckdb
    from datetime import datetime

    from simba_spark.operators.timeseries import ohlc, ohlc_sql

    rows = [
        ("k1", datetime(2024, 1, 1, 9, 0), 1, 10.0),
        ("k1", datetime(2024, 1, 1, 9, 0), 2, 11.0),   # same-ts tie
        ("k1", datetime(2024, 1, 1, 15, 0), 3, 8.0),
        ("k1", datetime(2024, 1, 2, 10, 0), 4, 20.0),
        ("k2", datetime(2024, 1, 1, 12, 0), 5, 5.0),
        ("k2", datetime(2024, 1, 1, 12, 0), 6, None),  # null value drops
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    got = {(r["k"], str(r["bucket"]), r["open"], r["high"], r["low"],
            r["close"], r["n"], r["val_sum"])
           for r in ohlc(df, "ts", "v", key_cols=["k"],
                         tiebreak_col="id").collect()}
    assert ("k1", "2024-01-01 00:00:00", 10.0, 11.0, 8.0, 8.0, 3, 29.0) in got
    assert ("k1", "2024-01-02 00:00:00", 20.0, 20.0, 20.0, 20.0, 1, 20.0) in got
    assert ("k2", "2024-01-01 00:00:00", 5.0, 5.0, 5.0, 5.0, 1, 5.0) in got
    assert len(got) == 3
    con = duckdb.connect()
    con.sql("CREATE TABLE t(k VARCHAR, ts TIMESTAMP, id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)",
                    [(k, t, i, v) for k, t, i, v in rows])
    want = {(r[0], str(r[1]), *r[2:]) for r in con.sql(
        ohlc_sql("t", "ts", "v", key_cols=["k"],
                 tiebreak_col="id")).fetchall()}
    assert got == want


# --- Spearman / Mann-Whitney / assortativity ---------------------------------

def test_spearman_corr_values(spark):
    from simba_spark.operators.stats import spearman_corr

    # perfect monotone (nonlinear) relation: rho exactly 1
    df = spark.createDataFrame(
        [(float(i), float(i) ** 3) for i in range(1, 30)], "x double, y double"
    )
    assert spearman_corr(df, "x", "y").first().rho == 1.0
    # perfect inverse: -1
    dn = spark.createDataFrame(
        [(float(i), -float(i) ** 3) for i in range(1, 30)], "x double, y double"
    )
    assert spearman_corr(dn, "x", "y").first().rho == -1.0
    # constant column: NULL
    dc = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], "x double, y double")
    assert spearman_corr(dc, "x", "y").first().rho is None
    # pairwise deletion drops NULL/NaN rows
    dd = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 4.0), (None, 9.0), (3.0, float("nan"))],
        "x double, y double")
    assert spearman_corr(dd, "x", "y").first().n == 2


def test_spearman_corr_ties_match_reference(spark):
    from simba_spark.operators.stats import spearman_corr

    # hand-computed tie-averaged ranks: x=[1,2,2,3], y=[10,20,20,40]
    # ranks x=[1, 2.5, 2.5, 4], y=[1, 2.5, 2.5, 4] -> rho = 1
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)],
        "x double, y double")
    assert spearman_corr(df, "x", "y").first().rho == 1.0


def test_spearman_corr_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.stats import spearman_corr, spearman_corr_sql

    rng = random.Random(9)
    rows = [(round(rng.uniform(0, 10), 1), round(rng.uniform(0, 10), 1))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = spearman_corr(df, "x", "y").first()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["x", "y"]))
    o = con.execute(spearman_corr_sql("t", "x", "y")).fetchone()
    assert (got.n, got.rho) == tuple(o)


def test_mannwhitney_u_reference_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.stats import mannwhitney_u, mannwhitney_u_sql

    # classic worked example: a = [1,2,3], b = [4,5,6] -> U_a = 0
    rows = [(float(v), "a") for v in (1, 2, 3)] + \
           [(float(v), "b") for v in (4, 5, 6)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = mannwhitney_u(df, "v", "g", "a", "b").first()
    assert (r.n_a, r.n_b, r.u_a, r.u_b) == (3, 3, 0.0, 9.0)
    assert r.z < 0  # group a shifted low
    # all tied: zero variance -> z NULL
    dt = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (1.0, "b")], "v double, g string")
    assert mannwhitney_u(dt, "v", "g", "a", "b").first().z is None
    # parity on a larger tied sample
    import random

    rng = random.Random(4)
    rows = [(float(rng.randrange(20)), rng.choice("ab")) for _ in range(400)]
    df2 = spark.createDataFrame(rows, "v double, g string")
    got = mannwhitney_u(df2, "v", "g", "a", "b").first()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["v", "g"]))
    o = con.execute(mannwhitney_u_sql("t", "v", "g", "a", "b")).fetchone()
    assert tuple(got) == tuple(o)


def test_degree_assortativity_extremes_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.graph import (degree_assortativity,
                                             degree_assortativity_sql)

    # star: perfectly disassortative
    star = [(0, i) for i in range(1, 8)]
    assert degree_assortativity(
        spark.createDataFrame(star, "src long, dst long")).first().r == -1.0
    # regular cycle: zero variance -> NULL
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    assert degree_assortativity(
        spark.createDataFrame(cyc, "src long, dst long")).first().r is None
    # random graph: parity
    rng = random.Random(13)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(100)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = degree_assortativity(df).first()
    con = duckdb.connect()
    con.register("e", pd.DataFrame(edges, columns=["src", "dst"]))
    o = con.execute(degree_assortativity_sql("e")).fetchone()
    assert tuple(got) == tuple(o)


# --- Kruskal-Wallis H ---------------------------------------------------------

def _kw_ref(groups):
    """Direct midrank-over-rows reference (independent of the
    operator's value-level formulation)."""
    pooled = sorted((v, gi) for gi, vs in enumerate(groups) for v in vs)
    N = len(pooled)
    ranks = {}
    i = 0
    while i < N:
        j = i
        while j < N and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = mid
        i = j
    rsums = [0.0] * len(groups)
    for idx, (_, gi) in enumerate(pooled):
        rsums[gi] += ranks[idx]
    rr = sum(r * r / len(g) for r, g in zip(rsums, groups))
    h = 12.0 / (N * (N + 1)) * rr - 3.0 * (N + 1)
    from collections import Counter
    tie = sum(t ** 3 - t for t in Counter(v for v, _ in pooled).values())
    corr = 1.0 - tie / (N ** 3 - N)
    return h, (h / corr if corr > 0 else None)


def test_kruskal_wallis_matches_reference(spark):
    from simba_spark.operators.stats import kruskal_wallis

    groups = [[2.9, 3.0, 2.5, 2.6, 3.2],          # classic 3-sample data
              [3.8, 2.7, 4.0, 2.4],
              [2.8, 3.4, 3.7, 2.2, 2.0, 2.5]]     # one tie with group 1
    rows = [(float(v), f"g{i}") for i, vs in enumerate(groups) for v in vs]
    df = spark.createDataFrame(rows, "v double, g string")
    got = kruskal_wallis(df, "v", "g").first()
    h, hc = _kw_ref(groups)
    assert got.n == 15 and got.k_groups == 3
    assert got.h == round(h, 6)
    assert got.h_corrected == round(hc, 6)
    # two-group KW reduces to the mann-whitney z (H = z^2 asymptotically
    # exact with tie correction): sanity-check the relationship
    from simba_spark.operators.stats import mannwhitney_u

    two = df.filter(F.col("g") != "g2")
    z = mannwhitney_u(two, "v", "g", "g0", "g1").first().z
    h2 = kruskal_wallis(two, "v", "g").first().h_corrected
    assert abs(h2 - z * z) < 1e-4


def test_kruskal_wallis_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.stats import (kruskal_wallis,
                                             kruskal_wallis_sql)

    rng = random.Random(17)
    rows = [(round(rng.gauss(mu, 1.0), 1), g)
            for g, mu in [("a", 0.0), ("b", 0.4), ("c", 0.2), ("d", 0.9)]
            for _ in range(rng.randrange(30, 60))]
    df = spark.createDataFrame(rows, "v double, g string")
    got = tuple(kruskal_wallis(df, "v", "g").first())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["v", "g"]))
    oracle = con.execute(kruskal_wallis_sql("t", "v", "g")).fetchall()[0]
    assert got == tuple(oracle)


def _anova_ref(groups):
    N = sum(len(g) for g in groups)
    k = len(groups)
    gm = sum(sum(g) for g in groups) / N
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (N - k)) if ssw > 0 else None
    return f, ssb / (ssb + ssw)


def test_anova_oneway_matches_reference(spark):
    from simba_spark.operators.stats import anova_oneway

    groups = [[2.9, 3.0, 2.5, 2.6, 3.2],
              [3.8, 2.7, 4.0, 2.4],
              [2.8, 3.4, 3.7, 2.2, 2.0, 2.5]]
    rows = [(float(v), f"g{i}") for i, vs in enumerate(groups) for v in vs]
    df = spark.createDataFrame(rows, "v double, g string")
    got = anova_oneway(df, "v", "g").first()
    f, eta = _anova_ref(groups)
    assert got.n == 15 and got.k_groups == 3
    assert abs(got.f_stat - f) < 1e-6
    assert abs(got.eta_sq - eta) < 1e-6
    # degenerate cases: one group -> NULL F; zero within variance
    one = anova_oneway(df.filter(F.col("g") == "g0"), "v", "g").first()
    assert one.f_stat is None
    const = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b")], "v double, g string")
    cz = anova_oneway(const, "v", "g").first()
    assert cz.f_stat is None and cz.eta_sq == 1.0
    # NULL / NaN rows drop
    withnull = df.unionByName(spark.createDataFrame(
        [(None, "g0"), (float("nan"), "g1")], "v double, g string"))
    assert anova_oneway(withnull, "v", "g").first().n == 15


def test_anova_oneway_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.stats import anova_oneway, anova_oneway_sql

    rng = random.Random(17)
    rows = [(round(rng.gauss(mu, 1.0), 1), g)
            for g, mu in [("a", 0.0), ("b", 0.4), ("c", 0.2), ("d", 0.9)]
            for _ in range(rng.randrange(30, 60))]
    df = spark.createDataFrame(rows, "v double, g string")
    got = tuple(anova_oneway(df, "v", "g").first())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["v", "g"]))
    oracle = con.execute(anova_oneway_sql("t", "v", "g")).fetchall()[0]
    assert got == tuple(oracle)


def test_fd_profile_semantics_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.stats import fd_profile, fd_profile_sql

    rows = [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),   # a -> {x,x,y}: 1 viol
        (4, "b", "z"), (5, "b", "z"),                   # b clean
        (6, None, "x"), (7, None, "y"),                 # NULL det is a value
    ]
    df = spark.createDataFrame(rows, "id long, det string, dep string")
    pairs = [("det", "dep"), ("id", "dep"), ("dep", "det")]
    got = {(r.determinant, r.dependent): r
           for r in fd_profile(df, pairs).collect()}
    r1 = got[("det", "dep")]
    assert (r1.n, r1.n_det, r1.violations) == (7, 3, 2)  # 1 (a) + 1 (NULL)
    assert r1.violation_rate == round(2 / 7, 6)
    rid = got[("id", "dep")]                             # key FD holds
    assert rid.violations == 0 and rid.violation_rate == 0.0
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "det", "dep"]))
    oracle = sorted(map(tuple, con.execute(
        fd_profile_sql("t", pairs)).fetchall()))
    assert sorted(map(tuple, (tuple(r) for r in got.values()))) == oracle
    with pytest.raises(ValueError):
        fd_profile(df, [])


# --- Benjamini-Hochberg FDR (round 11) ---------------------------------------


def _bh_ref(ps, alpha):
    """Textbook BH adjusted p-values."""
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    q = [None] * m
    run = float("inf")
    for pos in range(m - 1, -1, -1):
        i = order[pos]
        run = min(run, ps[i] * m / (pos + 1))
        q[i] = min(1.0, run)
    return q


def test_fdr_bh_matches_textbook(spark):
    from simba_spark.operators.stats import fdr_bh

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "test_id long, p_value double")
    out = {r.test_id: (r.q_value, r.reject)
           for r in fdr_bh(df, alpha=0.05).collect()}
    want = _bh_ref(ps, 0.05)
    for i, p in enumerate(ps):
        assert abs(out[i][0] - want[i]) < 1e-12
        assert out[i][1] == (want[i] <= 0.05)
    # the step-up rule and q <= alpha agree on the discovery set
    assert (sum(1 for i in out if out[i][1])
            == sum(1 for qv in want if qv <= 0.05) == 1)


def test_fdr_bh_ties_and_nulls(spark):
    import math

    from simba_spark.operators.stats import fdr_bh

    df = spark.createDataFrame(
        [(0, 0.01), (1, 0.01), (2, 0.5), (3, None), (4, float("nan"))],
        "test_id long, p_value double")
    out = {r.test_id: (r.q_value, r.reject) for r in fdr_bh(df).collect()}
    # tied p share one q; NULL/NaN pass through unranked and uncounted
    assert out[0] == out[1]
    assert abs(out[0][0] - min(1.0, 0.01 * 3 / 2)) < 1e-12
    assert out[3][0] is None and out[3][1] is None
    assert out[4][0] is None or math.isnan(out[4][0]) is False


def test_fdr_bh_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.stats import fdr_bh, fdr_bh_sql

    rng = random.Random(3)
    rows = [(i, round(rng.random(), 4) if i % 7 else None)
            for i in range(60)]
    df = spark.createDataFrame(rows, "test_id long, p_value double")
    got = sorted(((r.test_id, r.p_value, r.q_value, r.reject)
                  for r in fdr_bh(df).collect()),
                 key=lambda t: (t[0],))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["test_id", "p_value"]))
    oracle = sorted(map(tuple, con.execute(
        fdr_bh_sql("t")).fetchall()), key=lambda t: (t[0],))
    assert got == oracle


def test_fdr_bh_validation(spark):
    from simba_spark.operators.stats import fdr_bh

    df = spark.createDataFrame([(0, 0.1)], "test_id long, p_value double")
    for a in (0.0, 1.0, -1.0):
        with pytest.raises(ValueError):
            fdr_bh(df, alpha=a)
