"""Pipeline utilities: reproducible sampling, group quotas, sequence
packing (north-star §2.7). Determinism under repartitioning is the key
property — sampling/packing decisions must not depend on physical
layout."""

import pytest
from pyspark.sql import functions as F


def test_hash_sample_deterministic_and_rate(spark):
    from simba_spark.operators.pipeline import hash_sample

    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    s1 = sorted(r.k for r in hash_sample(df, "k", 0.3, seed=1).collect())
    # same keys, different physical layout → identical membership
    s2 = sorted(
        r.k for r in hash_sample(df.repartition(13), "k", 0.3, seed=1).collect()
    )
    assert s1 == s2
    assert 0.27 < len(s1) / 20000 < 0.33
    # different seed → different (but still deterministic) subset
    s3 = sorted(r.k for r in hash_sample(df, "k", 0.3, seed=2).collect())
    assert s3 != s1
    # nested property: sample(0.1) ⊆ sample(0.3) at the same seed
    s4 = set(r.k for r in hash_sample(df, "k", 0.1, seed=1).collect())
    assert s4 <= set(s1)


def test_group_quota_bounds_each_group(spark):
    from simba_spark.operators.pipeline import group_quota

    rows = [(i, f"g{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = group_quota(df, "g", 5, order_col="id")
    got = {}
    for r in out.collect():
        got.setdefault(r.g, []).append(r.id)
    assert set(got) == {"g0", "g1", "g2"}
    for g, ids in got.items():
        assert len(ids) == 5
        # order_col asc → the smallest ids of each group survive
        assert sorted(ids) == sorted(i for i, gg in rows if gg == g)[:5]


def test_pack_sequences_global_matches_sequential(spark):
    from simba_spark.operators.pipeline import pack_sequences

    import random

    rng = random.Random(5)
    rows = [(i, rng.randint(1, 900)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, sz long").repartition(7)
    out = {
        r.id: (r.pack_id, r.pack_pos)
        for r in pack_sequences(df, "sz", 2000, order_col="id").collect()
    }
    # sequential reference: start-offset // target
    cum = 0
    packs = {}
    expect = {}
    for i, sz in rows:
        pid = cum // 2000
        packs[pid] = packs.get(pid, 0) + 1
        expect[i] = (pid, packs[pid])
        cum += sz
    assert out == expect
    # no pack exceeds target + max row size
    sizes = {}
    for i, sz in rows:
        sizes[expect[i][0]] = sizes.get(expect[i][0], 0) + sz
    assert max(sizes.values()) <= 2000 + 900


def test_pack_sequences_per_group_restarts(spark):
    from simba_spark.operators.pipeline import pack_sequences

    rows = [(i, "a" if i < 6 else "b", 10) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, g string, sz long")
    out = pack_sequences(df, "sz", 30, order_col="id", partition_col="g")
    got = {(r.g, r.id): r.pack_id for r in out.collect()}
    # each group packs independently: 6 rows of 10 at target 30 → packs 0,0,0,1,1,1
    for g, base in (("a", 0), ("b", 6)):
        assert [got[(g, base + j)] for j in range(6)] == [0, 0, 0, 1, 1, 1]


def test_term_stats_counts(spark):
    from simba_spark.operators.text import term_stats

    df = spark.createDataFrame(
        [(1, "the cat  sat"), (2, "THE dog"), (3, "cat")],
        "doc_id long, text string",
    )
    got = {r.term: (r.doc_freq, r.term_freq) for r in term_stats(df).collect()}
    assert got == {
        "the": (2, 2), "cat": (2, 2), "sat": (1, 1), "dog": (1, 1),
    }


def test_salted_join_matches_plain_join(spark):
    """Salting must never change results — checked on a 90%-hot-key
    distribution for inner and left joins; right/full outer rejected."""
    import pytest as _pytest

    from simba_spark.operators.pipeline import salted_join

    left = spark.createDataFrame(
        [(i, 0 if i % 10 else i, f"l{i}") for i in range(2000)],
        "lid long, k long, lv string",
    )  # ~90% of rows share k's hot values
    right = spark.createDataFrame(
        [(j, f"r{j}") for j in range(0, 2000, 3)], "k long, rv string"
    )
    plain = sorted(
        (r.lid, r.k, r.rv)
        for r in left.join(right, on="k", how="inner").collect()
    )
    salted = sorted(
        (r.lid, r.k, r.rv)
        for r in salted_join(left, right, ["k"], n_salts=8).collect()
    )
    assert salted == plain and len(plain) > 0

    plain_l = sorted(
        (r.lid, r.rv)
        for r in left.join(right, on="k", how="left").collect()
    )
    salted_l = sorted(
        (r.lid, r.rv)
        for r in salted_join(left, right, ["k"], n_salts=8, how="left").collect()
    )
    assert salted_l == plain_l

    with _pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")


def test_mixture_sample_hits_target_ratios(spark):
    import pytest

    from simba_spark.operators.pipeline import mixture_sample

    # 4000 a / 1000 b / 2000 c rows; target 1:1:2 → binding source is b
    # (1000/0.25 = 4000 < a's 16000, c's 4000 ties) → expect ~1000 a,
    # all 1000 b, ~2000 c, d dropped entirely
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 4000, "a")
        .when(F.col("id") < 5000, "b")
        .when(F.col("id") < 7000, "c")
        .otherwise("d")
        .alias("src"),
    )
    out = mixture_sample(df, "src", {"a": 1, "b": 1, "c": 2}, "k", seed=3)
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "d" not in counts
    assert counts["b"] == 1000  # binding source keeps 100%
    assert 900 < counts["a"] < 1100
    assert 1900 <= counts["c"] <= 2000
    # scale shrinks proportionally and NESTS (same hash, lower rates)
    half = mixture_sample(df, "src", {"a": 1, "b": 1, "c": 2}, "k",
                          seed=3, scale=0.5)
    assert set(r.k for r in half.collect()) <= set(r.k for r in out.collect())
    n_half = half.count()
    assert 0.4 * out.count() < n_half < 0.6 * out.count()
    # validation
    with pytest.raises(ValueError):
        mixture_sample(df, "src", {}, "k")
    with pytest.raises(ValueError):
        mixture_sample(df, "src", {"a": 0.0}, "k")
    with pytest.raises(ValueError):
        mixture_sample(df, "src", {"nope": 1.0}, "k")


def test_global_order_is_deterministic_permutation(spark):
    from simba_spark.operators.pipeline import global_order

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    a = {r.k: r.train_order for r in global_order(df, "k", seed=1).collect()}
    # exact 0..n-1 permutation
    assert sorted(a.values()) == list(range(5000))
    # physical layout must not change the permutation
    b = {r.k: r.train_order
         for r in global_order(df.repartition(17), "k", seed=1).collect()}
    assert a == b
    # a different seed is a different permutation of the same ranks
    c = {r.k: r.train_order for r in global_order(df, "k", seed=2).collect()}
    assert sorted(c.values()) == list(range(5000))
    assert c != a
    # not the identity (it actually shuffles)
    assert a != {k: k for k in range(5000)}


def test_winsorize_clip_and_filter(spark):
    """Sketched winsorization: thresholds near the true quantiles,
    clip bounds every non-null value into [lo, hi] (nulls pass
    through), filter keeps exactly the in-range + null rows."""
    from simba_spark.operators.pipeline import winsorize

    df = spark.range(10000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise((F.col("id") % 1000).cast("double")).alias("v"),
    )
    clipped = winsorize(df, "v", "rid", lo_q=0.05, hi_q=0.95, k=2048)
    rows = clipped.collect()
    assert len(rows) == 10000
    vals = [r["v_w"] for r in rows if r["v_w"] is not None]
    lo, hi = min(vals), max(vals)
    assert 20 <= lo <= 80 and 920 <= hi <= 980  # ~p5/p95 of 0..999
    assert sum(1 for r in rows if r["v_w"] is None) == 100

    kept = winsorize(df, "v", "rid", lo_q=0.05, hi_q=0.95,
                     mode="filter", k=2048).collect()
    assert all(r["v"] is None or lo <= r["v"] <= hi for r in kept)
    assert 8800 <= len(kept) <= 9200  # ~90% + nulls


def test_winsorize_matches_duckdb(spark):
    import duckdb

    from simba_spark.operators.pipeline import winsorize, winsorize_sql

    sf = "/root/testdata/sf0.01"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = {
        (r["event_id"], r["value_w"]) for r in
        winsorize(ev, "value", "event_id", lo_q=0.02, hi_q=0.98, k=512)
        .select("event_id", "value_w").collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    sql = winsorize_sql("events", "value", "event_id", lo_q=0.02,
                        hi_q=0.98, k=512, select_cols="event_id",
                        out_col="value_w")
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_split_assign_group_atomic_and_fractions(spark):
    """Rows sharing a key land in one split; fractions hold ~exactly
    over many distinct keys; NULL keys get NULL."""
    from simba_spark.operators.pipeline import split_assign

    rows = [(i, f"g{i % 500}") for i in range(2000)] + [(9999, None)]
    df = spark.createDataFrame(rows, "row_id long, grp string")
    out = split_assign(df, "grp", splits=(("train", 0.8), ("val", 0.1),
                                          ("test", 0.1)), seed=7)
    got = [(r["row_id"], r["grp"], r["split"]) for r in out.collect()]
    by_grp = {}
    for _, g, s in got:
        if g is not None:
            by_grp.setdefault(g, set()).add(s)
    assert all(len(s) == 1 for s in by_grp.values())
    assert [s for i, g, s in got if g is None] == [None]
    from collections import Counter
    c = Counter(next(iter(s)) for s in by_grp.values())
    assert abs(c["train"] / 500 - 0.8) < 0.06
    assert abs(c["val"] / 500 - 0.1) < 0.05
    assert abs(c["test"] / 500 - 0.1) < 0.05
    # deterministic across partitioning
    again = split_assign(df.repartition(13), "grp",
                         splits=(("train", 0.8), ("val", 0.1),
                                 ("test", 0.1)), seed=7)
    assert sorted(got) == sorted(
        (r["row_id"], r["grp"], r["split"]) for r in again.collect())


def test_split_assign_validates_fractions(spark):
    import pytest as _pt

    from simba_spark.operators.pipeline import split_assign

    df = spark.createDataFrame([(1, "a")], "row_id long, grp string")
    with _pt.raises(ValueError):
        split_assign(df, "grp", splits=(("a", 0.5), ("b", 0.4)))
    with _pt.raises(ValueError):
        split_assign(df, "grp", splits=(("a", 1.2), ("b", -0.2)))
    with _pt.raises(ValueError):
        split_assign(df, "grp", splits=(("a", 0.5), ("a", 0.5)))


def test_split_assign_matches_duckdb(spark):
    import duckdb

    from simba_spark.operators.pipeline import split_assign, split_assign_sql

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {(r["doc_id"], r["split"]) for r in
           split_assign(docs, "source", seed=11)
           .select("doc_id", "split").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    case = split_assign_sql("source", seed=11)
    want = set(map(tuple, con.execute(
        f"SELECT doc_id, {case} AS split FROM documents").fetchall()))
    assert got == want


def test_table_diff_statuses_and_changed_cols(spark):
    from simba_spark.operators.pipeline import table_diff

    left = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k long, price double, status string")
    right = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged
         (2, 25.0, "X"),          # changed: both cols
         (4, None, "D"),          # unchanged (null-safe equality)
         (5, 50.0, "E")],         # added
        "k long, price double, status string")
    got = {r["k"]: (r["diff_status"], list(r["changed_cols"]))
           for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        1: ("unchanged", []),
        2: ("changed", ["price", "status"]),
        3: ("removed", []),
        4: ("unchanged", []),
        5: ("added", []),
    }


def test_table_diff_null_key_raises(spark):
    import pytest as _pt
    from py4j.protocol import Py4JJavaError

    from simba_spark.operators.pipeline import table_diff

    left = spark.createDataFrame([(None, 1.0)], "k long, v double")
    right = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with _pt.raises((Py4JJavaError, Exception), match="NULL k"):
        table_diff(left, right, ["k"]).collect()


def test_table_diff_matches_duckdb(spark):
    import duckdb

    from simba_spark.operators.pipeline import table_diff, table_diff_sql

    sf = "/root/testdata/sf0.01"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    left = orders.select("o_orderkey", "o_totalprice")
    right = orders.filter("o_orderkey % 3 != 0") \
        .select("o_orderkey", (F.col("o_totalprice") + 1.0).alias("o_totalprice"))
    got = {(r["o_orderkey"], r["diff_status"]) for r in
           table_diff(left, right, ["o_orderkey"],
                      compare_cols=["o_totalprice"]).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    sql = table_diff_sql(
        "SELECT o_orderkey, o_totalprice FROM orders",
        "SELECT o_orderkey, o_totalprice + 1.0::DOUBLE AS o_totalprice "
        "FROM orders WHERE o_orderkey % 3 != 0",
        key_cols=["o_orderkey"], compare_cols=["o_totalprice"])
    want = {(int(k), s) for k, s, _ in con.execute(sql).fetchall()}
    assert got == want


def test_quantile_bin_equal_frequency_and_nulls(spark):
    from simba_spark.operators.pipeline import quantile_bin

    rows = [(i, float(i)) for i in range(1000)] + [(5000, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = quantile_bin(df, "v", "id", nbins=4, k=1024)
    got = {r["id"]: r["v_bin"] for r in out.collect()}
    assert got[5000] is None
    from collections import Counter
    c = Counter(b for i, b in got.items() if i != 5000)
    assert set(c) == {0, 1, 2, 3}
    # k >= n so the sketch is exact: bins are equal-frequency +-1
    assert all(abs(c[b] - 250) <= 1 for b in c)
    # bins are monotone in the value
    vals = sorted((i, b) for i, b in got.items() if i != 5000)
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(vals, vals[1:]))
    import pytest as _pt
    with _pt.raises(ValueError):
        quantile_bin(df, "v", "id", nbins=1)


def test_table_diff_duplicate_key_raises(spark):
    import pytest as _pt

    from simba_spark.operators.pipeline import table_diff

    left = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k long, v double")
    right = spark.createDataFrame([(1, 10.0)], "k long, v double")
    with _pt.raises(Exception, match="duplicate key"):
        table_diff(left, right, ["k"]).collect()


def test_corr_matrix_one_pass_and_values(spark):
    import math

    from simba_spark.operators.stats import corr_matrix

    rows = [(float(i), float(2 * i + 1), float(-i), None if i % 2 else float(i * i))
            for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = corr_matrix(df, ["a", "b", "c", "d"])
    got = {(r["col_a"], r["col_b"]): (r["n_pairs"], r["corr"])
           for r in out.collect()}
    assert got[("a", "b")] == (50, 1.0)       # perfectly linear
    assert got[("a", "c")] == (50, -1.0)
    assert got[("a", "d")][0] == 25           # pairwise deletion
    # one aggregate pass: no Exchange beyond the single global agg, no joins
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    import pytest as _pt
    with _pt.raises(ValueError):
        corr_matrix(df, ["a"])


def test_validate_rows_and_quarantine(spark):
    from simba_spark.operators.pipeline import quarantine, validate_rows

    df = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, None, "ok"), (3, -1.0, None), (4, 2.0, "bad")],
        "id long, v double, tag string")
    rules = {
        "v_pos": F.col("v") > 0,                  # NULL v -> fail
        "tag_ok": F.col("tag").isin("ok"),        # NULL tag -> fail
    }
    got = {r["id"]: list(r["failed_rules"])
           for r in validate_rows(df, rules).collect()}
    assert got == {
        1: [],
        2: ["v_pos"],                # NULL predicate counts as failure
        3: ["tag_ok", "v_pos"],      # negative value AND null tag
        4: ["tag_ok"],
    }
    clean, bad = quarantine(df, rules)
    assert sorted(r["id"] for r in clean.collect()) == [1]
    assert "failed_rules" not in clean.columns
    assert sorted(r["id"] for r in bad.collect()) == [2, 3, 4]
    import pytest as _pt
    with _pt.raises(ValueError):
        validate_rows(df, {})


def test_quantile_bin_grouped(spark):
    from simba_spark.operators.pipeline import quantile_bin

    rows = ([(i, "a", float(i)) for i in range(100)]
            + [(1000 + i, "b", float(1000 + i)) for i in range(100)])
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = quantile_bin(df, "v", "id", nbins=4, k=512, group_by=["g"])
    got = {(r["g"], r["id"]): r["v_bin"] for r in out.collect()}
    from collections import Counter
    for g in ("a", "b"):
        c = Counter(b for (gg, _), b in got.items() if gg == g)
        # per-group equal-frequency: group b's large values bin 0..3
        # within b, not all into the global top bin
        assert set(c) == {0, 1, 2, 3}
        assert all(abs(c[b] - 25) <= 1 for b in c)


def test_scd2_build_versions_and_validity(spark):
    from simba_spark.operators.pipeline import scd2_build

    rows = [
        # key 1: A @10, A @20 (dup, collapses), B @30, B @40 (dup), A @50
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "B"), (1, 50, "A"),
        # key 2: single version; NULL attr transitions count as changes
        (2, 10, None), (2, 20, None), (2, 30, "X"),
        # dropped: NULL key / NULL ts
        (None, 10, "Z"), (3, None, "Z"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, attr string")
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["attr"])
        for r in scd2_build(df, "k", "ts", ["attr"]).collect()
    )
    assert got == [
        (1, 10, 30, "A"),
        (1, 30, 50, "B"),
        (1, 50, None, "A"),
        (2, 10, 30, None),      # null-safe: NULL==NULL collapses
        (2, 30, None, "X"),
    ]


def test_scd2_build_partitioning_invariant_with_tiebreak(spark):
    from simba_spark.operators.pipeline import scd2_build

    rows = [(i % 5, (i * 7) % 40, i, f"v{(i * 3) % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, attr string")
    a = sorted(map(tuple, scd2_build(
        df, "k", "ts", ["attr"], tiebreak_col="seq").collect()))
    b = sorted(map(tuple, scd2_build(
        df.repartition(11), "k", "ts", ["attr"], tiebreak_col="seq").collect()))
    assert a == b


def test_scd2_point_in_time_via_asof(spark):
    """Composition: asof_join against the scd2_build timeline answers
    'what was the attribute at time t' — the backward as-of pick on
    valid_from must agree with the [valid_from, valid_to) interval
    containing t."""
    from simba_spark.operators.asof import asof_join
    from simba_spark.operators.pipeline import scd2_build

    hist = spark.createDataFrame(
        [(1, 10, "A"), (1, 30, "B"), (1, 50, "A"),
         (2, 20, "X"), (2, 60, "Y")],
        "k long, ts long, attr string")
    dim = scd2_build(hist, "k", "ts", ["attr"])
    probes = spark.createDataFrame(
        [(1, 10), (1, 29), (1, 30), (1, 49), (1, 99),
         (2, 19), (2, 20), (2, 61)],
        "k long, t long")
    got = {(r["k"], r["t"]): r["r_attr"] for r in asof_join(
        probes, dim.select("k", "valid_from", "attr"),
        on="k", left_time="t", right_time="valid_from").collect()}
    assert got == {
        (1, 10): "A", (1, 29): "A", (1, 30): "B", (1, 49): "B",
        (1, 99): "A",
        (2, 19): None,     # before the first version
        (2, 20): "X", (2, 61): "Y",
    }
    # interval check: every probe with an answer falls inside its
    # version's [valid_from, valid_to)
    vers = [(r["k"], r["valid_from"], r["valid_to"], r["attr"])
            for r in dim.collect()]
    for (k, t), attr in got.items():
        if attr is None:
            continue
        assert any(kk == k and f <= t and (to is None or t < to)
                   and a == attr for kk, f, to, a in vers)


# ---------------------------------------------------------------------------
# rank normalization


def test_rank_normalize_percent_rank_semantics(spark):
    from simba_spark.operators.pipeline import rank_normalize

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 40.0), (5, None)],
        "id long, x double",
    )
    out = {r["id"]: r["x_pr"] for r in rank_normalize(df, "x").collect()}
    # n=4 non-null; ranks: 10→1, 20→2 (both), 40→4
    assert out == {
        1: 0.0,
        2: round(1 / 3, 6),
        3: round(1 / 3, 6),
        4: 1.0,
        5: None,
    }


def test_rank_normalize_single_value_and_invariance(spark):
    from simba_spark.operators.pipeline import rank_normalize

    one = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, x double")
    got = {r["id"]: r["x_pr"] for r in rank_normalize(one, "x").collect()}
    assert got == {1: 0.0, 2: 0.0}  # single distinct value → 0.0

    df = spark.range(500).select(
        F.col("id"), ((F.col("id") * 37) % 101).cast("double").alias("x")
    )
    a = {r["id"]: r["x_pr"] for r in rank_normalize(df, "x").collect()}
    b = {r["id"]: r["x_pr"]
         for r in rank_normalize(df.repartition(13), "x").collect()}
    assert a == b


def test_rank_normalize_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.pipeline import (rank_normalize,
                                                rank_normalize_sql)

    df = spark.range(400).select(
        F.col("id"),
        F.when(F.col("id") % 19 == 0, None)
        .otherwise((F.col("id") * F.col("id")) % 83)
        .cast("double")
        .alias("x"),
    )
    got = {r["id"]: r["x_pr"] for r in rank_normalize(df, "x").collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = dict(
        con.sql(
            f"SELECT id, x_pr FROM ({rank_normalize_sql('t', 'x')})"
        ).fetchall()
    )
    assert got == want


def test_scd2_lookup_picks_valid_version(spark):
    from simba_spark.operators.pipeline import scd2_build, scd2_lookup

    hist = spark.createDataFrame(
        [(1, 10, "A"), (1, 30, "B"), (1, 50, "A"),
         (2, 20, "X"), (2, 60, "Y")],
        "k long, ts long, attr string")
    dim = scd2_build(hist, "k", "ts", ["attr"])
    facts = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 29), (102, 1, 30), (103, 1, 99),
         (104, 2, 19), (105, 2, 20), (106, 2, 61)],
        "fid long, k long, t long")
    got = {(r["fid"]): (r["attr"], r["valid_from"]) for r in
           scd2_lookup(facts, dim, key_fact="k", ts_fact="t").collect()}
    assert got == {
        100: ("A", 10), 101: ("A", 10), 102: ("B", 30),
        103: ("A", 50), 105: ("X", 20), 106: ("Y", 60),
    }  # 104 (before key 2's first version) drops on inner
    left = scd2_lookup(facts, dim, key_fact="k", ts_fact="t",
                       how="left").collect()
    assert len(left) == 7
    assert [r["attr"] for r in left if r["fid"] == 104] == [None]
    # exactly-one-version: inner row count == matched fact count
    assert len(scd2_lookup(facts, dim, "k", "t").collect()) == 6


def test_scd2_lookup_validation(spark):
    import pytest as _pt

    from simba_spark.operators.pipeline import scd2_lookup

    dim = spark.createDataFrame(
        [(1, 0, None, "A")],
        "k long, valid_from long, valid_to long, t string")
    facts = spark.createDataFrame([(1, 5)], "k long, t long")
    with _pt.raises(ValueError, match="overlapping"):
        scd2_lookup(facts, dim, "k", "t")
    with _pt.raises(ValueError, match="how"):
        scd2_lookup(facts, dim.withColumnRenamed("t", "attr"),
                    "k", "t", how="full")


def test_impute_mean_grouped_and_all_null_group(spark):
    from simba_spark.operators.pipeline import impute

    rows = [("a", 1.0), ("a", 3.0), ("a", None), ("a", float("nan")),
            ("b", None), ("b", None), ("c", 7.0), ("c", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r["g"], r["x"]) for r in
           impute(df, ["x"], "mean", group_by=["g"]).collect()}
    # a: mean(1,3)=2 fills NULL and NaN; b: all-null stays null; c: 7
    assert got == {("a", 1.0), ("a", 3.0), ("a", 2.0),
                   ("b", None), ("c", 7.0)}
    n_a = [r["x"] for r in
           impute(df, ["x"], "mean", group_by=["g"])
           .filter("g = 'a'").collect()]
    assert sorted(n_a) == [1.0, 2.0, 2.0, 3.0]


def test_impute_mode_and_constant(spark):
    import pytest as _pt

    from simba_spark.operators.pipeline import impute

    rows = [(1.0,), (2.0,), (2.0,), (3.0,), (3.0,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    # mode tie 2 vs 3 -> min value wins deterministically
    got = sorted(r["x"] for r in impute(df, ["x"], "mode").collect())
    assert got == [1.0, 2.0, 2.0, 2.0, 3.0, 3.0]
    got2 = sorted(r["x"] for r in
                  impute(df, ["x"], "constant",
                         fill_map={"x": -1.0}).collect())
    assert got2 == [-1.0, 1.0, 2.0, 2.0, 3.0, 3.0]
    with _pt.raises(ValueError):
        impute(df, ["x"], "constant")
    with _pt.raises(ValueError):
        impute(df, ["x"], "bogus")


def test_impute_median_grouped(spark):
    import pytest as _pt

    from simba_spark.operators.pipeline import impute

    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
    rows += [("a", 90, None), ("b", 91, None), ("b", 92, 7.0)]
    df = spark.createDataFrame(rows, "g string, rid long, x double")
    out = {(r["g"], r["rid"]): r["x"] for r in
           impute(df, ["x"], "median", group_by=["g"],
                  id_col="rid").collect()}
    # below-k group -> exact median: a's median of [1,2,3,4,100] = 3
    assert out[("a", 90)] == 3.0
    assert out[("b", 91)] == 7.0  # single-value group
    assert out[("a", 4)] == 100.0  # non-null rows untouched
    with _pt.raises(ValueError, match="id_col"):
        impute(df, ["x"], "median")


# --- dataset fingerprint -----------------------------------------------------

def test_dataset_fingerprint_order_insensitive_and_sensitive_to_rows(spark):
    from simba_spark.operators.pipeline import dataset_fingerprint

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 0.0)],
        "k long, s string, v double",
    )
    a = dataset_fingerprint(df).first()
    b = dataset_fingerprint(df.repartition(7).orderBy(F.desc("k"))).first()
    assert (a.n_rows, a.content_hash) == (b.n_rows, b.content_hash)
    # NULL is distinct from the string "null" / empty
    c = dataset_fingerprint(
        df.withColumn("s", F.coalesce("s", F.lit("null")))).first()
    assert c.content_hash != a.content_hash
    # any changed cell changes the hash; a removed row changes it too
    d = dataset_fingerprint(df.filter("k <> 2")).first()
    assert (d.n_rows, d.content_hash) != (a.n_rows, a.content_hash)
    # duplicate rows are counted (multiset, not set)
    e = dataset_fingerprint(df.unionAll(df.filter("k = 1"))).first()
    assert e.n_rows == 4 and e.content_hash != a.content_hash
    # empty frame: stable (0, 0)
    z = dataset_fingerprint(df.filter("k < 0")).first()
    assert (z.n_rows, z.content_hash) == (0, 0)


def test_dataset_fingerprint_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.pipeline import (dataset_fingerprint,
                                                dataset_fingerprint_sql)

    rows = [(i, f"s{i % 5}", float(i) / 3.0 if i % 4 else None)
            for i in range(500)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    got = dataset_fingerprint(df, ["k", "s", "v"]).first()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "s", "v"]))
    o = con.execute(dataset_fingerprint_sql("t", ["k", "s", "v"])).fetchone()
    assert (got.n_rows, got.content_hash) == tuple(o)


# --- temperature_mixture ------------------------------------------------------

def test_temperature_mixture_semantics(spark):
    from simba_spark.operators.pipeline import temperature_mixture

    rows = ([(i, "en") for i in range(900)]
            + [(i + 1000, "fr") for i in range(90)]
            + [(i + 2000, "sw") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    # alpha=1 keeps the natural mix (every rate 1.0)
    nat = temperature_mixture(df, "lang", "doc_id", alpha=1.0)
    assert nat.count() == 1000

    # alpha=0 forces uniform: every source downsampled to ~n_min
    import collections
    uni = collections.Counter(
        r.lang for r in
        temperature_mixture(df, "lang", "doc_id", alpha=0.0).collect())
    assert uni["sw"] == 10                       # binding source keeps 100%
    assert 2 <= uni["fr"] <= 22 and 2 <= uni["en"] <= 25  # ~10 each

    # intermediate alpha sits between: en keeps (10/900)^0.5 ~ 10.5%
    mid = collections.Counter(
        r.lang for r in
        temperature_mixture(df, "lang", "doc_id", alpha=0.5).collect())
    assert uni["en"] < mid["en"] < 900

    # determinism across partitioning
    a = sorted(r.doc_id for r in
               temperature_mixture(df, "lang", "doc_id", alpha=0.5).collect())
    b = sorted(r.doc_id for r in
               temperature_mixture(df.repartition(13), "lang", "doc_id",
                                   alpha=0.5).collect())
    assert a == b

    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_mixture(df, "lang", "doc_id", alpha=1.5)


def test_temperature_mixture_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.pipeline import (temperature_mixture,
                                                temperature_mixture_sql)

    rows = ([(i, "en") for i in range(300)]
            + [(i + 1000, "fr") for i in range(70)]
            + [(i + 2000, "sw") for i in range(13)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted((r.doc_id, r.lang) for r in
                 temperature_mixture(df, "lang", "doc_id", alpha=0.3)
                 .select("doc_id", "lang").collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "lang"]))
    oracle = sorted(map(tuple, con.execute(temperature_mixture_sql(
        "docs", "lang", "doc_id", alpha=0.3,
        select="t.doc_id, t.lang")).fetchall()))
    assert got == oracle


# --- scd2_apply (incremental SCD2 merge) ---------------------------------------

def test_scd2_apply_equals_full_rebuild(spark):
    from simba_spark.operators.pipeline import scd2_apply, scd2_build

    rows = [
        # key 1: s1 -> s2 -> s2(dup) -> s3 across the split
        (1, 10, "s1"), (1, 20, "s2"), (1, 35, "s2"), (1, 50, "s3"),
        # key 2: entirely before the split (untouched by the batch)
        (2, 10, "a"), (2, 30, "b"),
        # key 3: appears only in the batch
        (3, 60, "x"), (3, 70, "y"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    full = scd2_build(df, "k", "ts", ["s"], tiebreak_col="ts")
    old = scd2_build(df.filter("ts < 40"), "k", "ts", ["s"],
                     tiebreak_col="ts")
    merged = scd2_apply(old, df.filter("ts >= 40"), "k", "ts", ["s"],
                        tiebreak_col="ts")
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, full.collect())))


def test_scd2_apply_late_arrival_and_noop(spark):
    from simba_spark.operators.pipeline import scd2_apply, scd2_build

    hist = spark.createDataFrame(
        [(1, 10, "s1"), (1, 30, "s2")], "k long, ts long, s string")
    dim = scd2_build(hist, "k", "ts", ["s"], tiebreak_col="ts")

    # late arrival lands MID-timeline and splits the s1 version
    late = spark.createDataFrame([(1, 20, "sX")], "k long, ts long, s string")
    got = sorted(map(tuple, scd2_apply(
        dim, late, "k", "ts", ["s"], tiebreak_col="ts").collect()))
    assert got == [(1, "s1", 10, 20), (1, "s2", 30, None),
                   (1, "sX", 20, 30)]

    # a batch row repeating the open version's attrs is a no-op
    # (collapses into it) rather than opening a new version
    noop = spark.createDataFrame([(1, 99, "s2")], "k long, ts long, s string")
    got = sorted(map(tuple, scd2_apply(
        dim, noop, "k", "ts", ["s"], tiebreak_col="ts").collect()))
    assert got == [(1, "s1", 10, 30), (1, "s2", 30, None)]

    # untouched keys pass through byte-for-byte
    other = spark.createDataFrame(
        [(2, 5, "z1"), (2, 9, "z2")], "k long, ts long, s string")
    dim2 = scd2_build(hist.unionByName(other), "k", "ts", ["s"],
                      tiebreak_col="ts")
    got = sorted(map(tuple, scd2_apply(
        dim2, late, "k", "ts", ["s"], tiebreak_col="ts").collect()))
    assert (2, "z1", 5, 9) in got and (2, "z2", 9, None) in got


def test_scd2_apply_delete_semantics(spark):
    from simba_spark.operators.pipeline import scd2_apply, scd2_build

    hist = spark.createDataFrame(
        [(1, 10, "s1"), (1, 30, "s2"), (2, 10, "a")],
        "k long, ts long, s string")
    dim = scd2_build(hist, "k", "ts", ["s"], tiebreak_col="ts")

    # delete closes the open version and leaves the key with none open
    batch = spark.createDataFrame(
        [(1, 50, None, True)], "k long, ts long, s string, del boolean")
    got = sorted(map(tuple, scd2_apply(
        dim, batch, "k", "ts", ["s"], tiebreak_col="ts",
        delete_col="del").collect()))
    assert got == [(1, "s1", 10, 30), (1, "s2", 30, 50), (2, "a", 10, None)]

    # delete then re-insert of the SAME attrs re-opens a NEW version
    # (the tombstone is a change boundary), with a gap in between
    batch2 = spark.createDataFrame(
        [(1, 50, None, True), (1, 70, "s2", False)],
        "k long, ts long, s string, del boolean")
    got = sorted(map(tuple, scd2_apply(
        dim, batch2, "k", "ts", ["s"], tiebreak_col="ts",
        delete_col="del").collect()))
    assert got == [(1, "s1", 10, 30), (1, "s2", 30, 50),
                   (1, "s2", 70, None), (2, "a", 10, None)]

    # mid-timeline (late) delete opens a gap inside the history
    batch3 = spark.createDataFrame(
        [(1, 20, None, True)], "k long, ts long, s string, del boolean")
    got = sorted(map(tuple, scd2_apply(
        dim, batch3, "k", "ts", ["s"], tiebreak_col="ts",
        delete_col="del").collect()))
    assert got == [(1, "s1", 10, 20), (1, "s2", 30, None),
                   (2, "a", 10, None)]

    # consecutive deletes collapse; delete for an unknown key vanishes;
    # NULL delete flag means false (a plain change event)
    batch4 = spark.createDataFrame(
        [(1, 50, None, True), (1, 60, None, True),
         (9, 10, None, True), (2, 40, "b", None)],
        "k long, ts long, s string, del boolean")
    got = sorted(map(tuple, scd2_apply(
        dim, batch4, "k", "ts", ["s"], tiebreak_col="ts",
        delete_col="del").collect()))
    assert got == [(1, "s1", 10, 30), (1, "s2", 30, 50),
                   (2, "a", 10, 40), (2, "b", 40, None)]

    # delete_col=None path unchanged (regression vs the plain form)
    plain = spark.createDataFrame([(1, 50, "s3")], "k long, ts long, s string")
    a = sorted(map(tuple, scd2_apply(
        dim, plain, "k", "ts", ["s"], tiebreak_col="ts").collect()))
    assert a == [(1, "s1", 10, 30), (1, "s2", 30, 50),
                 (1, "s3", 50, None), (2, "a", 10, None)]
