"""resample: dense bucket emission, fill policies, the span guard."""

import pytest
from pyspark.sql import functions as F

from simba_spark.operators.timeseries import resample


def test_resample_dense_and_fill_policies(spark):
    rows = [
        # key 1: buckets 0, 3 occupied — 1, 2 are gaps
        (1, 5, 10.0), (1, 8, 20.0), (1, 35, 40.0),
        # key 2: single bucket
        (2, 12, 7.0),
    ]
    df = spark.createDataFrame(rows, "k int, t long, v double")
    out = resample(
        df, ts_col="t", key_col="k", bucket_us=10,
        aggs={
            "n": F.count(F.lit(1)),
            "sv": F.sum("v"),
            "lv": F.expr("max_by(v, t)"),
        },
        zero_fill=["n"], ffill=["lv"],
    ).orderBy("k", "bucket")
    got = [(r.k, r.bucket, r.n, r.sv, r.lv) for r in out.collect()]
    assert got == [
        (1, 0, 2, 30.0, 20.0),
        (1, 1, 0, None, 20.0),   # gap: count zero-filled, sum null, lv carried
        (1, 2, 0, None, 20.0),
        (1, 3, 1, 40.0, 40.0),
        (2, 1, 1, 7.0, 7.0),
    ]


def test_resample_timestamp_input(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1.0), (1, "2024-01-01 03:40:00", 2.0)],
        "k int, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = resample(
        df, ts_col="ts", key_col="k", bucket_us=3_600_000_000,
        zero_fill=["n_events"],
    )
    rows = sorted((r.bucket, r.n_events) for r in out.collect())
    # 4 consecutive hourly buckets, two occupied
    assert len(rows) == 4
    assert [n for _, n in rows] == [1, 0, 0, 1]
    assert rows[-1][0] - rows[0][0] == 3


def test_resample_span_guard_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 10_000_000, 1.0)], "k int, t long, v double"
    )
    with pytest.raises(Exception, match="max_buckets_per_key"):
        resample(
            df, ts_col="t", key_col="k", bucket_us=1,
            max_buckets_per_key=1000,
        ).count()


def test_resample_unknown_fill_col_raises(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "k int, t long, v double")
    with pytest.raises(ValueError, match="not an agg output"):
        resample(df, ts_col="t", key_col="k", bucket_us=10, zero_fill=["nope"])


def test_tfidf_topk_ranks_rare_terms(spark):
    from simba_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common common"),
            (2, "banana cherry common common"),
            (3, "common words only here common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, top_n=2)
    rows = {(r.doc_id, r.rn): (r.term, r.tf) for r in out.collect()}
    # every doc contributes exactly top_n rows
    assert len(rows) == 6
    # 'apple' (df=1, tf=2) must outrank 'common' (df=3) for doc 1
    assert rows[(1, 1)][0] == "apple"
    # doc 2: 'common' (tf=2, idf=ln(4/4)+1=1 → 2.0) outranks
    # 'cherry' (tf=1, idf=ln(4/2)+1≈1.693)
    assert rows[(2, 1)][0] == "common"
    assert rows[(2, 2)][0] == "cherry"
    # determinism: re-run identical
    again = {(r.doc_id, r.rn): (r.term, r.tf) for r in tfidf_topk(docs, top_n=2).collect()}
    assert rows == again


def test_stratified_sample_rates_and_nesting(spark):
    from simba_spark.operators.pipeline import hash_sample, stratified_sample

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(
        df, "source", {"s0": 0.5, "s1": 0.1}, key_col="doc_id",
        seed=9, default_rate=0.9,
    )
    by_src = {r.source: r.n for r in out.groupBy("source").count()
              .withColumnRenamed("count", "n").collect()}
    assert 380 <= by_src["s0"] <= 620        # ~500 of 1000
    assert 50 <= by_src["s1"] <= 160         # ~100
    assert 820 <= by_src["s2"] <= 960        # default 0.9 → ~900
    # nesting: raising every rate only ADDS rows (same key hash)
    small = {r.doc_id for r in stratified_sample(
        df, "source", {"s0": 0.2}, key_col="doc_id", seed=9,
        default_rate=0.05).collect()}
    big = {r.doc_id for r in stratified_sample(
        df, "source", {"s0": 0.6}, key_col="doc_id", seed=9,
        default_rate=0.5).collect()}
    assert small <= big
    # a uniform rate map reduces to hash_sample exactly
    uni = {r.doc_id for r in stratified_sample(
        df, "source", {}, key_col="doc_id", seed=9, default_rate=0.3).collect()}
    hs = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, seed=9).collect()}
    assert uni == hs


def test_merge_upsert_semantics(spark):
    from simba_spark.operators.pipeline import merge_upsert

    tgt = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 5), (3, "c", 1)], "k long, v string, ver int"
    )
    upd = spark.createDataFrame(
        [(1, "A", 2), (2, "OLD", 3), (4, "D", 1)], "k long, v string, ver int"
    )
    # plain: updates always win, unmatched pass through both ways
    got = {r.k: r.v for r in merge_upsert(tgt, upd, "k").collect()}
    assert got == {1: "A", 2: "OLD", 3: "c", 4: "D"}
    # versioned: an older update must NOT clobber a newer target row
    got = {r.k: r.v for r in merge_upsert(tgt, upd, "k", version_col="ver").collect()}
    assert got == {1: "A", 2: "b", 3: "c", 4: "D"}
    # tombstones delete keys
    upd2 = spark.createDataFrame(
        [(1, "A", 2, True), (4, "D", 1, False)],
        "k long, v string, ver int, del boolean",
    )
    got = {r.k: r.v for r in merge_upsert(tgt, upd2, "k", tombstone_col="del").collect()}
    assert got == {2: "b", 3: "c", 4: "D"}
    assert "del" not in merge_upsert(tgt, upd2, "k", tombstone_col="del").columns


def test_bmp_codec_palette_32bit_topdown_and_16bit_pgm():
    """The decode paths beyond 24-bit bottom-up: 8-bit palette BMP,
    32-bit BGRA, negative-height (top-down) rows, and 16-bit PGM."""
    import struct

    import numpy as np

    from simba_spark.operators.multimodal import bmp_codec

    def make_bmp(w, h, bpp, pixel_bytes, palette=b"", top_down=False):
        hdr_off = 14 + 40 + len(palette)
        stride = ((w * bpp // 8) + 3) & ~3
        body = bytearray()
        for row in pixel_bytes:
            body += row + b"\x00" * (stride - len(row))
        hh = -h if top_down else h
        return (
            struct.pack("<2sIHHI", b"BM", hdr_off + len(body), 0, 0, hdr_off)
            + struct.pack("<IiiHHIIiiII", 40, w, hh, 1, bpp, 0, len(body),
                          2835, 2835, len(palette) // 4, 0)
            + palette + bytes(body)
        )

    # 8-bit palette: 2 entries — BGRA(0,0,255)=red, BGRA(255,255,255)=white
    pal = bytes([0, 0, 255, 0, 255, 255, 255, 0])
    # bottom-up: file rows are (bottom) [1,1] then (top) [0,0]
    bmp8 = make_bmp(2, 2, 8, [bytes([1, 1]), bytes([0, 0])], palette=pal)
    d = bmp_codec(bmp8)
    # palette entries resolve to RGB (alpha byte dropped)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    # top row red (luma .299), bottom row white (1.0)
    assert abs(d["mean_luma"] - (0.299 + 1.0) / 2) < 1e-6

    # 32-bit BGRA solid blue (row = exactly w pixels)
    px = bytes([255, 0, 0, 0]) * 2  # BGRA blue
    bmp32 = make_bmp(2, 1, 32, [px], top_down=True)
    d = bmp_codec(bmp32)
    assert (d["width"], d["height"], d["channels"]) == (2, 1, 4)
    assert abs(d["mean_luma"] - 0.114) < 1e-6

    # orientation is observable through nearest-neighbor resize to 1x1
    # (it samples the TOP-left pixel): logical image = red top row,
    # white bottom row, encoded both bottom-up and top-down
    from simba_spark.operators.multimodal import bmp_resize_codec

    red_row = bytes([0, 0, 255] * 2)    # BGR red
    white_row = bytes([255, 255, 255] * 2)
    bottom_up = make_bmp(2, 2, 24, [white_row, red_row])          # file: bottom first
    top_down = make_bmp(2, 2, 24, [red_row, white_row], top_down=True)
    for payload in (bottom_up, top_down):
        top_left = bmp_codec(bmp_resize_codec(payload, 1, 1))
        assert abs(top_left["mean_luma"] - 0.299) < 1e-6  # red, not white

    # 16-bit PGM: maxval 65535, values scale down to 8-bit
    pgm16 = b"P5\n2 1\n65535\n" + struct.pack(">HH", 65535, 0)
    d = bmp_codec(pgm16)
    assert (d["width"], d["height"], d["channels"]) == (2, 1, 1)
    assert abs(d["mean_luma"] - 0.5) < 1e-2


def test_merge_upsert_tiebreak_and_guard(spark):
    from simba_spark.operators.pipeline import merge_upsert

    tgt = spark.createDataFrame([(1, "a", 0, 0)], "k long, v string, ver int, seq int")
    upd = spark.createDataFrame(
        [(1, "x", 1, 10), (1, "y", 1, 20)], "k long, v string, ver int, seq int"
    )
    # version tie between the two updates: greatest tiebreak wins
    got = merge_upsert(tgt, upd, "k", version_col="ver",
                       tiebreak_col="seq").collect()
    assert len(got) == 1 and got[0].v == "y"
    # reserved names guarded
    import pytest as _pytest

    bad = tgt.withColumnRenamed("seq", "__src")
    with _pytest.raises(ValueError, match="reserved"):
        merge_upsert(bad, bad, "k")


def test_resample_randomized_bruteforce(spark):
    """Randomized equivalence vs a Python brute force across keys,
    gaps, and both fill policies."""
    import random
    from collections import defaultdict

    rng = random.Random(31)
    rows = [(rng.randrange(6), rng.randrange(200), round(rng.uniform(0, 9), 3))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "k int, t long, v double")
    out = resample(
        df, ts_col="t", key_col="k", bucket_us=17,
        aggs={"n": F.count(F.lit(1)), "mx": F.max("v")},
        zero_fill=["n"], ffill=["mx"],
    )
    got = {(r.k, r.bucket): (r.n, r.mx) for r in out.collect()}

    by = defaultdict(list)
    for k, t, v in rows:
        by[(k, t // 17)].append(v)
    exp = {}
    for k in {r[0] for r in rows}:
        bks = [b for (kk, b) in by if kk == k]
        carried = None
        for b in range(min(bks), max(bks) + 1):
            vs = by.get((k, b), [])
            if vs:
                carried = max(vs)
            exp[(k, b)] = (len(vs), carried)
    assert got == exp and len(exp) > 50


def test_resample_large_magnitude_exact_bucketing(spark):
    """ADVICE r4: bucket index uses exact integer floor division — a
    double round-trip mis-buckets near boundaries above 2^53. Also
    covers negative times (floor, not truncate-toward-zero)."""
    big = (1 << 60) + 3  # not representable in double
    rows = [(1, big, 1.0), (1, big + 7, 2.0), (2, -13, 3.0), (2, -1, 4.0)]
    df = spark.createDataFrame(rows, "k int, t long, v double")
    out = resample(
        df, ts_col="t", key_col="k", bucket_us=10,
        aggs={"n": F.count(F.lit(1))},
    )
    got = {(r.k, r.bucket): r.n for r in out.collect()}
    exp = {}
    from collections import Counter
    c = Counter((k, t // 10) for k, t, _ in rows)
    for (k, b), n in c.items():
        exp[(k, b)] = n
    # dense span fills gaps with rows too (n null -> no zero_fill here)
    for (k, b) in list(got):
        if (k, b) not in exp:
            assert got[(k, b)] is None
            del got[(k, b)]
    assert got == exp
    # t=-13 -> bucket -2, t=-1 -> bucket -1 (floor semantics)
    assert (2, -2) in exp and (2, -1) in exp


def test_chunk_documents_bruteforce(spark):
    """Chunking vs a pure-Python oracle: starts at multiples of stride,
    chunk_tokens window, short tails dropped unless chunk 0."""
    from simba_spark.operators.text import chunk_documents

    docs = [
        (0, "a b c d e f g h i j k"),          # 11 tokens
        (1, "x y"),                              # single short chunk kept
        (2, " ".join(f"t{i}" for i in range(25))),
        (3, "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=6, stride=4, min_tail_tokens=3)
    got = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
           for r in out.collect()}
    exp = {}
    for did, text in docs:
        toks = text.lower().split()
        for ci, s in enumerate(range(0, len(toks), 4)):
            ch = toks[s:s + 6]
            if ci == 0 or len(ch) >= 3:
                exp[(did, ci)] = (len(ch), " ".join(ch))
    assert got == exp


def test_dup_ngram_fraction_bruteforce(spark):
    """Duplicated-n-gram fraction vs a pure-Python oracle."""
    from collections import Counter

    from simba_spark.operators.dedup import dup_ngram_fraction

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox leaps over a lazy dog"),
        (2, "completely different words here entirely now friends"),
        (3, "short text"),                        # < n tokens: excluded
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dup_ngram_fraction(df, n=3, min_doc_count=2)
    got = {r.doc_id: (r.n_grams, r.n_dup, round(r.dup_frac, 9))
           for r in out.collect()}

    gram_docs = {}
    per_doc = {}
    for did, text in docs:
        toks = text.lower().split()
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        if len(toks) < 3:
            continue
        per_doc[did] = grams
        for gset in set(grams):
            gram_docs.setdefault(gset, set()).add(did)
    exp = {}
    for did, grams in per_doc.items():
        dup = sum(1 for g in grams if len(gram_docs[g]) >= 2)
        exp[did] = (len(grams), dup, round(dup / len(grams), 9))
    assert got == exp
    assert 3 not in got
    # docs 0 and 4 are exact dups: every gram duplicated
    assert got[0][2] == 1.0 and got[4][2] == 1.0


def test_resample_interp_linear_and_edges(spark):
    """Linear interpolation across empty buckets; leading/trailing
    gaps without a bracketing value stay NULL; multi-bucket gaps
    interpolate proportionally to bucket distance."""
    rows = [
        # key 1: values at buckets 1 and 4 -> buckets 2, 3 interpolate
        # to 1/3 and 2/3 of the way; bucket 0 has a row but NULL v
        (1, 5, None), (1, 15, 3.0), (1, 45, 9.0),
        # key 2: single value -> nothing to interpolate
        (2, 12, 7.0), (2, 31, None),
    ]
    df = spark.createDataFrame(rows, "k int, t long, v double")
    out = resample(
        df, ts_col="t", key_col="k", bucket_us=10,
        aggs={"av": F.avg("v")}, interp=["av"],
    ).orderBy("k", "bucket")
    got = [(r.k, r.bucket, r.av) for r in out.collect()]
    assert got == [
        (1, 0, None),          # leading gap: no previous value
        (1, 1, 3.0),
        (1, 2, 5.0),           # 3 + (9-3) * 1/3
        (1, 3, 7.0),           # 3 + (9-3) * 2/3
        (1, 4, 9.0),
        (2, 1, 7.0),
        (2, 2, None),          # trailing gap: no next value
        (2, 3, None),
    ]


def test_resample_interp_overlap_raises(spark):
    import pytest as _pt

    df = spark.createDataFrame([(1, 5, 1.0)], "k int, t long, v double")
    with _pt.raises(ValueError):
        resample(df, ts_col="t", key_col="k", bucket_us=10,
                 aggs={"av": F.avg("v")}, ffill=["av"], interp=["av"])


def test_ewma_matches_pandas_bounded(spark):
    """ewma == pandas ewm(alpha, adjust=True).mean() computed over each
    row's last-`window` slice, per key, deterministic under
    repartitioning."""
    import random

    import pandas as pd

    from simba_spark.operators.timeseries import ewma

    rng = random.Random(6)
    rows = [(i, i % 3, i * 10, rng.uniform(-5, 5) if i % 11 else None)
            for i in range(120)]
    df = spark.createDataFrame(rows, "event_id long, k int, t long, v double")
    out = ewma(df, ts_col="t", key_col="k", value_col="v",
               alpha=0.4, window=5, tiebreak_col="event_id")
    got = {r["event_id"]: r["ewma"] for r in out.collect()}
    # reference: per key, ordered, last-5 slice through pandas ewm
    bykey = {}
    for i, k, t, v in rows:
        if v is not None:
            bykey.setdefault(k, []).append((t, i, v))
    want = {}
    for k, seq in bykey.items():
        seq.sort()
        vals = [v for _, _, v in seq]
        for pos, (_, i, _) in enumerate(seq):
            s = pd.Series(vals[max(0, pos - 4):pos + 1])
            want[i] = s.ewm(alpha=0.4, adjust=True).mean().iloc[-1]
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9, i
    # NULL rows dropped
    assert all(i % 11 for i in got)
    b = {r["event_id"]: r["ewma"] for r in
         ewma(df.repartition(9), ts_col="t", key_col="k", value_col="v",
              alpha=0.4, window=5, tiebreak_col="event_id").collect()}
    assert got == b


# ---------------------------------------------------------------------------
# incremental rollup (continuous aggregate)


def test_rollup_merge_equals_direct_any_split(spark):
    """The exact-partials merge property: rollup over any batch split,
    merged in any order, equals the direct rollup bit-for-bit."""
    from simba_spark.operators.timeseries import (rollup_finalize,
                                                  rollup_merge, rollup_state)

    ev = spark.range(600).select(
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 733) % 500000
        ).alias("ts"),
        (F.col("id") % 3).cast("string").alias("k"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise(F.round((F.col("id") % 89) * 0.37, 2))
        .alias("value"),
    )
    direct = rollup_finalize(
        rollup_state(ev, bucket="hour", keys=["k"])
    )
    # three arbitrary batches, merged pairwise then with the third
    parts = [
        ev.filter(F.col("ts").cast("long") % 3 == i) for i in (0, 1, 2)
    ]
    states = [rollup_state(p, bucket="hour", keys=["k"]) for p in parts]
    merged = rollup_finalize(
        rollup_merge(rollup_merge(states[0], states[1]), states[2])
    )
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_rollup_finalize_values_and_nulls(spark):
    import datetime as dt

    from simba_spark.operators.timeseries import (rollup_finalize,
                                                  rollup_state)

    ev = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 5, 10), "a", 1.0),
            (dt.datetime(2024, 1, 1, 5, 20), "a", 3.0),
            (dt.datetime(2024, 1, 1, 5, 30), "a", None),  # excluded
            (dt.datetime(2024, 1, 1, 6, 10), "a", 10.0),
        ],
        "ts timestamp, k string, value double",
    )
    out = {
        (r["bucket_ts"].hour, r["k"]): r
        for r in rollup_finalize(
            rollup_state(ev, bucket="hour", keys=["k"])
        ).collect()
    }
    r5 = out[(5, "a")]
    assert r5["n"] == 2 and r5["vsum"] == 4.0 and r5["vavg"] == 2.0
    assert r5["vvar"] == 1.0  # population var of {1, 3}
    assert r5["vmin"] == 1.0 and r5["vmax"] == 3.0
    assert out[(6, "a")]["n"] == 1 and out[(6, "a")]["vvar"] == 0.0


# ---------------------------------------------------------------------------
# Seasonal-naive forecast


def test_forecast_seasonal_naive_hand_computed(spark):
    from simba_spark.operators.timeseries import forecast_seasonal_naive

    # key "a": buckets 0..5 with values 10,11,12,13,14,15; period 3
    rows = [("a", b, 10.0 + b) for b in range(6)]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    out = {
        (r["k"], r["bucket"]): (r["yhat"], r["h"])
        for r in forecast_seasonal_naive(
            df, "k", "bucket", "v", period=3, horizon=5
        ).collect()
    }
    # h=1 -> src 5+1-3=3 (13.0); h=2 -> 4; h=3 -> 5; h=4 wraps 2 seasons
    # back: 5+4-6=3; h=5 -> 4
    assert out[("a", 6)] == (13.0, 1)
    assert out[("a", 7)] == (14.0, 2)
    assert out[("a", 8)] == (15.0, 3)
    assert out[("a", 9)] == (13.0, 4)
    assert out[("a", 10)] == (14.0, 5)


def test_forecast_seasonal_naive_drift_and_sparse(spark):
    from simba_spark.operators.timeseries import forecast_seasonal_naive

    # drift: slope = (v_last - v_first)/(last - first) = (20-10)/5 = 2
    rows = [("a", 0, 10.0), ("a", 5, 20.0), ("a", 4, 18.0)]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    out = {
        r["h"]: r["yhat"]
        for r in forecast_seasonal_naive(
            df, "k", "bucket", "v", period=2, horizon=2, drift=True
        ).collect()
    }
    # h=1: src 5+1-2=4 -> 18 + 2*1 = 20 ; h=2: src 5 -> 20 + 2*2 = 24
    assert out[1] == 20.0 and out[2] == 24.0
    # sparse: missing source bucket -> NULL yhat (drift keeps it NULL)
    out2 = {
        r["h"]: r["yhat"]
        for r in forecast_seasonal_naive(
            df, "k", "bucket", "v", period=3, horizon=1, drift=False
        ).collect()
    }
    assert out2[1] is None  # src bucket 3 absent

    import pytest as _pt
    with _pt.raises(ValueError):
        forecast_seasonal_naive(df, "k", "bucket", "v", period=0, horizon=1)
    with _pt.raises(ValueError):
        forecast_seasonal_naive(df, "k", "bucket", "v", period=1, horizon=0)


def test_forecast_seasonal_naive_matches_duckdb(spark):
    import pytest as _pt
    duckdb = _pt.importorskip("duckdb")
    from simba_spark.operators.timeseries import (
        forecast_seasonal_naive, forecast_seasonal_naive_sql)

    df = spark.range(40).select(
        (F.col("id") % 2).alias("k"),
        F.expr("id div 2").alias("bucket"),
        ((F.col("id") * 13) % 7).cast("double").alias("v"),
    )
    got = {
        (r["k"], r["bucket"]): (r["yhat"], r["h"])
        for r in forecast_seasonal_naive(
            df, "k", "bucket", "v", period=4, horizon=6, drift=True
        ).collect()
    }
    con = duckdb.connect()
    q = forecast_seasonal_naive_sql(
        "SELECT (i % 2) AS k, (i // 2) AS bucket, "
        "CAST((i * 13) % 7 AS DOUBLE) AS v FROM range(40) r(i)",
        "k", "bucket", "v", period=4, horizon=6, drift=True,
    )
    want = {(r[0], r[1]): (r[2], r[3]) for r in con.execute(q).fetchall()}
    assert got == want


# --- seasonal_decompose -----------------------------------------------------


def test_seasonal_decompose_recovers_planted_structure(spark):
    """A series built as trend + weekly seasonal + nothing must come
    back with the MA tracking the trend and the centered seasonal
    matching the planted offsets (interior rows, where the MA window
    is complete)."""
    import pytest as _pytest

    from simba_spark.operators.timeseries import seasonal_decompose

    season = [12.0, -3.0, 0.0, -9.0, 4.0, -1.0, -3.0]  # sums to 0
    rows = [("k", b, float(100 + 2 * b + season[b % 7]))
            for b in range(35)]
    df = spark.createDataFrame(rows, "key string, bucket long, x double")
    got = {r["bucket"]: r for r in
           seasonal_decompose(df, "key", "bucket", "x", period=7)
           .collect()}
    # linear trend: the centered 7-MA of (100 + 2b + seasonal) is
    # exactly 100 + 2b (the seasonal sums to zero over any 7 window)
    for b in range(3, 32):
        assert got[b]["trend"] == _pytest.approx(100 + 2 * b, abs=1e-6)
        assert got[b]["seasonal"] == _pytest.approx(season[b % 7],
                                                    abs=1e-6)
        assert got[b]["resid"] == _pytest.approx(0.0, abs=1e-6)
    # edges: incomplete MA window -> NULL trend
    assert got[0]["trend"] is None and got[34]["trend"] is None


def test_seasonal_decompose_matches_sql_mirror_both_parities(spark):
    import duckdb

    from simba_spark.operators.timeseries import (seasonal_decompose,
                                                  seasonal_decompose_sql)

    rows = []
    for ki, k in enumerate(("a", "b")):
        for b in range(26):
            rows.append((k, b, float((b * 17 + ki * 3) % 23 + 1)))
    df = spark.createDataFrame(rows, "key string, bucket long, x double")
    con = duckdb.connect()
    con.execute("CREATE TABLE s(key VARCHAR, bucket BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?,?,?)", rows)
    for period in (7, 4):
        got = {(r["key"], r["bucket"]):
               (r["trend"], r["seasonal"], r["resid"])
               for r in seasonal_decompose(
                   df, "key", "bucket", "x", period=period).collect()}
        want = {(r[0], r[1]): (r[3], r[4], r[5]) for r in con.execute(
            seasonal_decompose_sql("s", "key", "bucket", "x",
                                   period=period)).fetchall()}
        assert got == want and len(got) == len(rows)


def test_seasonal_decompose_validation(spark):
    import pytest as _pytest

    from simba_spark.operators.timeseries import seasonal_decompose

    df = spark.createDataFrame([("k", 0, 1.0)],
                               "key string, bucket long, x double")
    with _pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "key", "bucket", "x", period=1)


# --- Holt linear-trend forecast ---------------------------------------------

def _holt_ref(ys, a, b, h):
    l, t = ys[0], (ys[1] - ys[0]) if len(ys) > 1 else 0.0
    for y in ys[1:]:
        ln = a * y + (1 - a) * (l + t)
        t = b * (ln - l) + (1 - b) * t
        l = ln
    return l + h * t


def test_holt_forecast_matches_textbook_recursion(spark):
    from simba_spark.operators.timeseries import holt_forecast

    ys = [3.0, 5.0, 4.0, 8.0, 7.0, 11.0, 10.0, 14.0]
    rows = [("a", i, v) for i, v in enumerate(ys)]
    rows += [("single", 0, 2.5), ("const", 0, 5.0), ("const", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, bucket long, v double")
    got = {
        (r.k, r.h): (r.bucket, r.yhat)
        for r in holt_forecast(df, "k", "bucket", "v", 0.4, 0.2, 3).collect()
    }
    for h in (1, 2, 3):
        assert got[("a", h)] == (7 + h, _holt_ref(ys, 0.4, 0.2, h))
        # single point: flat level, zero trend
        assert got[("single", h)] == (h, 2.5)
        # constant series: forecast stays exactly constant
        assert got[("const", h)] == (1 + h, 5.0)


def test_holt_forecast_null_and_validation(spark):
    from simba_spark.operators.timeseries import holt_forecast

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, 3.0), ("n", 0, None)],
        "k string, bucket long, v double",
    )
    out = holt_forecast(df, "k", "bucket", "v", 0.5, 0.5, 2).collect()
    # NULL rows dropped: series is [1.0, 3.0]; all-NULL key absent
    assert {r.k for r in out} == {"a"}
    assert {(r.bucket, r.yhat) for r in out} == {
        (3, _holt_ref([1.0, 3.0], 0.5, 0.5, 1)),
        (4, _holt_ref([1.0, 3.0], 0.5, 0.5, 2)),
    }
    import pytest as _pt

    for kw in ({"alpha": 0.0}, {"beta": 1.5}, {"horizon": 0}):
        with _pt.raises(ValueError):
            holt_forecast(df, "k", "bucket", "v", **kw)


def test_holt_forecast_duckdb_parity_bit_exact(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.timeseries import (holt_forecast,
                                                  holt_forecast_sql)

    import random

    rng = random.Random(7)
    rows = [
        (f"k{j}", i, round(rng.uniform(-50, 50), 3))
        for j in range(5)
        for i in range(rng.randrange(1, 40))
    ]
    df = spark.createDataFrame(rows, "k string, bucket long, v double")
    got = {
        (r.k, r.bucket): r.yhat
        for r in holt_forecast(df, "k", "bucket", "v", 0.3, 0.1, 6).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "bucket", "v"]))
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            holt_forecast_sql("SELECT * FROM t", "k", "bucket", "v", 0.3, 0.1, 6)
        ).fetchall()
    }
    assert got == oracle  # bit-for-bit, no rounding


def test_duckdb_list_reduce_struct_aliasing_still_broken():
    """Canary for the quirk holt_forecast_sql works around: DuckDB's
    list_reduce evaluates struct_pack fields IN PLACE, so a later
    field reading acc.l sees the value an earlier field just wrote.
    If this test ever fails, DuckDB fixed the aliasing and the
    recursive-CTE workaround comment should be revisited (the CTE
    mirror itself stays correct either way)."""
    duckdb = pytest.importorskip("duckdb")

    r = duckdb.connect().execute(
        """
        SELECT list_reduce(
          [struct_pack(l := 1.0::DOUBLE, old_l := 0.0::DOUBLE),
           struct_pack(l := 2.0::DOUBLE, old_l := 0.0::DOUBLE),
           struct_pack(l := 3.0::DOUBLE, old_l := 0.0::DOUBLE)],
          (acc, e) -> struct_pack(l := acc.l + e.l, old_l := acc.l)
        )"""
    ).fetchone()[0]
    # the aliasing appears from the SECOND application (the first step
    # is computed into a fresh struct; later steps mutate it in place):
    # correct fold semantics give old_l = 3.0 (the previous acc.l);
    # in-place aliasing gives old_l = 6.0 (the l written this step)
    assert r["l"] == 6.0
    assert r["old_l"] == 6.0


# --- Theil–Sen robust trend --------------------------------------------------

def test_theil_sen_resists_outlier_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.timeseries import theil_sen, theil_sen_sql

    rows = [("a", i, 2.0 * i + 1.0) for i in range(10)]
    rows[5] = ("a", 5, 500.0)  # wild spike
    rows += [("single", 0, 3.3)]
    rows += [("even", 0, 1.0), ("even", 1, 3.0), ("even", 2, 4.0),
             ("even", 3, 9.0)]
    df = spark.createDataFrame(rows, "k string, bucket long, v double")
    got = {r.k: (r.n_points, r.n_pairs, r.slope, r.intercept)
           for r in theil_sen(df, "k", "bucket", "v").collect()}
    # the outlier does not bend the median slope off the true line
    assert got["a"][2] == 2.0 and got["a"][3] == 1.0
    # OLS on the same data DOES bend (the reason this operator exists)
    from simba_spark.operators.timeseries import linreg_series

    ols = linreg_series(df.filter("k = 'a'"), "k", bucket_col="bucket",
                        val_col="v").first()
    assert abs(ols.slope - 2.0) > 1.0
    # single point: NULLs, zero pairs; even pair count: middle average
    assert got["single"] == (1, 0, None, None)
    assert got["even"][1] == 6
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "bucket", "v"]))
    o = {r[0]: tuple(r[1:]) for r in con.execute(
        theil_sen_sql("SELECT * FROM t", "k", "bucket", "v")).fetchall()}
    assert got == o


def test_theil_sen_guard_and_invariance(spark):
    from simba_spark.operators.timeseries import theil_sen

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(30)], "k string, bucket long, v double")
    with pytest.raises(Exception):
        theil_sen(df, "k", "bucket", "v", max_points=10).collect()
    a = sorted(map(tuple, theil_sen(df, "k", "bucket", "v").collect()))
    b = sorted(map(tuple, theil_sen(
        df.repartition(7), "k", "bucket", "v").collect()))
    assert a == b


# --- Holt-Winters additive seasonal -------------------------------------------

def _hw_ref(xs, m, a, b_, g_, hor):
    l = sum(xs[:m]) / m
    b = (sum(xs[m:2 * m]) / m - sum(xs[:m]) / m) / m
    s = [x - sum(xs[:m]) / m for x in xs[:m]]
    for t in range(m, len(xs)):
        x = xs[t]
        sh = s[0]
        ln = a * (x - sh) + (1 - a) * (l + b)
        bn = b_ * (ln - l) + (1 - b_) * b
        sn = g_ * (x - l - b) + (1 - g_) * sh
        s = s[1:] + [sn]
        l, b = ln, bn
    return [(l + h * b + s[(h - 1) % m]) + 0.0 for h in range(1, hor + 1)]


def test_holt_winters_matches_reference_and_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.timeseries import (holt_winters_forecast,
                                                  holt_winters_sql)

    rows = []
    for k, base in [("a", 10.0), ("b", 50.0)]:
        for t in range(1, 29):
            season = [0, 3, -2, 1, 4, -3, -1][t % 7]
            rows.append((k, t, base + 0.5 * t + season))
    rows += [("short", 1, 5.0), ("short", 2, 6.0)]   # < 2m: absent
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = sorted(map(tuple, holt_winters_forecast(
        df, "k", "t", "v", period=7, horizon=7).collect()))
    assert sorted({r[0] for r in got}) == ["a", "b"]
    # bit-exact vs the pure-python textbook recursion
    for key in ("a", "b"):
        xs = [v for kk, t, v in sorted(rows) if kk == key]
        exp = _hw_ref(xs, 7, 0.3, 0.1, 0.2, 7)
        by_h = {h: y for kk, t, y, h in got if kk == key}
        assert [by_h[h] for h in range(1, 8)] == exp
    # forecast buckets continue the series
    assert {t for kk, t, y, h in got if kk == "a"} == set(range(29, 36))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "t", "v"]))
    oracle = sorted(map(tuple, con.execute(holt_winters_sql(
        "SELECT * FROM t", "k", "t", "v", period=7, horizon=7)).fetchall()))
    assert got == oracle

    with pytest.raises(ValueError):
        holt_winters_forecast(df, "k", "t", "v", period=1)
    with pytest.raises(ValueError):
        holt_winters_forecast(df, "k", "t", "v", alpha=1.5)
