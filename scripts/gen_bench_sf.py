#!/usr/bin/env python
"""Generate large-scale-factor bench data matching the driver testdata
schema (TESTDATA.md: region nation customer supplier part orders
lineitem events documents embeddings).

The driver ships sf<=0.1 only; scale claims need data that can actually
stress shuffles, so this produces an sfX directory (default sf=1 = 10x
sf0.1 row counts) with the SAME schemas and the same column
distributions observed at sf0.1 (key ranges scale with sf; per-key
densities stay constant, TPC-H style). Deterministic: every column is
xxhash64-derived from the row id, no RNG state.

Usage: python scripts/gen_bench_sf.py [sf] [outdir]
       (defaults: 1  /root/repo/.bench/sf1)

Bench against it with:
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf1 python bench.py

NOT oracle data: correctness stays pinned to the driver's read-only
/root/testdata; this exists for performance work only (SCALE.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _u(col, salt, lo=0.0, hi=1.0):
    """Deterministic uniform double in [lo, hi) from xxhash64(id, salt)."""
    h = F.abs(F.xxhash64(col, F.lit(salt)))
    return F.lit(lo) + (h % 1_000_000) / 1_000_000.0 * F.lit(hi - lo)


def _pick(col, salt, choices):
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(arr, (F.abs(F.xxhash64(col, F.lit(salt))) % len(choices) + 1).cast("int"))


# vocabulary observed in the sf0.1 documents table (44 tokens)
VOCAB = (
    "a the key agg row scan slow fast table value part hash merge batch "
    "spark line sort window order data column join small customer query "
    "big stream group vector filter dim fact store read write shuffle "
    "cache plan stage task node disk net cpu"
).split()


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.bench/sf{sf:g}"
    mult = sf / 0.1  # row counts below are the sf0.1 profile

    from simba_spark.context import get_spark

    spark = get_spark(app_name="gen_bench_sf", master="local[32]",
                      shuffle_partitions=32)

    def rows(n):
        return int(n * mult)

    n_cust, n_supp, n_part = rows(15_000), rows(1_000), rows(20_000)
    n_orders, n_li = rows(150_000), rows(600_000)
    n_events, n_users = rows(100_000), rows(1_500)
    n_docs, n_vecs = rows(5_000), rows(2_000)

    t0 = time.time()

    region = spark.createDataFrame(
        [(i, f"REGION_{i}") for i in range(5)], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 25).cast("int").alias("c_nationkey"),
        F.round(_u("id", 2, -999.99, 9999.99), 2).alias("c_acctbal"),
        _pick("id", 3, ["AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "MACHINERY", "BUILDING"]).alias("c_mktsegment"),
    )
    supp = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        (F.abs(F.xxhash64("id", F.lit(4))) % 25).cast("int").alias("s_nationkey"),
        F.round(_u("id", 5, -999.99, 9999.99), 2).alias("s_acctbal"),
    )
    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), _pick("id", 6, VOCAB), F.lit(" "), _pick("id", 7, VOCAB)).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.abs(F.xxhash64("id", F.lit(8))) % 25).cast("int")).alias("p_brand"),
        _pick("id", 9, ["ECONOMY", "STANDARD", "PROMO", "SMALL", "LARGE", "MEDIUM"]).alias("p_type"),
        (F.abs(F.xxhash64("id", F.lit(10))) % 50 + 1).cast("int").alias("p_size"),
        F.round(_u("id", 11, 900.0, 2000.0), 2).alias("p_retailprice"),
    )

    day_us = 86_400_000_000
    o_start = F.to_timestamp(F.lit("1995-01-01"))
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(12))) % n_cust).alias("o_custkey"),
        _pick("id", 13, ["O", "P", "F"]).alias("o_orderstatus"),
        F.round(_u("id", 14, 900.0, 105_000.0), 2).alias("o_totalprice"),
        F.timestamp_micros(
            F.unix_micros(o_start)
            + (F.abs(F.xxhash64("id", F.lit(15))) % 2404) * day_us
        ).alias("o_orderdate"),
        _pick("id", 16, ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]).alias("o_orderpriority"),
    )
    lineitem = spark.range(n_li).select(
        (F.abs(F.xxhash64("id", F.lit(17))) % n_orders).alias("l_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(18))) % n_part).alias("l_partkey"),
        (F.abs(F.xxhash64("id", F.lit(19))) % n_supp).alias("l_suppkey"),
        (F.abs(F.xxhash64("id", F.lit(20))) % 7 + 1).cast("int").alias("l_linenumber"),
        (F.abs(F.xxhash64("id", F.lit(21))) % 50 + 1).cast("double").alias("l_quantity"),
        F.round(_u("id", 22, 900.0, 105_000.0), 2).alias("l_extendedprice"),
        ((F.abs(F.xxhash64("id", F.lit(23))) % 11) / 100.0).alias("l_discount"),
        ((F.abs(F.xxhash64("id", F.lit(24))) % 9) / 100.0).alias("l_tax"),
        _pick("id", 25, ["N", "A", "R"]).alias("l_returnflag"),
        _pick("id", 26, ["O", "F"]).alias("l_linestatus"),
        F.timestamp_micros(
            F.unix_micros(o_start)
            + (F.abs(F.xxhash64("id", F.lit(27))) % 2499) * day_us
        ).alias("l_shipdate"),
    )

    e_start = F.to_timestamp(F.lit("2024-01-01"))
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(e_start)
            + F.abs(F.xxhash64("id", F.lit(28))) % (30 * day_us)
        ).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(29))) % n_users).alias("user_id"),
        _pick("id", 30, ["signup", "purchase", "view", "click", "error"]).alias("event_type"),
        F.round(_u("id", 31, 0.0, 560.21), 2).alias("value"),
        F.concat(F.lit('{"k": '), (F.abs(F.xxhash64("id", F.lit(32))) % 100), F.lit("}")).alias("props"),
    )

    # documents: 40-90 tokens from the observed vocabulary; ~1% of docs
    # are near-dups of their predecessor (one token appended) so the
    # minhash/simhash/ngram pair queries have real work at scale
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    is_dup = (F.col("id") % 97 == 0) & (F.col("id") > 0)
    src_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    ntok = (F.abs(F.xxhash64(src_id, F.lit(33))) % 51 + 40).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), ntok),
        lambda i: F.element_at(
            vocab_arr,
            (F.abs(F.xxhash64(src_id * 1000 + i.cast("long"), F.lit(34))) % len(VOCAB) + 1).cast("int"),
        ),
    )
    text = F.array_join(
        F.when(is_dup, F.concat(toks, F.array(F.lit("extra")))).otherwise(toks),
        " ",
    )
    documents = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        _pick("id", 35, ["en", "en", "en", "de", "fr", "es", "zh"]).alias("lang"),
        F.concat(F.lit("src"), (F.abs(F.xxhash64("id", F.lit(36))) % 20)).alias("source"),
        F.length(text).alias("n_chars"),
    )

    # embeddings: 64-d floats around one of 10 label centroids (so
    # near-dup/ANN queries see cluster structure, like the driver data)
    lab = (F.abs(F.xxhash64("id", F.lit(37))) % 10).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            ((F.abs(F.xxhash64(lab.cast("long") * 64 + i.cast("long"), F.lit(38))) % 1000) / 1000.0 - 0.5)
            + ((F.abs(F.xxhash64(F.col("id") * 64 + i.cast("long"), F.lit(39))) % 1000) / 1000.0 - 0.5) * 0.6
        ).cast("float"),
    )
    embeddings = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), emb.alias("embedding"), lab.alias("label")
    )

    os.makedirs(out, exist_ok=True)
    for name, df in [
        ("region", region), ("nation", nation), ("customer", cust),
        ("supplier", supp), ("part", part), ("orders", orders),
        ("lineitem", lineitem), ("events", events),
        ("documents", documents), ("embeddings", embeddings),
    ]:
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"wrote {name}", flush=True)
    print(f"done sf={sf} -> {out} in {time.time() - t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
