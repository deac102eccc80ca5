#!/usr/bin/env python
"""ANN/IVF layout benchmark at real vector scale (default 1M x 64-d).

The plan-shape tests prove the layouts prune partition directories at
toy scale; this measures what a user actually cares about — probe
latency vs recall@k against the exact brute-force baseline — at a
corpus size where pruning matters (VERDICT r4 next-steps #8).

Steps (all deterministic, xxhash64-derived — no RNG state):
  1. generate .bench/ann_{n}x{d}/vectors.parquet with latent cluster
     structure (100 centroids) if missing
  2. build the persisted IVF layout (64 lists) and hyperplane-LSH
     layout (10 planes -> 1024 buckets) if missing
  3. exact cosine top-10 for NQ query vectors = ground truth + baseline
     latency
  4. sweep IVF nprobe in {1,2,4,8,16} and LSH probe_hamming in {0,1,2};
     report median latency per probe and mean recall@10

Usage: python scripts/bench_ann.py [n_vecs] [dim]
Prints ONE JSON line; paste the table into SCALE.md.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
NQ = 10
K = 10
REPS = 3
ROOT = f"/root/repo/.bench/ann_{N}x{DIM}"


def gen_vectors(spark, path):
    """1M-row analog of the testdata embeddings table: each vector is a
    latent-centroid draw + per-row noise, so IVF/LSH see realistic
    cluster structure rather than uniform noise."""
    lab = (F.abs(F.xxhash64("id", F.lit(37))) % 100).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (
            ((F.abs(F.xxhash64(lab.cast("long") * DIM + i.cast("long"), F.lit(38))) % 1000) / 1000.0 - 0.5)
            + ((F.abs(F.xxhash64(F.col("id") * DIM + i.cast("long"), F.lit(39))) % 1000) / 1000.0 - 0.5) * 0.6
        ).cast("float"),
    )
    spark.range(N).select(
        F.col("id").alias("vec_id"), emb.alias("embedding"), lab.alias("label")
    ).write.mode("overwrite").parquet(path)


def dir_bytes(path, subdirs=None):
    """Total parquet bytes under `path` (or only the named subdirs) —
    the I/O a probe actually plans, vs the full corpus for exact."""
    total = 0
    if subdirs is None:
        for root, _, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files if f.endswith(".parquet")
            )
    else:
        for s in subdirs:
            p = os.path.join(path, s)
            if os.path.isdir(p):
                for root, _, files in os.walk(p):
                    total += sum(
                        os.path.getsize(os.path.join(root, f))
                        for f in files if f.endswith(".parquet")
                    )
    return total


def timed(df_fn, reps=REPS):
    """Median wall time of reps end-to-end runs + last result rows."""
    ts, rows = [], None
    for _ in range(reps):
        t0 = time.time()
        rows = df_fn().collect()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3), rows


def main():
    from simba_spark.context import get_spark
    from simba_spark.operators.similarity import (
        build_ann_layout,
        build_ivf_layout,
        cosine_topk,
        cosine_topk_ann_layout,
        cosine_topk_ivf_layout,
    )

    spark = get_spark(app_name="bench_ann", master="local[32]",
                      shuffle_partitions=32)
    vec_path = os.path.join(ROOT, "vectors.parquet")
    ivf_path = os.path.join(ROOT, "ivf64")
    ann_path = os.path.join(ROOT, "lsh10")

    t_gen = t_ivf = t_ann = None
    if not os.path.exists(vec_path):
        t0 = time.time()
        gen_vectors(spark, vec_path)
        t_gen = round(time.time() - t0, 1)
    df = spark.read.parquet(vec_path)

    if not os.path.exists(os.path.join(ivf_path, "ivf.json")):
        t0 = time.time()
        build_ivf_layout(df, ivf_path, n_centroids=64, sample_cap=4000, iters=10)
        t_ivf = round(time.time() - t0, 1)
    if not os.path.exists(os.path.join(ann_path, "ann.json")):
        t0 = time.time()
        build_ann_layout(df, ann_path, n_planes=10, dim=DIM)
        t_ann = round(time.time() - t0, 1)

    # NQ query vectors: evenly-spaced corpus rows (so every query has a
    # guaranteed neighborhood); queried vector excluded from no list —
    # self-match is fine, recall compares like against like
    qrows = df.filter(
        F.col("vec_id").isin([i * (N // NQ) for i in range(NQ)])
    ).select("vec_id", "embedding").collect()
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]

    import numpy as np

    from simba_spark.operators.similarity import load_ivf_layout

    # ground truth + exact latency
    exact_ids, exact_lat = {}, []
    for qid, qv in queries:
        lat, rows = timed(lambda qv=qv: cosine_topk(df, qv, K))
        exact_lat.append(lat)
        exact_ids[qid] = {int(r["vec_id"]) for r in rows}

    results = {"exact": {"latency_sec": round(statistics.median(exact_lat), 3),
                         "recall": 1.0,
                         "scan_mb": round(dir_bytes(vec_path) / 1e6, 1)}}

    _, centroids = load_ivf_layout(spark, ivf_path)
    for nprobe in (1, 2, 4, 8, 16):
        lats, recs, mbs = [], [], []
        for qid, qv in queries:
            lat, rows = timed(
                lambda qv=qv: cosine_topk_ivf_layout(spark, ivf_path, qv, K, nprobe=nprobe)
            )
            lats.append(lat)
            got = {int(r["vec_id"]) for r in rows}
            recs.append(len(got & exact_ids[qid]) / K)
            d2 = ((centroids - np.asarray(qv)[None, :]) ** 2).sum(axis=1)
            probes = [int(i) for i in np.argsort(d2)[:nprobe]]
            mbs.append(dir_bytes(os.path.join(ivf_path, "data"),
                                 [f"__ivf={p}" for p in probes]) / 1e6)
        results[f"ivf_nprobe{nprobe}"] = {
            "latency_sec": round(statistics.median(lats), 3),
            "recall": round(sum(recs) / len(recs), 3),
            "scan_mb": round(sum(mbs) / len(mbs), 1),
        }

    with open(os.path.join(ann_path, "ann.json")) as f:
        ann_meta = json.load(f)
    n_planes, ann_seed = int(ann_meta["n_planes"]), int(ann_meta["seed"])
    planes = np.random.RandomState(ann_seed).standard_normal((n_planes, DIM))
    for h in (0, 1, 2):
        from itertools import combinations

        lats, recs, mbs = [], [], []
        for qid, qv in queries:
            lat, rows = timed(
                lambda qv=qv: cosine_topk_ann_layout(spark, ann_path, qv, K, probe_hamming=h)
            )
            lats.append(lat)
            got = {int(r["vec_id"]) for r in rows}
            recs.append(len(got & exact_ids[qid]) / K)
            qsig = 0
            for p_idx in range(n_planes):
                if float(planes[p_idx] @ np.asarray(qv)) >= 0:
                    qsig |= 1 << p_idx
            sigs = set()
            for hh in range(h + 1):
                for flip in combinations(range(n_planes), hh):
                    s = qsig
                    for b in flip:
                        s ^= 1 << b
                    sigs.add(s)
            mbs.append(dir_bytes(os.path.join(ann_path, "data"),
                                 [f"__sig={s}" for s in sorted(sigs)]) / 1e6)
        results[f"lsh_h{h}"] = {
            "latency_sec": round(statistics.median(lats), 3),
            "recall": round(sum(recs) / len(recs), 3),
            "scan_mb": round(sum(mbs) / len(mbs), 1),
        }

    # --- product quantization: the scan-BYTES lever (32x smaller rows
    # than the vector column), shortlist + exact re-rank ---
    from simba_spark.operators.pq import build_pq_layout, load_pq_layout, pq_topk

    pq_path = os.path.join(ROOT, "pq8x8")
    t_pq = None
    if not os.path.exists(os.path.join(pq_path, "pq_meta.json")):
        t0 = time.time()
        build_pq_layout(df, pq_path, m=8, nbits=8, sample_cap=8192,
                        iters=10, seed=42)
        t_pq = round(time.time() - t0, 1)
    codes, pq_model, _ = load_pq_layout(spark, pq_path)
    codes = codes.persist()
    codes.count()
    pq_scan_mb = round(dir_bytes(os.path.join(pq_path, "codes")) / 1e6, 1)
    for sl in (100, 1000):
        lats, recs = [], []
        for qid, qv in queries:
            lat, rows = timed(
                lambda qv=qv: pq_topk(df, pq_model, qv, K, shortlist=sl,
                                      codes=codes)
            )
            lats.append(lat)
            got = {int(r["vec_id"]) for r in rows}
            recs.append(len(got & exact_ids[qid]) / K)
        results[f"pq_shortlist{sl}"] = {
            "latency_sec": round(statistics.median(lats), 3),
            "recall": round(sum(recs) / len(recs), 3),
            "scan_mb": pq_scan_mb,
        }
    codes.unpersist()

    # --- IVF×PQ, raw vs RESIDUAL codes: same 8-byte code budget, but
    # residual codes only have to span a coarse cell's local range, so
    # the ADC ordering tracks truth closer — measured as recall at a
    # tight shortlist (the re-rank can't mask code quality there) ---
    from simba_spark.operators.pq import build_ivfpq_layout, ivfpq_topk

    t_ivfpq = {}
    for enc in ("raw", "residual"):
        p = os.path.join(ROOT, f"ivfpq64_{enc}")
        t_ivfpq[enc] = None
        if not os.path.exists(os.path.join(p, "ivfpq_meta.json")):
            t0 = time.time()
            build_ivfpq_layout(df, p, n_centroids=64, m=8, nbits=8,
                               sample_cap=8192, iters=10, seed=42,
                               encode=enc)
            t_ivfpq[enc] = round(time.time() - t0, 1)
        for sl in (100, 1000):
            lats, recs = [], []
            for qid, qv in queries:
                lat, rows = timed(
                    lambda qv=qv: ivfpq_topk(spark, p, df, qv, K,
                                             nprobe=8, shortlist=sl))
                lats.append(lat)
                got = {int(r["vec_id"]) for r in rows}
                recs.append(len(got & exact_ids[qid]) / K)
            results[f"ivfpq_{enc}_np8_sl{sl}"] = {
                "latency_sec": round(statistics.median(lats), 3),
                "recall": round(sum(recs) / len(recs), 3),
            }

    # --- kNN JOIN forms (round 11): both sides large. The candidate
    # equi-join carries full vectors (ivf_knn_join) vs m-byte PQ codes
    # (ivfpq_knn_join) at the SAME nprobe — recall vs the full-probe
    # exact join, latency, and the candidate-stage row payload. ---
    from simba_spark.operators.similarity import (ivf_knn_join,
                                                  ivfpq_knn_join)

    jl = df.filter(F.col("vec_id") % (N // 200) == 0) \
           .select("vec_id", "embedding")
    t0 = time.time()
    ex = ivf_knn_join(jl, df, k=K, n_centroids=16, nprobe=16,
                      sample_cap=4000).collect()
    t_exact = round(time.time() - t0, 1)
    exact_pairs = {(r.a_id, r.b_id) for r in ex}
    results["join_exact_fullprobe"] = {
        "latency_sec": t_exact, "recall": 1.0,
        "cand_row_bytes": DIM * 4, "n_left": jl.count()}
    for name, fn in (
        ("ivf_join_np2of16",
         lambda: ivf_knn_join(jl, df, k=K, n_centroids=16, nprobe=2,
                              sample_cap=4000)),
        ("ivfpq_join_np2of16_sl64",
         lambda: ivfpq_knn_join(jl, df, k=K, n_centroids=16, nprobe=2,
                                m=8, nbits=8, shortlist=64,
                                sample_cap=4000)),
    ):
        t0 = time.time()
        rows = fn().collect()
        lat = round(time.time() - t0, 1)
        got = {(r.a_id, r.b_id) for r in rows}
        results[name] = {
            "latency_sec": lat,
            "recall": round(len(got & exact_pairs) / len(exact_pairs), 3),
            "cand_row_bytes": 8 if name.startswith("ivfpq") else DIM * 4,
        }

    out = {
        "n_vecs": N, "dim": DIM, "k": K, "n_queries": NQ, "reps": REPS,
        "build_sec": {"gen": t_gen, "ivf64": t_ivf, "lsh10": t_ann,
                      "pq8x8": t_pq,
                      "ivfpq64_raw": t_ivfpq.get("raw"),
                      "ivfpq64_residual": t_ivfpq.get("residual")},
        "results": results,
    }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
