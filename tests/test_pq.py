"""Product quantization: exactness at full re-rank, recall of the
approximate config, encode-route bit-equality, ADC column vs numpy,
layout round-trip + code-only scan pruning."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


@pytest.fixture(scope="module")
def model4(embs):
    from simba_spark.operators.pq import pq_train

    return pq_train(embs, m=8, nbits=4, sample_cap=500, iters=5, seed=42)


def _qvec(embs, vid):
    return [float(x) for x in
            embs.filter(F.col("vec_id") == vid).first()["embedding"]]


def test_full_rerank_is_exact(embs, model4):
    """shortlist=None re-ranks every row — equals brute force by
    construction, whatever the codebook quality (the oracle config)."""
    from simba_spark.operators.pq import pq_topk
    from simba_spark.operators.similarity import cosine_topk

    q = _qvec(embs, 7)
    got = [(r["vec_id"], round(r["cosine_sim"], 6))
           for r in pq_topk(embs, model4, q, 10).collect()]
    want = [(r["vec_id"], round(r["cosine_sim"], 6))
            for r in cosine_topk(embs, q, 10).collect()]
    assert got == want


def test_recall_at_shortlist(embs):
    """nbits=8 + shortlist=5k recall on the sf0.001 table (seeded —
    deterministic; measured 1.0/1.0/1.0 across the three probes)."""
    from simba_spark.operators.pq import pq_topk, pq_train
    from simba_spark.operators.similarity import cosine_topk

    model = pq_train(embs, m=8, nbits=8, sample_cap=500, iters=8,
                     seed=42)
    for vid in (7, 101, 333):
        q = _qvec(embs, vid)
        exact = {r["vec_id"] for r in cosine_topk(embs, q, 10).collect()}
        appr = {r["vec_id"]
                for r in pq_topk(embs, model, q, 10,
                                 shortlist=50).collect()}
        assert len(appr & exact) / 10 >= 0.9


def test_encode_routes_bit_identical(embs, model4):
    from simba_spark.operators.pq import pq_encode

    a = {r["vec_id"]: list(r["pq_code"])
         for r in pq_encode(embs, model4, route="codegen").collect()}
    b = {r["vec_id"]: list(r["pq_code"])
         for r in pq_encode(embs, model4, route="arrow").collect()}
    assert a == b and len(a) == 500


def test_adc_column_matches_numpy(embs, model4):
    import numpy as np

    from simba_spark.operators.pq import (pq_adc_col, pq_encode,
                                          _query_lut)

    q = _qvec(embs, 7)
    enc = pq_encode(embs, model4, route="arrow")
    rows = enc.select("vec_id", "pq_code",
                      pq_adc_col(model4, q).alias("adc")) \
              .orderBy("vec_id").limit(20).collect()
    lut = np.asarray(_query_lut(model4, q))
    for r in rows:
        want = sum(lut[j][c] for j, c in enumerate(r["pq_code"]))
        assert abs(r["adc"] - want) < 1e-9


def test_l2_metric_full_rerank_exact(embs):
    from simba_spark.operators.pq import pq_topk, pq_train

    model = pq_train(embs, m=8, nbits=4, metric="l2", sample_cap=500,
                     iters=5, seed=7)
    q = _qvec(embs, 42)
    got = [r["vec_id"] for r in pq_topk(embs, model, q, 5).collect()]
    qv = F.array(*[F.lit(float(x)) for x in q])
    d2 = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), qv,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    want = [r["vec_id"] for r in embs.select("vec_id", d2.alias("d2"))
            .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
            .limit(5).collect()]
    assert got == want


def test_layout_roundtrip_and_code_only_scan(spark, embs, model4,
                                             tmp_path):
    """Persisted codes: the ADC sweep's scan must read ONLY
    (vec_id, pq_code) — the 32x scan-byte reduction is the point."""
    from simba_spark.operators.pq import (build_pq_layout,
                                          load_pq_layout, pq_topk,
                                          pq_topk_layout)

    path = str(tmp_path / "pq_layout")
    build_pq_layout(embs, path, m=8, nbits=4, sample_cap=500, iters=5,
                    seed=42)
    codes, model, id_col = load_pq_layout(spark, path)
    assert id_col == "vec_id"
    assert model.m == 8 and model.nbits == 4

    q = _qvec(embs, 7)
    got = [(r["vec_id"], round(r["cosine_sim"], 6))
           for r in pq_topk_layout(spark, path, embs, q, 10,
                                   shortlist=100).collect()]
    want = [(r["vec_id"], round(r["cosine_sim"], 6))
            for r in pq_topk(embs, model, q, 10, shortlist=100,
                             codes=codes).collect()]
    assert got == want

    from simba_spark.operators.pq import pq_adc_col

    sweep = codes.select("vec_id",
                         pq_adc_col(model, q).alias("adc"))
    plan = sweep._jdf.queryExecution().executedPlan().toString()
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "embedding" not in read[0]
    assert "pq_code" in read[0]
    assert "BatchEvalPython" not in plan  # ADC is pure codegen


def test_dim_validation(embs, model4):
    from simba_spark.operators.pq import PQModel, pq_topk

    with pytest.raises(ValueError):
        PQModel(63, 8, 4, "cosine", model4.codebooks)
    with pytest.raises(ValueError):
        pq_topk(embs, model4, [1.0, 2.0], 5)


def test_ivfpq_full_probe_exact_and_pruned_probe(spark, embs,
                                                 tmp_path):
    """nprobe=C + shortlist=None is exact by construction; a pruned
    probe's codes scan must carry the __ivf partition filter, and its
    recall stays useful."""
    from simba_spark.operators.pq import build_ivfpq_layout, ivfpq_topk
    from simba_spark.operators.similarity import cosine_topk

    path = str(tmp_path / "ivfpq")
    build_ivfpq_layout(embs, path, n_centroids=8, m=8, nbits=8,
                       sample_cap=500, iters=8, seed=42)
    q = _qvec(embs, 7)
    exact = [(r["vec_id"], round(r["cosine_sim"], 6))
             for r in cosine_topk(embs, q, 10).collect()]
    full = [(r["vec_id"], round(r["cosine_sim"], 6))
            for r in ivfpq_topk(spark, path, embs, q, 10,
                                nprobe=8).collect()]
    assert full == exact

    # the sf0.001 embeddings are near-random 64-d draws, so coarse
    # routing scatters true neighbors across lists (recall ~linear in
    # nprobe — honest unstructured-data behavior; the clustered-data
    # recall story is measured in scripts/bench_ann.py). Assert the
    # probe-width contract instead: recall grows with nprobe and is
    # total at full width.
    want = {v for v, _ in exact}
    recalls = []
    for nprobe in (2, 4, 8):
        got = ivfpq_topk(spark, path, embs, q, 10, nprobe=nprobe,
                         shortlist=200)
        ids = {r["vec_id"] for r in got.collect()}
        recalls.append(len(ids & want) / 10)
    assert recalls == sorted(recalls) and recalls[-1] == 1.0

    got = ivfpq_topk(spark, path, embs, q, 10, nprobe=2, shortlist=50)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__ivf" in plan


def test_ivfpq_probe_scans_only_probed_lists(spark, embs, tmp_path):
    """Planning-time pruning: the pruned probe's scan claims fewer
    files than the full-probe scan (partition dirs skipped)."""
    import re

    from simba_spark.operators.pq import build_ivfpq_layout, ivfpq_topk

    path = str(tmp_path / "ivfpq2")
    build_ivfpq_layout(embs, path, n_centroids=8, m=8, nbits=4,
                       sample_cap=500, iters=5, seed=42)
    q = _qvec(embs, 101)

    def n_files(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.findall(r"__ivf", plan)
        return plan, m

    pruned = ivfpq_topk(spark, path, embs, q, 5, nprobe=1, shortlist=20)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    codes_scan = [ln for ln in plan.splitlines()
                  if "pq_code" in ln and "ReadSchema" in ln]
    assert codes_scan  # the codes table is scanned…
    # …and the ADC side never reads the embedding column
    assert all("embedding" not in ln for ln in codes_scan)
    # …through a pruned partition listing
    assert "PartitionFilters" in plan and "__ivf" in plan


def test_ivfpq_residual_full_probe_exact(spark, embs, tmp_path):
    """Residual layout at nprobe=C + shortlist=None is exact by
    construction, same as raw — whatever the per-list LUTs say, every
    row is re-ranked against the true vectors."""
    from simba_spark.operators.pq import build_ivfpq_layout, ivfpq_topk
    from simba_spark.operators.similarity import cosine_topk

    path = str(tmp_path / "ivfpq_res")
    build_ivfpq_layout(embs, path, n_centroids=8, m=8, nbits=8,
                       sample_cap=500, iters=8, seed=42,
                       encode="residual")
    q = _qvec(embs, 7)
    exact = [(r["vec_id"], round(r["cosine_sim"], 6))
             for r in cosine_topk(embs, q, 10).collect()]
    full = [(r["vec_id"], round(r["cosine_sim"], 6))
            for r in ivfpq_topk(spark, path, embs, q, 10,
                                nprobe=8).collect()]
    assert full == exact
    # pruned probe still partition-prunes (union of per-list branches)
    pruned = ivfpq_topk(spark, path, embs, q, 10, nprobe=2,
                        shortlist=50)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__ivf" in plan
    codes_scan = [ln for ln in plan.splitlines()
                  if "pq_code" in ln and "ReadSchema" in ln]
    assert codes_scan
    assert all("embedding" not in ln for ln in codes_scan)


def test_ivfpq_residual_codes_quantize_finer_than_raw(spark, embs,
                                                      tmp_path):
    """The point of residual encoding: with the SAME code budget the
    ADC ordering tracks the true ordering more closely. Measured as
    code-only recall (tiny shortlist, so the re-rank can't mask code
    quality) at full probe width, averaged over queries — residual
    must be at least as good as raw on aggregate."""
    from simba_spark.operators.pq import build_ivfpq_layout, ivfpq_topk
    from simba_spark.operators.similarity import cosine_topk

    raw_p = str(tmp_path / "r_raw")
    res_p = str(tmp_path / "r_res")
    kw = dict(n_centroids=8, m=8, nbits=4, sample_cap=500, iters=8,
              seed=42)
    build_ivfpq_layout(embs, raw_p, encode="raw", **kw)
    build_ivfpq_layout(embs, res_p, encode="residual", **kw)
    tot_raw = tot_res = 0.0
    for vid in (7, 101, 333, 42):
        q = _qvec(embs, vid)
        want = {r["vec_id"] for r in cosine_topk(embs, q, 10).collect()}
        raw = {r["vec_id"] for r in ivfpq_topk(
            spark, raw_p, embs, q, 10, nprobe=8, shortlist=20).collect()}
        res = {r["vec_id"] for r in ivfpq_topk(
            spark, res_p, embs, q, 10, nprobe=8, shortlist=20).collect()}
        tot_raw += len(raw & want) / 10
        tot_res += len(res & want) / 10
    assert tot_res >= tot_raw, (tot_res, tot_raw)


# --- scalar quantization (SQ8) ----------------------------------------------

def test_sq_full_rerank_is_exact(spark, sf_dir):
    from simba_spark.operators.pq import sq_topk, sq_train
    from simba_spark.operators.similarity import cosine_topk

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = sq_train(embs)
    q = [float(x)
         for x in embs.filter(F.col("vec_id") == 3).first()["embedding"]]
    exact = [(r.vec_id, r.cosine_sim)
             for r in cosine_topk(embs, q, 10).collect()]
    got = [(r.vec_id, round(r.cosine_sim, 6))
           for r in sq_topk(embs, model, q, 10).collect()]
    assert [v for v, _ in got] == [v for v, _ in exact]


def test_sq_recall_at_shortlist_and_code_range(spark, sf_dir):
    from simba_spark.operators.pq import sq_encode, sq_topk, sq_train
    from simba_spark.operators.similarity import cosine_topk

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = sq_train(embs)
    codes = sq_encode(embs, model)
    mn, mx = codes.select(
        F.min(F.array_min("sq_code")), F.max(F.array_max("sq_code"))
    ).first()
    assert 0 <= mn and mx <= 255
    assert codes.filter(F.size("sq_code") != model.dim).count() == 0
    # 8-bit per-dim codes: shortlist 30 recovers the exact top-10 here
    hits = 0
    for qid in (3, 11, 42):
        q = [float(x) for x in
             embs.filter(F.col("vec_id") == qid).first()["embedding"]]
        exact = {r.vec_id for r in cosine_topk(embs, q, 10).collect()}
        short = {r.vec_id
                 for r in sq_topk(embs, model, q, 10, shortlist=30).collect()}
        hits += len(exact & short)
    assert hits / 30 >= 0.9


def test_sq_reconstruction_error_bound(spark):
    from simba_spark.operators.pq import SQModel, sq_encode

    rows = [(i, [float(i % 7) - 3.0, float(i % 5) * 2.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model_l2 = __import__(
        "simba_spark.operators.pq", fromlist=["sq_train"]
    ).sq_train(df, metric="l2", dim=2)
    enc = sq_encode(df, model_l2).collect()
    inv = model_l2.inv_scale
    for r in enc:
        orig = dict(rows)[r.vec_id]
        for i, c in enumerate(r.sq_code):
            approx = model_l2.lo[i] + c * inv[i]
            # half-step quantization bound
            assert abs(approx - orig[i]) <= (model_l2.hi[i] - model_l2.lo[i]) / 510 + 1e-12


def test_sq_model_roundtrip_and_validation(spark):
    from simba_spark.operators.pq import SQModel

    m = SQModel(2, "cosine", [0.0, -1.0], [1.0, 1.0])
    m2 = SQModel.from_json(m.to_json())
    assert (m2.dim, m2.metric, m2.lo, m2.hi) == (2, "cosine", m.lo, m.hi)
    # constant dim: zero slopes, no div-by-zero
    c = SQModel(1, "l2", [2.0], [2.0])
    assert c.scale == [0.0] and c.inv_scale == [0.0]
    with pytest.raises(ValueError):
        SQModel(2, "dot", [0.0], [1.0])


# --- ivfpq_knn_join (IVF×PQ two-sided kNN join, round 11) --------------------


def test_ivfpq_knn_join_full_probe_full_shortlist_is_exact(embs):
    """nprobe = n_centroids with an all-pass shortlist exercises the
    whole codes pipeline (coarse assign, PQ encode, join-form ADC,
    shortlist window, exact re-rank) and equals the exact join by
    construction — the oracle configuration."""
    from simba_spark.operators.similarity import (ivf_knn_join,
                                                  ivfpq_knn_join,
                                                  knn_join_vectors)

    sub = embs.filter(F.col("vec_id") < 80)
    got = sorted(map(tuple, ivfpq_knn_join(
        sub, k=3, n_centroids=4, nprobe=4, m=8, nbits=4,
        shortlist=10_000).collect()))
    exact = sorted(map(tuple, knn_join_vectors(
        sub, 3, algo="exact").collect()))
    assert got == exact
    # the codes=True delegation on ivf_knn_join routes here
    via = sorted(map(tuple, ivf_knn_join(
        sub, k=3, n_centroids=4, nprobe=4, codes=True, m=8, nbits=4,
        shortlist=10_000).collect()))
    assert via == exact


def test_ivfpq_knn_join_recall_grows_with_shortlist(embs):
    from simba_spark.operators.similarity import ivfpq_knn_join

    base = embs.filter(F.col("vec_id") < 160)
    left = base.filter(F.col("vec_id") % 2 == 0)
    right = base.filter(F.col("vec_id") % 2 == 1)
    # full probe + all-pass shortlist = the exact two-sided reference
    full = ivfpq_knn_join(left, right, k=3, n_centroids=4, nprobe=4,
                          m=8, nbits=4, shortlist=10_000).collect()
    exact = {(r.a_id, r.b_id) for r in full}

    def recall(sl):
        hit = {(r.a_id, r.b_id) for r in ivfpq_knn_join(
            left, right, k=3, n_centroids=4, nprobe=4, m=8, nbits=4,
            shortlist=sl).collect()}
        return len(hit & exact) / len(exact)

    r5, r20 = recall(5), recall(20)
    assert 0 < r5 <= r20
    assert r20 >= 0.8  # ADC ordering is informative, not random


def test_ivfpq_knn_join_plan_code_width_candidates(embs):
    """The candidate stage carries PQ codes, not right vectors: the
    plan has exactly TWO equi-joins (list join on codes + the skinny
    id re-rank join), never a cartesian, and the ADC shortlist window
    sits between them — right vectors are touched only after the
    shortlist."""
    from simba_spark.operators.similarity import ivfpq_knn_join

    sub = embs.filter(F.col("vec_id") < 60)
    df = ivfpq_knn_join(sub, k=2, n_centroids=4, nprobe=2, m=8,
                        nbits=4, shortlist=5)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    njoin = sum(p.count(j) for j in
                ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert njoin == 2
    assert "__pqc" in p          # candidates are code-width
    assert "__srank" in p        # ADC shortlist window exists
    # the __vb vector column appears ONLY in the re-rank subtree —
    # never below the shortlist window (string order: the plan prints
    # top-down, re-rank join above the window input)
    assert "__vb" in p


def test_ivfpq_knn_join_drops_invalid_vectors(embs, spark):
    from simba_spark.operators.similarity import ivfpq_knn_join

    base = embs.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    bad = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    clean = sorted(map(tuple, ivfpq_knn_join(
        base, k=2, n_centroids=4, nprobe=4, m=8, nbits=4,
        shortlist=10_000).collect()))
    dirty = sorted(map(tuple, ivfpq_knn_join(
        base.unionByName(bad), k=2, n_centroids=4, nprobe=4, m=8,
        nbits=4, shortlist=10_000).collect()))
    assert dirty == clean
