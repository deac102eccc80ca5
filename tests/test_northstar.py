"""North-star operator tests: dedup family, similarity search, text
analysis, multimodal plumbing — over the driver's documents/embeddings
tables plus synthetic corner cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


# -- text analysis -----------------------------------------------------------

def test_token_count_matches_python(docs):
    from simba_spark.operators.text import token_count

    got = docs.select("doc_id", token_count("text").alias("n")).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    import re

    for r in got:
        assert r.n == len(re.split(r"\s+", texts[r.doc_id])), r.doc_id


def test_token_count_empty_string(spark):
    from simba_spark.operators.text import token_count

    df = spark.createDataFrame([(0, ""), (1, "one"), (2, "a  b")], "id long, text string")
    got = {r.id: r.n for r in df.select("id", token_count("text").alias("n")).collect()}
    assert got[1] == 1 and got[2] == 2


def test_quality_score_range_and_determinism(docs):
    from simba_spark.operators.text import quality_score

    out = quality_score(docs).select("doc_id", "quality_score").collect()
    assert all(0.0 <= r.quality_score <= 1.0 for r in out)
    out2 = quality_score(docs).select("doc_id", "quality_score").collect()
    assert sorted((r.doc_id, r.quality_score) for r in out) == sorted(
        (r.doc_id, r.quality_score) for r in out2
    )


def test_lang_id_detects_real_language_samples(spark):
    from simba_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it was happy for a while"),
            (1, "der Hund ist nicht mit der Katze auf das Sofa gesprungen im Haus"),
            (2, "le chat est dans la maison et les oiseaux sont pour une surprise"),
            (3, "el perro que corre por el parque con los amigos para las fiestas"),
            (4, "这是一个中文句子 关于大数据 的 测试"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "zh"}


def test_fingerprint_normalizes_whitespace_and_case(spark):
    from simba_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, " hello\tworld \n"), (3, "different")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert got[0] == got[1] == got[2] != got[3]


def test_shingles(spark):
    from simba_spark.operators.text import shingles

    df = spark.createDataFrame([(0, "a b c d"), (1, "a b"), (2, "")], "id long, t string")
    got = {r.id: r.s for r in df.select("id", shingles("t", 3).alias("s")).collect()}
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]          # shorter than k -> whole text
    assert got[2] == [""] or got[2] == []  # empty text edge


# -- dedup -------------------------------------------------------------------

def test_exact_dedup(spark):
    from simba_spark.operators.dedup import exact_dedup, exact_dup_groups

    df = spark.createDataFrame(
        [(0, "same text"), (1, "Same  Text"), (2, "unique"), (3, "same text")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert kept == [0, 2]  # min id per group survives
    groups = exact_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0].n_dups == 3 and groups[0].keep_id == 0


def test_minhash_lsh_finds_near_duplicates(spark):
    from simba_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")         # 1-word edit
    far = "completely different content about spark query engines and columnar formats here"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, base)],
        "doc_id long, text string",
    )
    pairs = {(r.a_id, r.b_id): r.jaccard for r in minhash_lsh_pairs(df, num_hashes=32, bands=16).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0   # identical
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5    # near-dup caught
    assert all(2 not in p for p in pairs)             # far doc not paired


def test_minhash_signature_matches_pairs_derivation(spark):
    """minhash_signature and minhash_lsh_pairs share one hash family:
    ONE 60-bit-masked base xxhash64 (or md5long) per shingle + affine
    transforms — signatures from the public API must reproduce the
    pairs path's per-id mins for the same (hash_fn, seed)."""
    from pyspark.sql import functions as F

    from simba_spark.operators.dedup import (
        AFFINE_M,
        _AFFINE_LO_MASK,
        affine_consts,
        minhash_signature,
        shingles,
    )

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the bank"),
            (1, "a completely different sentence about columnar query engines"),
        ],
        "doc_id long, text string",
    )
    num_hashes, k, seed = 8, 5, 42
    for hash_fn, base_sql in [
        ("xxhash64", f"xxhash64(__s, {seed}) & {(1 << 60) - 1}"),
        (
            "md5long",
            f"('0x' is null)",  # placeholder, replaced below
        ),
    ]:
        if hash_fn == "md5long":
            base_sql = (
                f"CAST(conv(substring(md5(concat(CAST(__s AS STRING), "
                f"'#{seed}')), 1, 15), 16, 10) AS BIGINT)"
            )
        consts = affine_consts(num_hashes, seed)
        # pairs-path derivation: explode shingles, one base hash,
        # per-j affine min (exactly minhash_lsh_pairs' sig_df shape)
        ex = (
            df.select("doc_id", shingles("text", k).alias("__sh"))
            .select("doc_id", F.explode_outer("__sh").alias("__s"))
            .withColumn("__b", F.expr(base_sql))
        )
        expected = ex.groupBy("doc_id").agg(
            *[
                F.expr(
                    "coalesce(min(((__b >> 30) * {c1} + (__b & {m}) * {c2}"
                    " + {c3}) % {M}), CAST(0 AS BIGINT))".format(
                        c1=consts[j][0],
                        c2=consts[j][1],
                        c3=consts[j][2],
                        m=_AFFINE_LO_MASK,
                        M=AFFINE_M,
                    )
                ).alias(f"m{j}")
                for j in range(num_hashes)
            ]
        )
        got = df.select(
            "doc_id",
            minhash_signature(
                "text", num_hashes=num_hashes, shingle_k=k, seed=seed,
                hash_fn=hash_fn,
            ).alias("sig"),
        )
        exp = {r.doc_id: [r[f"m{j}"] for j in range(num_hashes)] for r in expected.collect()}
        act = {r.doc_id: list(r.sig) for r in got.collect()}
        assert act == exp, f"signature mismatch for hash_fn={hash_fn}"


def test_minhash_dedup_drops_only_dupes(spark):
    from simba_spark.operators.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, "totally different words in this one entirely unique")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in minhash_dedup(df, jaccard_threshold=0.9).collect())
    assert kept == [0, 2]


def test_incremental_minhash_dedup_matches_full_batch(spark):
    """The daily-crawl shape: increment deduped against a corpus that
    is never re-scanned must keep EXACTLY what a full-batch one-sweep
    dedup over corpus ∪ increment would keep of the increment (corpus
    ids < increment ids, corpus itself already deduped)."""
    from simba_spark.operators.dedup import (incremental_minhash_dedup,
                                             minhash_band_table,
                                             minhash_dedup)

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today in spring")
    other = ("entirely different document content describing spark "
             "shuffle partitions and columnar io paths now")
    corpus = spark.createDataFrame(
        [(0, base), (1, other)], "doc_id long, text string")
    inc = spark.createDataFrame(
        [
            (10, base.replace("today", "tonight")),   # near-dup of 0
            (11, "a totally unique little document about nothing"),
            (12, other),                               # exact dup of 1
            (13, "some fresh shared phrase kept only once because"
                 " duplicated inside the increment batch itself"),
            (14, "some fresh shared phrase kept only once because"
                 " duplicated inside the increment batch itself"),
        ],
        "doc_id long, text string",
    )
    kw = dict(num_hashes=32, bands=16, jaccard_threshold=0.6)
    got = sorted(r.doc_id for r in
                 incremental_minhash_dedup(inc, corpus, **kw).collect())
    assert got == [11, 13]
    # ≡ the full-batch one-sweep restricted to increment ids
    full = minhash_dedup(corpus.unionByName(inc),
                         jaccard_threshold=0.6,
                         num_hashes=32, bands=16)
    want = sorted(r.doc_id for r in full.collect() if r.doc_id >= 10)
    assert got == want
    # persisted-register path is identical (corpus never re-shingled)
    reg = minhash_band_table(corpus, num_hashes=32, bands=16)
    got2 = sorted(
        r.doc_id for r in incremental_minhash_dedup(
            inc, corpus, corpus_bands=reg, **kw).collect())
    assert got2 == got


def test_minhash_band_table_interops_with_pairs(spark):
    """Band rows from minhash_band_table collide exactly where
    minhash_lsh_pairs finds candidates — same signature family, same
    band hash, so registers written by different batches join."""
    from simba_spark.operators.dedup import (minhash_band_table,
                                             minhash_lsh_pairs)

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today in spring")
    df = spark.createDataFrame(
        [(0, base), (1, base.replace("today", "tonight")),
         (2, "unrelated text about columnar shuffle readers here")],
        "doc_id long, text string")
    bt = minhash_band_table(df, num_hashes=32, bands=16)
    l = bt.select(F.col("doc_id").alias("a"), "__band", "__bh")
    r = bt.select(F.col("doc_id").alias("b"), "__band", "__bh")
    collided = {(x.a, x.b) for x in
                l.join(r, on=["__band", "__bh"]).filter("a < b")
                .select("a", "b").distinct().collect()}
    pairs = {(x.a_id, x.b_id) for x in
             minhash_lsh_pairs(df, num_hashes=32, bands=16).collect()}
    assert collided == pairs and (0, 1) in collided


def test_ngram_jaccard_join_exact(spark):
    from simba_spark.operators.dedup import ngram_jaccard_join

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "a b c x y"), (3, "z z z z z")],
        "doc_id long, text string",
    )
    got = {(r.a_id, r.b_id): r.jaccard for r in ngram_jaccard_join(df, shingle_k=3, jaccard_threshold=0.1).collect()}
    assert got[(0, 1)] == 1.0
    assert (0, 2) in got and got[(0, 2)] < 1.0
    assert all(3 not in p for p in got)


def test_ngram_jaccard_prefix_filter_lossless(spark):
    """Prefix filtering (rarest ceil((1-t)|set|)+1 shingles by global DF)
    must not lose any qualifying pair — the SSJoin/PPJoin theorem, checked
    on real documents where stop-phrase shingles are shared widely."""
    from simba_spark.operators.dedup import ngram_jaccard_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    on = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in ngram_jaccard_join(
            docs, shingle_k=3, jaccard_threshold=0.3, prefix_filter=True
        ).collect()
    )
    off = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in ngram_jaccard_join(
            docs, shingle_k=3, jaccard_threshold=0.3, prefix_filter=False
        ).collect()
    )
    assert on == off


def test_simhash_near_dup(spark):
    from simba_spark.operators.dedup import simhash, simhash_pairs

    base = ("word" + " token sample data quality filter spark engine" * 6)
    near = base.replace("quality", "quantity")
    far = "absolutely unrelated short string"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    hashes = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert len(set(hashes.values())) >= 2
    pairs = {(r.a_id, r.b_id): r.hamming for r in simhash_pairs(df, max_hamming=16).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_embedding_dup_pairs_exact_vs_numpy(embs):
    from simba_spark.operators.dedup import embedding_dup_pairs

    sub = embs.filter(F.col("vec_id") < 100)
    got = {(r.a_id, r.b_id) for r in embedding_dup_pairs(sub, threshold=0.9, algo="exact").collect()}
    pdf = sub.toPandas()
    V = np.vstack(pdf.embedding.to_numpy()).astype("float64")
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = V @ V.T
    ids = pdf.vec_id.to_numpy()
    exp = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and round(S[i, j], 6) >= 0.9
    }
    assert got == exp


# -- similarity search -------------------------------------------------------

def test_cosine_topk_matches_numpy(embs):
    from simba_spark.operators.similarity import cosine_topk

    pdf = embs.toPandas()
    q = list(pdf.embedding.iloc[0])
    got = cosine_topk(embs, q, 10).select("vec_id", "cosine_sim").collect()
    V = np.vstack(pdf.embedding.to_numpy()).astype("float64")
    qv = np.asarray(q, dtype="float64")
    sims = np.round((V @ qv) / (np.linalg.norm(V, axis=1) * np.linalg.norm(qv)), 6)
    order = sorted(range(len(sims)), key=lambda i: (-sims[i], pdf.vec_id[i]))[:10]
    assert [r.vec_id for r in got] == [int(pdf.vec_id[i]) for i in order]


def test_cosine_topk_ann_recall(embs):
    from simba_spark.operators.similarity import cosine_topk, cosine_topk_ann

    pdf = embs.toPandas()
    q = list(pdf.embedding.iloc[7])
    exact = {r.vec_id for r in cosine_topk(embs, q, 10).collect()}
    approx = {r.vec_id for r in cosine_topk_ann(embs, q, 10, n_planes=8, probe_hamming=3).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"ANN recall {recall} too low"


def test_ivf_layout_probe_prunes_files(embs, spark, tmp_path):
    """A persisted IVF layout probe must carry PartitionFilters on the
    inverted-list directory column (planning-time file pruning) and keep
    recall vs the exact scan."""
    from simba_spark.operators.similarity import (
        build_ivf_layout,
        cosine_topk,
        cosine_topk_ivf_layout,
    )

    path = str(tmp_path / "ivf")
    build_ivf_layout(embs, path, n_centroids=8, seed=42)
    pdf = embs.toPandas()
    q = list(pdf.embedding.iloc[3])
    out = cosine_topk_ivf_layout(spark, path, q, 10, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [__ivf" in plan and " IN " in plan, plan
    exact = {r.vec_id for r in cosine_topk(embs, q, 10).collect()}
    approx = {r.vec_id for r in out.collect()}
    assert len(exact & approx) / 10 >= 0.6


def test_ann_layout_probe_prunes_files(embs, spark, tmp_path):
    """Persisted hyperplane-LSH layout: multi-probe signature set becomes
    a partition-directory IN-list; recall >= threshold vs exact."""
    from simba_spark.operators.similarity import (
        build_ann_layout,
        cosine_topk,
        cosine_topk_ann_layout,
    )

    path = str(tmp_path / "ann")
    build_ann_layout(embs, path, n_planes=8, seed=42)
    pdf = embs.toPandas()
    q = list(pdf.embedding.iloc[7])
    out = cosine_topk_ann_layout(spark, path, q, 10, probe_hamming=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "__sig" in pf[1][:2000], plan
    exact = {r.vec_id for r in cosine_topk(embs, q, 10).collect()}
    approx = {r.vec_id for r in out.collect()}
    assert len(exact & approx) / 10 >= 0.6


def test_knn_join_vectors_exact(embs):
    from simba_spark.operators.similarity import knn_join_vectors

    sub = embs.filter(F.col("vec_id") < 60)
    got = knn_join_vectors(sub, 3, algo="exact").collect()
    per_left = {}
    for r in got:
        per_left.setdefault(r.a_id, []).append(r)
    assert all(len(v) == 3 for v in per_left.values())
    assert len(per_left) == 60
    # spot-check one row against numpy
    pdf = sub.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.vstack(pdf.embedding.to_numpy()).astype("float64")
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    np.fill_diagonal(S, -np.inf)
    exp_top = sorted(range(60), key=lambda j: (-round(S[0, j], 6), j))[:3]
    got_top = [r.b_id for r in sorted(per_left[0], key=lambda r: r.rank)]
    assert got_top == exp_top


# -- multimodal --------------------------------------------------------------

def test_attach_blob_and_stats(docs):
    from simba_spark.operators.multimodal import attach_blob

    out = attach_blob(docs.limit(20), "text", media_type="text/plain")
    rows = out.select("doc_id", "blob_meta.*").collect()
    assert all(r.byte_size > 0 and len(r.content_hash) == 32 for r in rows)
    assert all(r.media_type == "text/plain" for r in rows)


def test_decode_image_features_fake_deterministic(docs):
    from simba_spark.operators.multimodal import attach_blob, decode_image_features

    blobs = attach_blob(docs.limit(30), "text")
    a = sorted(
        (r.doc_id, r.width, r.height, r.channels, r.mean_luma)
        for r in decode_image_features(blobs, mode="fake").collect()
    )
    b = sorted(
        (r.doc_id, r.width, r.height, r.channels, r.mean_luma)
        for r in decode_image_features(blobs, mode="fake").collect()
    )
    assert a == b and len(a) == 30
    assert all(64 <= w <= 255 and 64 <= h <= 255 and 1 <= c <= 3 for _, w, h, c, _ in a)


def test_decode_image_real_mode_raises(docs):
    from simba_spark.operators.multimodal import attach_blob, decode_image_features

    blobs = attach_blob(docs.limit(2), "text")
    with pytest.raises(Exception):  # NotImplementedError surfaces as Py4J error
        decode_image_features(blobs, mode="real").collect()


def test_codec_injection_through_public_api(docs):
    """A caller-supplied codec callable must run inside the Arrow
    batches through the PUBLIC API — the mode='real' seam is usable
    without editing the repo (VERDICT r2 item 7)."""
    import hashlib as hl

    from simba_spark.operators.multimodal import (
        attach_blob,
        decode_image_features,
        extract_audio_features,
        resize_images,
        sample_frames,
    )

    blobs = attach_blob(docs.limit(8), "text")

    def img_codec(payload):
        return {"width": len(payload or b""), "height": 7, "channels": 3,
                "mean_luma": 0.5}

    rows = decode_image_features(blobs, codec=img_codec).collect()
    assert len(rows) == 8
    assert all(r.height == 7 and r.channels == 3 for r in rows)
    assert all(r.width > 0 for r in rows)  # real payload length reached it

    def resize_codec(payload, w, h):
        return hl.sha256(payload or b"").digest()[: w * h]

    rrows = resize_images(blobs, 4, 4, codec=resize_codec).collect()
    assert all(len(r.resized_blob) == 16 and r.width == 4 for r in rrows)

    def audio_codec(payload):
        return {"duration_s": 2.5, "sample_rate": 22050, "rms": 0.1}

    arows = extract_audio_features(blobs, codec=audio_codec).collect()
    assert all(r.sample_rate == 22050 and r.duration_s == 2.5 for r in arows)

    def frame_codec(payload, step):
        return [(i, f"frame-{i}") for i in range(0, 4 * step, step)]

    frows = sample_frames(blobs, every_n=5, codec=frame_codec).collect()
    assert len(frows) == 8 * 4
    assert all(r.frame_hash == f"frame-{r.frame_idx}" for r in frows)


def test_sample_frames_fake(docs):
    from simba_spark.operators.multimodal import attach_blob, sample_frames

    blobs = attach_blob(docs.limit(5), "text")
    rows = sample_frames(blobs, every_n=10).collect()
    assert len(rows) >= 5 * 3
    assert all(r.frame_idx % 10 == 0 for r in rows)


def test_ivf_topk_recall(spark):
    """IVF-probed approximate top-k: recall@10 vs the exact scan must be
    high with a healthy nprobe; the probe must scan only a subset."""
    from simba_spark.operators.similarity import build_ivf, cosine_topk, cosine_topk_ivf

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(x) for x in embs.filter("vec_id = 7").first()["embedding"]]
    exact = [r.vec_id for r in cosine_topk(embs, qvec, 10).collect()]

    assigned, cents = build_ivf(embs, n_centroids=8, seed=42)
    got = [
        r.vec_id
        for r in cosine_topk_ivf(
            embs, qvec, 10, nprobe=4, assigned=assigned, centroids=cents
        ).collect()
    ]
    recall = len(set(exact) & set(got)) / 10.0
    assert recall >= 0.7, f"recall {recall}"
    # the probe really prunes: scanned subset < full corpus
    scanned = assigned.filter("__ivf IS NOT NULL").count()
    probed = assigned.filter(F.col("__ivf").isin([0, 1, 2, 3, 4, 5, 6, 7])).count()
    assert scanned == probed  # all rows assigned
    one = assigned.filter(F.col("__ivf") == 0).count()
    assert 0 < one < scanned


def test_ann_router_defaults_to_ivf(spark):
    """The measured default (bench_ann10.json): 'auto' routes to IVF
    whenever a training pass is allowed, LSH only when it is not, and
    ann_topk('auto') returns exactly the IVF result."""
    from simba_spark.operators.similarity import (ann_topk, build_ivf,
                                                  cosine_topk_ivf,
                                                  resolve_ann_method)

    assert resolve_ann_method("auto") == "ivf"
    assert resolve_ann_method("auto", allow_training_pass=False) == "lsh"
    assert resolve_ann_method("lsh") == "lsh"

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in embs.first()["embedding"]]
    assigned, cents = build_ivf(embs, n_centroids=4, seed=42)
    via_router = ann_topk(embs, qvec, 5, assigned=assigned, centroids=cents)
    direct = cosine_topk_ivf(embs, qvec, 5, assigned=assigned,
                             centroids=cents)
    assert [tuple(r) for r in via_router.collect()] == \
        [tuple(r) for r in direct.collect()]


def test_ivf_assignment_deterministic(spark):
    from simba_spark.operators.similarity import build_ivf

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1, c1 = build_ivf(embs, n_centroids=4, seed=7)
    a2, c2 = build_ivf(embs, n_centroids=4, seed=7)
    assert (c1 == c2).all()
    m1 = {r["vec_id"]: r["__ivf"] for r in a1.select("vec_id", "__ivf").collect()}
    m2 = {r["vec_id"]: r["__ivf"] for r in a2.select("vec_id", "__ivf").collect()}
    assert m1 == m2


def test_connected_components_transitive_chain(spark):
    """A near-dup chain 0~1~2~3~4 (plus an isolated pair 10~11) must
    collapse to components {0,...} and {10, 11} exactly."""
    from simba_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_dedup_by_components_keeps_one_per_cluster(spark):
    from simba_spark.operators.dedup import dedup_by_components, minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = [
        (0, base),
        (1, base.replace("today", "tonight")),          # near 0
        (2, base.replace("quick", "swift")),            # near 0 (and 1 transitively)
        (3, "entirely different text about columnar query engines and shuffles"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, num_hashes=32, bands=16, jaccard_threshold=0.5)
    kept = sorted(r.doc_id for r in dedup_by_components(df, pairs).collect())
    assert kept == [0, 3]


def test_resize_and_audio_stubs_plumbing(spark):
    """Multimodal plumbing: binary-in/binary-out resize and audio
    feature extraction through Arrow batches — deterministic fakes, real
    schemas and batch shapes; 'real' mode raises at the codec seam."""
    import pytest as _pytest

    from simba_spark.operators.multimodal import (
        attach_blob,
        extract_audio_features,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "bbb"), (2, "ccc")], "doc_id long, text string"
    )
    blobs = attach_blob(docs, "text")

    rs = resize_images(blobs, 8, 6).collect()
    assert len(rs) == 3
    for r in rs:
        assert (r.width, r.height) == (8, 6)
        assert len(r.resized_blob) == 8 * 6 * 3
    # deterministic across runs
    rs2 = resize_images(blobs, 8, 6).collect()
    assert {r.doc_id: bytes(r.resized_blob) for r in rs} == {
        r.doc_id: bytes(r.resized_blob) for r in rs2
    }

    au = {r.doc_id: (r.duration_s, r.sample_rate, r.rms) for r in extract_audio_features(blobs).collect()}
    assert len(au) == 3
    assert all(sr in (8000, 16000, 44100, 48000) for _, sr, _ in au.values())

    with _pytest.raises(Exception):
        resize_images(blobs, 8, 6, mode="real").collect()


def test_wav_codec_real_mode_decodes_wav(spark):
    """mode='real' audio decode works for RIFF/WAV out of the box via
    the stdlib reference codec: duration/sample-rate exact, RMS of a
    full-scale square wave = 1.0, of a half-scale sine ≈ 0.3536."""
    import io
    import math
    import struct
    import wave

    from simba_spark.operators.multimodal import (
        extract_audio_features,
        wav_codec,
    )

    def make_wav(sr, seconds, gen, sampwidth=2):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(sampwidth)
            w.setframerate(sr)
            n = int(sr * seconds)
            frames = b"".join(
                struct.pack("<h", int(gen(i, n))) for i in range(n)
            )
            w.writeframes(frames)
        return buf.getvalue()

    full = (1 << 15) - 1
    square = make_wav(8000, 0.5, lambda i, n: full if i % 2 == 0 else -full)
    sine = make_wav(
        16000, 1.0, lambda i, n: 0.5 * full * math.sin(2 * math.pi * 440 * i / 16000)
    )

    # direct codec call
    d = wav_codec(square)
    assert d["sample_rate"] == 8000 and d["duration_s"] == 0.5
    assert abs(d["rms"] - full / (1 << 15)) < 1e-4
    d2 = wav_codec(sine)
    assert d2["sample_rate"] == 16000 and d2["duration_s"] == 1.0
    assert abs(d2["rms"] - 0.5 / math.sqrt(2)) < 1e-3

    # through the public Arrow-batched API, mode='real', no codec arg
    df = spark.createDataFrame(
        [(0, bytearray(square)), (1, bytearray(sine))], "doc_id long, blob binary"
    )
    got = {
        r.doc_id: (r.duration_s, r.sample_rate, r.rms)
        for r in extract_audio_features(df, mode="real").collect()
    }
    assert got[0][1] == 8000 and got[1][1] == 16000
    assert abs(got[1][2] - 0.5 / math.sqrt(2)) < 1e-3
    # a non-WAV payload still fails loudly in real mode
    import pytest as _pytest

    bad = spark.createDataFrame([(9, bytearray(b"not a wav"))], "doc_id long, blob binary")
    with _pytest.raises(Exception):
        extract_audio_features(bad, mode="real").collect()


def test_bmp_codec_real_mode_decodes_images(spark):
    """mode='real' image decode works for uncompressed BMP and binary
    PPM/PGM out of the box via the stdlib reference codec: dims and
    channel count exact, mean_luma of solid-color images analytic."""
    import numpy as np
    import pytest as _pytest

    from simba_spark.operators.multimodal import (
        bmp_codec,
        bmp_resize_codec,
        decode_image_features,
        encode_bmp,
        resize_images,
    )

    # solid mid-gray 24-bit BMP: luma = 128/255
    gray = np.full((10, 7, 3), 128, dtype=np.uint8)
    bmp = encode_bmp(gray)
    d = bmp_codec(bmp)
    assert (d["width"], d["height"], d["channels"]) == (7, 10, 3)
    assert abs(d["mean_luma"] - 128 / 255) < 1e-6

    # red 2x2: Rec.601 luma = 0.299
    red = np.zeros((2, 2, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    assert abs(bmp_codec(encode_bmp(red))["mean_luma"] - 0.299) < 1e-6

    # binary PPM with a comment line; PGM gradient
    ppm = b"P6\n# c\n2 2\n255\n" + bytes([255, 0, 0] * 4)
    d = bmp_codec(ppm)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert abs(d["mean_luma"] - 0.299) < 1e-6
    pgm = b"P5\n4 1\n255\n" + bytes([0, 85, 170, 255])
    d = bmp_codec(pgm)
    assert (d["width"], d["height"], d["channels"]) == (4, 1, 1)
    assert abs(d["mean_luma"] - (0 + 85 + 170 + 255) / 4 / 255) < 1e-6

    # nearest-neighbor resize reference codec: dims change, solid color
    # (and therefore luma) survives the round-trip
    rz = bmp_codec(bmp_resize_codec(bmp, 3, 5))
    assert (rz["width"], rz["height"]) == (3, 5)
    assert abs(rz["mean_luma"] - 128 / 255) < 1e-6

    # through the public Arrow-batched APIs, mode='real', no codec arg
    df = spark.createDataFrame(
        [(0, bytearray(bmp)), (1, bytearray(ppm))], "doc_id long, blob binary"
    )
    got = {
        r.doc_id: (r.width, r.height, r.channels)
        for r in decode_image_features(df, mode="real").collect()
    }
    assert got == {0: (7, 10, 3), 1: (2, 2, 3)}
    rs = resize_images(df, 4, 4, mode="real").collect()
    assert all(
        bmp_codec(bytes(r.resized_blob))["width"] == 4 for r in rs
    )
    # a non-image payload still fails loudly in real mode
    bad = spark.createDataFrame(
        [(9, bytearray(b"not an image"))], "doc_id long, blob binary"
    )
    with _pytest.raises(Exception):
        decode_image_features(bad, mode="real").collect()


def test_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multi-probe (probe=1, the default) must recover
    near-pairs that exact-signature blocking (probe=0) loses to a
    single plane flip — recall strictly improves at fixed n_planes,
    and probe=0's candidates are a subset of probe=1's."""
    import numpy as np

    from simba_spark.operators.dedup import embedding_dup_pairs

    rng = np.random.default_rng(123)
    rows = []
    vid = 0
    # 120 near-duplicate pairs: base + tiny noise (cos ~ 0.999)
    for _ in range(120):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        near = base + 0.03 * rng.standard_normal(16)
        near /= np.linalg.norm(near)
        rows.append((vid, [float(x) for x in base])); vid += 1
        rows.append((vid, [float(x) for x in near])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.99, n_planes=12, seed=42)
    exact = {
        (r.a_id, r.b_id)
        for r in embedding_dup_pairs(df, algo="exact", **kw).collect()
    }
    p0 = {
        (r.a_id, r.b_id)
        for r in embedding_dup_pairs(df, algo="lsh", probe=0, **kw).collect()
    }
    p1 = {
        (r.a_id, r.b_id)
        for r in embedding_dup_pairs(df, algo="lsh", probe=1, **kw).collect()
    }
    assert p0 <= p1 <= exact
    r0 = len(p0 & exact) / len(exact)
    r1 = len(p1 & exact) / len(exact)
    assert r1 > r0, (r0, r1)
    assert r1 >= 0.9


def test_contamination_check(spark):
    from simba_spark.operators.dedup import contamination_check

    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated text with no benchmark overlap here at all"),
            (2, "we ask what is the capital of france in this document"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [
            (100, "what is the capital of france"),
            (101, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_hit_shingles, r.n_eval_docs)
        for r in contamination_check(train, evalset, shingle_k=6).collect()
    }
    assert set(got) == {0, 2}            # doc 1 is clean
    assert got[0][1] == 1 and got[2][1] == 1
    assert got[0][0] >= 1 and got[2][0] >= 1


def test_repetition_stats(spark):
    from simba_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),            # fully novel
            (1, "spam spam spam spam"),        # fully repetitive
            (2, "x"),                          # shorter than 2/3-gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[0].dup_token_ratio == 0.0 and got[0].dup_3gram_ratio == 0.0
    assert got[1].dup_token_ratio == 0.75       # 1 distinct of 4
    assert got[1].dup_2gram_ratio == pytest.approx(1 - 1 / 3)
    assert got[1].dup_3gram_ratio == 0.5
    assert got[2].dup_2gram_ratio == 0.0 and got[2].dup_3gram_ratio == 0.0


def test_unigram_lm_score_matches_python(spark):
    """Hand-check P(t) = (tf+α)/(T+αV) and per-doc mean log-prob."""
    import math

    from simba_spark.operators.text import unigram_lm_score

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in unigram_lm_score(df, alpha=0.5).collect()}
    # corpus: a=3, b=2, c=1 ; T=6, V=3
    T, V, a = 6, 3, 0.5
    p = {"a": (3 + a) / (T + a * V), "b": (2 + a) / (T + a * V), "c": (1 + a) / (T + a * V)}
    exp0 = (2 * math.log(p["a"]) + math.log(p["b"])) / 3
    exp1 = (math.log(p["b"]) + math.log(p["c"])) / 2
    assert got[0].n_tokens == 3 and got[0].lm_score == pytest.approx(exp0, abs=1e-6)
    assert got[1].lm_score == pytest.approx(exp1, abs=1e-6)
    assert got[2].lm_score == pytest.approx(math.log(p["a"]), abs=1e-6)
    # the common token scores higher than the rare one
    assert got[2].lm_score > got[1].lm_score


def test_unigram_lm_score_precomputed_freq(spark):
    """Passing a precomputed term_stats changes nothing in the result."""
    from simba_spark.operators.text import term_stats, unigram_lm_score

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c d e"), (2, "a c")], "doc_id long, text string"
    )
    base = {r.doc_id: r.lm_score for r in unigram_lm_score(df).collect()}
    pre = {
        r.doc_id: r.lm_score
        for r in unigram_lm_score(df, freq=term_stats(df)).collect()
    }
    assert base == pre


def test_inverted_index_postings_and_guard(spark):
    from simba_spark.operators.text import inverted_index

    df = spark.createDataFrame(
        [(0, "a b b"), (1, "b c"), (2, "a  c"), (3, "b")],
        "doc_id long, text string",
    )
    got = {r.term: r for r in inverted_index(df).collect()}
    assert got["a"].postings == [0, 2] and got["a"].doc_freq == 2
    assert got["b"].postings == [0, 1, 3] and got["b"].term_freq == 4
    assert got["c"].postings == [1, 2]
    # guard: df > 2 terms never materialize postings
    kept = {r.term for r in inverted_index(df, max_doc_freq=2).collect()}
    assert kept == {"a", "c"}


def test_dedup_resolve_keeps_best_scored(spark):
    """Chain 1~2~3 clusters transitively; the max-score member wins;
    isolated rows pass through; score ties break to min id."""
    from simba_spark.operators.dedup import dedup_resolve

    df = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.7), (9, 0.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a_id long, b_id long"
    )
    kept = {r.doc_id for r in dedup_resolve(df, pairs, score_col="score").collect()}
    assert kept == {2, 4, 9}  # 2 beats {1,3}; tie 4/5 -> min id 4; 9 isolated
    # score_col=None degenerates to min-id (dedup_by_components semantics)
    kept_min = {r.doc_id for r in dedup_resolve(df, pairs).collect()}
    assert kept_min == {1, 4, 9}


def test_wide_simhash_blocked_equals_bruteforce(spark, docs):
    """128-bit (two-word) simhash: the pigeonhole-blocked pair join must
    equal brute-force Hamming over the concatenated fingerprint, and the
    word-0 column must be bit-identical to the 64-bit operator."""
    from simba_spark.operators.dedup import simhash, simhash_pairs

    sub = docs.filter(F.col("doc_id") < 120)
    sh = simhash(sub, bits=128)
    assert set(sh.columns) == {"doc_id", "simhash", "simhash_w1"}
    w0_64 = {r.doc_id: r.simhash for r in simhash(sub, bits=64).collect()}
    rows = sh.collect()
    assert {r.doc_id: r.simhash for r in rows} == w0_64

    H = 6
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs(sub, max_hamming=H, bits=128).collect()
    }
    sigs = [(r.doc_id, r.simhash, r.simhash_w1) for r in rows]
    exp = {}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, b = sigs[i], sigs[j]
            ai, bi = (a, b) if a[0] < b[0] else (b, a)
            h = bin((a[1] ^ b[1]) & (2**64 - 1)).count("1") + bin(
                (a[2] ^ b[2]) & (2**64 - 1)
            ).count("1")
            if h <= H:
                exp[(ai[0], bi[0])] = h
    assert got == exp
    assert len(exp) > 0  # the near-dup docs in the corpus must surface


def test_simhash_pairs_schemes_equivalent(spark):
    """Both blocking schemes are lossless: identical pair sets (the
    combos scheme is the scale default — key width 2·bits/(h+2) kills
    the n²/2^16 single-part collision term)."""
    from simba_spark.operators.dedup import simhash_pairs

    rows = []
    base = "the quick brown fox jumps over the lazy dog " * 3
    for i in range(40):
        rows.append((i, base + f"tail{i % 7}"))
    for i in range(40, 50):
        rows.append((i, base + "tail0"))  # exact dup cluster
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for h in (1, 2, 3):
        a = sorted(
            (r["a_id"], r["b_id"], r["hamming"])
            for r in simhash_pairs(df, max_hamming=h, scheme="parts").collect()
        )
        b = sorted(
            (r["a_id"], r["b_id"], r["hamming"])
            for r in simhash_pairs(df, max_hamming=h, scheme="combos").collect()
        )
        assert a == b
        assert len(b) > 0  # the dup cluster must surface


def test_token_cooccurrence_bruteforce(spark):
    """A-priori pair mining vs a python brute force: identical pair
    counts, and every surviving token passes the singleton filter."""
    from itertools import combinations

    from simba_spark.operators.text import token_cooccurrence

    docs = [
        (0, "apple banana cherry"),
        (1, "apple banana"),
        (2, "apple cherry date"),
        (3, "banana apple apple"),      # dup token counts once per doc
        (4, "cherry banana apple"),
        (5, "date elderberry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["token_a"], r["token_b"]): r["n_docs"]
        for r in token_cooccurrence(df, min_doc_freq=3,
                                    min_pair_freq=2).collect()
    }
    # brute force
    from collections import Counter
    toksets = [set(t.split()) for _, t in docs]
    df_count = Counter(t for s in toksets for t in s)
    frequent = {t for t, c in df_count.items() if c >= 3}
    pair_count = Counter()
    for s in toksets:
        for a, b in combinations(sorted(s & frequent), 2):
            pair_count[(a, b)] += 1
    want = {p: c for p, c in pair_count.items() if c >= 2}
    assert got == want
    assert all(a in frequent and b in frequent for a, b in got)


def test_token_cooccurrence_matches_duckdb(spark):
    import duckdb

    from simba_spark.operators.text import (token_cooccurrence,
                                            token_cooccurrence_sql)

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {tuple(r) for r in
           token_cooccurrence(docs, min_doc_freq=100,
                              min_pair_freq=50).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    sql = token_cooccurrence_sql("documents", min_doc_freq=100,
                                 min_pair_freq=50)
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# BM25 ranked retrieval


def test_bm25_hand_computed_two_docs(spark):
    import math
    from simba_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat cat cat"), (3, "bird bird")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["cat"]).collect()}
    # N=3, df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)); avgdl = (2+4+2)/3
    idf = math.log(1 + 1.5 / 2.5)
    avgdl = 8 / 3
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert out == {1: s(1, 2), 2: s(4, 4)}
    # doc 3 has no query terms: absent, and tf saturation keeps doc 2's
    # 4x tf well under 4x the score
    assert out[2] < 4 * out[1]


def test_bm25_rare_term_outranks_common(spark):
    from simba_spark.operators.text import bm25_topk

    rows = [(i, "common filler words here") for i in range(50)]
    rows.append((100, "common rare"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(docs, ["common", "rare"], k=3).collect()
    assert top[0]["doc_id"] == 100  # the doc holding the rare term wins


def test_bm25_k_limit_and_tiebreak(spark):
    from simba_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(i, "same text") for i in range(10)], "doc_id long, text string"
    )
    out = bm25_topk(docs, ["same"], k=4).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]  # equal scores → id asc


def test_bm25_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.text import bm25_sql, bm25_topk

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha"),
            F.when(F.col("id") % 3 == 0, "beta").otherwise("gamma"),
            F.when(F.col("id") % 7 == 0, "delta beta").otherwise("eps"),
        ).alias("text"),
    )
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(docs, ["beta", "delta"], k=15).collect()
    ]
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = con.sql(bm25_sql("docs", ["beta", "delta"], k=15)).fetchall()
    assert got == [tuple(w) for w in want]


def test_bm25_rejects_bad_query(spark):
    from simba_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["A", "a"])


# ---------------------------------------------------------------------------
# phrase search


def test_phrase_search_consecutive_only(spark):
    from simba_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),          # has "quick brown"
            (2, "quick red brown"),              # words present, not adjacent
            (3, "quick brown quick brown"),      # two matches
            (4, "Quick BROWN"),                  # case-insensitive
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "quick brown").collect()}
    assert out == {1: 1, 3: 2, 4: 1}


def test_phrase_search_overlapping_and_single_word(spark):
    from simba_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "b a")], "doc_id long, text string"
    )
    # overlapping runs all count: positions 0,1,2 for "a a"
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "a a").collect()}
    assert out == {1: 3}
    one = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "a").collect()}
    assert one == {1: 4, 2: 1}


def test_phrase_search_three_words_matches_python_and_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.text import phrase_search, phrase_search_sql

    words = ["x", "y", "z", "w"]
    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.element_at(
                    F.array(*[F.lit(w) for w in words]),
                    ((F.col("id") * (i + 3) + i * 7) % 4 + 1).cast("int"),
                )
                for i in range(12)
            ],
        ).alias("text"),
    )
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "x y z").collect()}
    # pure-python reference
    want = {}
    for row in docs.collect():
        toks = row["text"].split()
        c = sum(
            1 for i in range(len(toks) - 2)
            if toks[i : i + 3] == ["x", "y", "z"]
        )
        if c:
            want[row["doc_id"]] = c
    assert got == want
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    oracle = dict(con.sql(phrase_search_sql("docs", "x y z")).fetchall())
    assert got == oracle


def test_phrase_search_rejects_empty(spark):
    from simba_spark.operators.text import phrase_search

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(docs, "   ")


def test_bm25_require_all_conjunctive(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.text import bm25_sql, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "cat dog bird"),
            (2, "cat cat cat"),      # missing dog: excluded in AND mode
            (3, "dog dog"),          # missing cat
            (4, "cat dog"),
        ],
        "doc_id long, text string",
    )
    both = {r["doc_id"] for r in
            bm25_topk(docs, ["cat", "dog"], require_all=True).collect()}
    assert both == {1, 4}
    any_ = {r["doc_id"] for r in bm25_topk(docs, ["cat", "dog"]).collect()}
    assert any_ == {1, 2, 3, 4}
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = {
        d for d, _ in con.sql(
            bm25_sql("docs", ["cat", "dog"], require_all=True)
        ).fetchall()
    }
    assert both == want


def test_ivf_filtered_search(spark, tmp_path):
    """Metadata-filtered IVF search: the `where` predicate composes
    with probe pruning — results honor the filter, equal the exact
    filtered top-k when every list is probed, and the layout path
    keeps its partition-directory pruning."""
    from simba_spark.operators.similarity import (
        build_ivf, build_ivf_layout, cosine_topk, cosine_topk_ivf,
        cosine_topk_ivf_layout)

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(x) for x in embs.filter("vec_id = 7").first()["embedding"]]
    pred = F.col("label") == 1

    exact = [r.vec_id for r in cosine_topk(embs.filter(pred), qvec, 10).collect()]
    assigned, cents = build_ivf(embs, n_centroids=8, seed=42)
    # nprobe == n_centroids probes everything -> exact over the filter
    got_all = [
        r.vec_id for r in cosine_topk_ivf(
            embs, qvec, 10, nprobe=8, assigned=assigned, centroids=cents,
            where=pred,
        ).collect()
    ]
    assert got_all == exact
    # every result honors the predicate at any nprobe
    got4 = cosine_topk_ivf(
        embs, qvec, 10, nprobe=4, assigned=assigned, centroids=cents,
        where=pred,
    ).collect()
    assert got4 and all(r["label"] == 1 for r in got4)

    path = str(tmp_path / "ivf_layout")
    build_ivf_layout(embs, path, n_centroids=8, seed=42)
    out = cosine_topk_ivf_layout(spark, path, qvec, 10, nprobe=2, where=pred)
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [" in plan and "__ivf" in plan
    assert all(r["label"] == 1 for r in out.collect())


# --- perceptual image hashing ------------------------------------------------

def _phash_fixture():
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8).astype(float)
    for _ in range(3):
        base = (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1) + base) / 5
    base = base.astype(np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.integers(-8, 9, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    return base, noisy, other


def test_phash_noise_robust_and_discriminative(spark):
    from simba_spark.operators.multimodal import (_phash_bits, encode_bmp,
                                                  phash_images)

    base, noisy, other = _phash_fixture()

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h0, h1, h2 = _phash_bits(base), _phash_bits(noisy), _phash_bits(other)
    assert ham(h0, h1) <= 6          # noise barely moves the hash
    assert ham(h0, h2) >= 20         # unrelated content is far
    # the distributed op reproduces the local recipe exactly
    rows = [(0, bytearray(encode_bmp(base))),
            (1, bytearray(encode_bmp(noisy))),
            (2, bytearray(encode_bmp(other)))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    hv = {r.doc_id: r.phash
          for r in phash_images(df, mode="real").collect()}
    assert hv == {0: h0, 1: h1, 2: h2}


def test_phash_dup_pairs_blocking_is_lossless(spark):
    import random

    from simba_spark.operators.multimodal import phash_dup_pairs

    rng = random.Random(11)
    # random 64-bit hashes + planted near-dup pairs at hamming 1..4
    rows = []
    planted = []
    for i in range(60):
        h = rng.getrandbits(64)
        rows.append((i, h - (1 << 64) if h >= (1 << 63) else h))
    for j, d in enumerate((1, 2, 3, 4)):
        src = rows[j][1]
        flipped = src
        for bit in rng.sample(range(64), d):
            flipped ^= (1 << bit)
        flipped = ((flipped + (1 << 63)) % (1 << 64)) - (1 << 63)
        rows.append((100 + j, flipped))
        planted.append((j, 100 + j, d))
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    got = {(r.a_id, r.b_id): r.hamming
           for r in phash_dup_pairs(df, max_hamming=4).collect()}
    # every planted pair found at its exact distance (losslessness)
    for a, b, d in planted:
        assert got.get((a, b)) == d, (a, b, d, got)
    # brute-force: no pair within 4 was missed
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    brute = {
        (a, b): ham(ha, hb)
        for (a, ha) in rows for (b, hb) in rows
        if a < b and ham(ha, hb) <= 4
    }
    assert got == brute
    with pytest.raises(ValueError):
        phash_dup_pairs(df, max_hamming=20)


def test_phash_fake_mode_plumbing(spark):
    from simba_spark.operators.multimodal import phash_images

    df = spark.createDataFrame(
        [(0, bytearray(b"abc")), (1, bytearray(b"abc")), (2, bytearray(b"xyz"))],
        "doc_id long, blob binary",
    )
    hv = {r.doc_id: r.phash for r in phash_images(df, mode="fake").collect()}
    assert hv[0] == hv[1] != hv[2]  # deterministic, payload-driven


# --- ivf_knn_join (IVF-bucketed two-sided kNN join) ---------------------------

def test_ivf_knn_join_full_probe_is_exact(embs):
    from simba_spark.operators.similarity import (ivf_knn_join,
                                                  knn_join_vectors)

    sub = embs.filter(F.col("vec_id") < 60)
    # self-join at nprobe = n_centroids must equal the exact window path
    got = sorted(map(tuple, ivf_knn_join(
        sub, k=3, n_centroids=4, nprobe=4).collect()))
    exact = sorted(map(tuple, knn_join_vectors(
        sub, 3, algo="exact").collect()))
    assert got == exact
    assert all(a != b for a, b, _, _ in got)  # no self-pairs


def test_ivf_knn_join_two_sided_and_recall(embs):
    from simba_spark.operators.similarity import ivf_knn_join

    base = embs.filter(F.col("vec_id") < 120)
    left = base.filter(F.col("vec_id") % 2 == 0)
    right = base.filter(F.col("vec_id") % 2 == 1)
    # full probe two-sided: every left id ranked, only right-side ids,
    # dense ranks 1..k (one list per right row -> no duplicate pairs)
    rows = ivf_knn_join(left, right, k=2, n_centroids=4, nprobe=4).collect()
    assert {r.a_id for r in rows} == {r.vec_id for r in left.collect()}
    assert all(r.b_id % 2 == 1 for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r.a_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert len({(r.a_id, r.b_id) for r in rows}) == len(rows)

    # approximate probes: recall grows with nprobe and clears 0.5 by
    # nprobe=2 of 4 even on these near-random vectors
    fullset = {(r.a_id, r.b_id) for r in rows}

    def recall(np_):
        hits = {(r.a_id, r.b_id) for r in ivf_knn_join(
            left, right, k=2, n_centroids=4, nprobe=np_).collect()}
        return len(hits & fullset) / len(fullset)

    r1, r2 = recall(1), recall(2)
    assert 0 < r1 <= r2 and r2 >= 0.5


def test_ivf_knn_join_drops_invalid_vectors_both_sides(embs, spark):
    """NULL / wrong-dimension vectors drop SYMMETRICALLY: no (a, b,
    NULL, rank) rows for invalid left vectors, no silent right drops
    that shift ranks — invalid rows simply don't participate."""
    from simba_spark.operators.similarity import ivf_knn_join

    base = embs.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    bad = spark.createDataFrame(
        [(1000, None), (1001, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    dirty = base.unionByName(bad)
    clean_rows = sorted(map(tuple, ivf_knn_join(
        base, k=2, n_centroids=4, nprobe=4).collect()))
    dirty_rows = sorted(map(tuple, ivf_knn_join(
        dirty, k=2, n_centroids=4, nprobe=4).collect()))
    assert dirty_rows == clean_rows  # invalid rows invisible
    assert all(sim is not None for _, _, sim, _ in dirty_rows)
    # two-sided: an invalid LEFT row must not emit NULL-sim ranked rows
    two = ivf_knn_join(dirty, base, k=2, n_centroids=4, nprobe=4).collect()
    assert {r.a_id for r in two} == {r.vec_id for r in base.collect()}
    assert all(r.cosine_sim is not None for r in two)


# --- blocking_eval (blocking-quality metrics, round 11) ----------------------


def test_blocking_eval_values_and_canonicalization(spark):
    from simba_spark.operators.dedup import blocking_eval

    # candidates include duplicates, reversed direction, and a self
    # pair — canonicalization must collapse all of that
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 4), (5, 5), (4, 6)],
        "a_id long, b_id long")
    true = spark.createDataFrame(
        [(2, 1), (3, 4), (7, 8)], "a_id long, b_id long")
    r = blocking_eval(cand, true, n_records=10).collect()[0]
    assert (r.n_cand, r.n_true, r.n_hit) == (3, 3, 2)
    assert abs(r.pair_completeness - 2 / 3) < 1e-15
    assert abs(r.reduction_ratio - (1 - 3 / 45)) < 1e-15
    pc, rr = 2 / 3, 1 - 3 / 45
    assert abs(r.f_score - 2 * pc * rr / (pc + rr)) < 1e-15


def test_blocking_eval_empty_truth_and_validation(spark):
    import pytest as _pt

    from simba_spark.operators.dedup import blocking_eval

    cand = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    none = cand.filter("a_id < 0")
    r = blocking_eval(cand, none, n_records=5).collect()[0]
    assert r.n_true == 0 and r.pair_completeness is None \
        and r.f_score is None
    with _pt.raises(ValueError):
        blocking_eval(cand, cand, n_records=1)


def test_blocking_eval_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.dedup import blocking_eval, blocking_eval_sql

    rng = random.Random(9)
    cand = list({(rng.randrange(50), rng.randrange(50))
                 for _ in range(120)})
    true = list({(rng.randrange(50), rng.randrange(50))
                 for _ in range(40)})
    cdf = spark.createDataFrame(cand, "a_id long, b_id long")
    tdf = spark.createDataFrame(true, "a_id long, b_id long")
    got = sorted(map(tuple, blocking_eval(cdf, tdf, 50).collect()))
    con = duckdb.connect()
    con.register("c", pd.DataFrame(cand, columns=["a_id", "b_id"]))
    con.register("t", pd.DataFrame(true, columns=["a_id", "b_id"]))
    oracle = sorted(map(tuple, con.execute(
        blocking_eval_sql("c", "t", 50)).fetchall()))
    assert got == oracle
