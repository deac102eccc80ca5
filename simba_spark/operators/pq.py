"""Product quantization (PQ) for embedding columns — train / encode /
asymmetric-distance top-k with exact re-rank.

The memory-bound ANN path the IVF layout doesn't cover: IVF prunes
WHICH rows a probe scans; PQ shrinks WHAT each scanned row costs. A
64-d float32 vector is 256 bytes; its 8-subspace/8-bit PQ code is 8
bytes — a 32× reduction in scan bytes, which at 100 TB of embeddings
is the difference between an ANN sweep reading 3 TB of codes and one
reading all 100 TB of vectors. The two compose: route with IVF, score
the surviving lists with PQ codes, re-rank the shortlist exactly.

Scale design:
- Training is a bounded driver-side pass: ``sample_cap`` hash-selected
  vectors (engine-stable ``xxhash64`` order, the same sampler as
  ``similarity.build_ivf``) into per-subspace numpy Lloyd's. Codebook
  size is m * 2^nbits * dsub doubles — parameters, never data.
- Encoding is one distributed map pass, size-routed exactly like
  ``clustering._assign``: while m * 2^nbits * dsub stays inside the
  codegen budget the nearest-centroid argmin per subspace is a pure
  Column program (zero Python workers); past it, an Arrow
  ``mapInPandas`` kernel accumulates the SAME left-fold squared-L2 term
  order (bit-identical codes, exact ties to the lowest index).
- Query-time ADC: the m * 2^nbits lookup table of
  ||q_sub - centroid||^2 is computed driver-side from the query alone
  and inlined as a nested array literal; the per-row score is an
  m-term ``element_at`` sum over the code column — no join, no UDF,
  and a persisted codes table is scanned reading ONLY (id, code)
  (column pruning does the 32×). The shortlist is a
  TakeOrderedAndProject (shortlist rows of (id, score) to the driver
  side of the sort, never the vectors), and the exact re-rank fetches
  original vectors by id for the shortlist only.

Correctness / oracle: with ``shortlist=None`` every row is re-ranked
exactly, so the result equals brute force BY CONSTRUCTION regardless
of codebook quality — that configuration drives the DuckDB oracle row
(the same trick as the full-probe IVF row), checking the whole
train → encode → ADC → re-rank plumbing drops no rows. The
approximate configuration's recall is asserted in tests/test_pq.py.

No reference counterpart (the reference ships no vector ops) — PQ is
from Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 (public literature).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Same Janino-limit cliff as clustering._assign: total squared-diff
# terms in the encode projection = m * n_centroids * dsub.
_CODEGEN_MAX_TERMS = 512


class PQModel:
    """Trained product quantizer: per-subspace codebooks + geometry.

    ``codebooks[j][c]`` is the c-th centroid (length ``dsub``) of
    subspace j. ``metric='cosine'`` means vectors were L2-normalized
    before chunking (ADC then approximates unit-sphere L2, which is
    monotone in cosine similarity)."""

    def __init__(self, dim: int, m: int, nbits: int, metric: str,
                 codebooks: Sequence[Sequence[Sequence[float]]]):
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        if metric not in ("cosine", "l2"):
            raise ValueError(f"unknown PQ metric: {metric!r}")
        self.dim = int(dim)
        self.m = int(m)
        self.nbits = int(nbits)
        self.metric = metric
        self.codebooks = [[[float(x) for x in c] for c in book]
                          for book in codebooks]
        if len(self.codebooks) != self.m:
            raise ValueError("codebook count != m")

    @property
    def dsub(self) -> int:
        return self.dim // self.m

    def to_json(self) -> str:
        return json.dumps({
            "dim": self.dim, "m": self.m, "nbits": self.nbits,
            "metric": self.metric, "codebooks": self.codebooks,
        })

    @classmethod
    def from_json(cls, s: str) -> "PQModel":
        d = json.loads(s)
        return cls(d["dim"], d["m"], d["nbits"], d["metric"],
                   d["codebooks"])


def _normalize_rows(X):
    import numpy as np

    n = np.sqrt((X * X).sum(axis=1))
    n[n == 0] = 1.0
    return X / n[:, None]


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    metric: str = "cosine",
    sample_cap: int = 4096,
    iters: int = 10,
    seed: int = 42,
    dim: Optional[int] = None,
) -> PQModel:
    """Train per-subspace codebooks from a bounded, engine-stable
    sample (``xxhash64(vec, seed)`` order — same rows in any engine or
    partitioning). Driver cost is O(sample_cap * dim) — parameters,
    never data."""
    import numpy as np

    if dim is None:
        first = df.select(F.size(vec_col).alias("d")) \
                  .filter(F.col("d") > 0).first()
        if first is None:
            raise ValueError("pq_train: no non-empty vectors")
        dim = int(first["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = [
        r[0]
        for r in df.select(vec_col)
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>"),
                            F.lit(int(seed))))
        .limit(int(sample_cap))
        .collect()
    ]
    X = np.asarray(sample, dtype="float64")
    if metric == "cosine":
        X = _normalize_rows(X)
    books = _train_books(X, m, nbits, iters, seed)
    return PQModel(dim, m, nbits, metric, books)


def _train_books(X, m: int, nbits: int, iters: int, seed: int):
    """Per-subspace Lloyd's over a driver-side sample matrix (rows are
    the vectors to quantize — raw, normalized, or residual)."""
    from .similarity import _kmeans_centroids

    dsub = X.shape[1] // m
    books = []
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        cent = _kmeans_centroids(sub, 2 ** int(nbits), iters,
                                 seed + 1000 * j)
        books.append([[float(x) for x in c] for c in cent])
    return books


def _sub_expr(model: PQModel, j: int, vec_col: str, norm_col: str):
    """Subspace-j slice of the (optionally normalized) vector as
    array<double>. Normalization divides element-wise by the
    precomputed norm column so the fold order matches the Arrow
    kernel's."""
    dsub = model.dsub
    sl = F.slice(F.col(vec_col).cast("array<double>"),
                 j * dsub + 1, dsub)
    if model.metric == "cosine":
        sl = F.transform(sl, lambda x: x / F.col(norm_col))
    return sl


def _encode_codegen(df: DataFrame, model: PQModel, vec_col: str,
                    out_col: str) -> DataFrame:
    from .similarity import _centroid_assign_col

    norm_col = "__pq_norm"
    work = df
    if model.metric == "cosine":
        sq = F.aggregate(
            F.col(vec_col).cast("array<double>"), F.lit(0.0),
            lambda acc, x: acc + x * x)
        work = work.withColumn(
            norm_col,
            F.when(F.sqrt(sq) > 0, F.sqrt(sq)).otherwise(F.lit(1.0)))
    codes = [
        _centroid_assign_col(_sub_expr(model, j, vec_col, norm_col),
                             model.codebooks[j])
        for j in range(model.m)
    ]
    out = work.withColumn(out_col, F.array(*codes))
    return out.drop(norm_col) if model.metric == "cosine" else out


def _encode_arrow(df: DataFrame, model: PQModel, vec_col: str,
                  out_col: str) -> DataFrame:
    """Arrow kernel past the codegen cliff. Same left-fold
    accumulation order per centroid distance as the Column path
    (numpy elementwise adds one dimension at a time, NOT a
    reassociating gemm), exact ties to the lowest index — codes are
    bit-identical across routes."""
    books = model.codebooks
    dsub, metric, m = model.dsub, model.metric, model.m
    keep = [f for f in df.schema.fields if f.name != out_col]
    keep_names = [f.name for f in keep]
    schema = T.StructType(
        keep + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])

    def it(batches):
        import numpy as np

        for pdf in batches:
            out = pdf[keep_names].copy()
            if len(pdf) == 0:
                out[out_col] = []
                yield out
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if metric == "cosine":
                acc = V[:, 0] * V[:, 0]
                for i in range(1, V.shape[1]):
                    acc = acc + V[:, i] * V[:, i]
                n = np.sqrt(acc)
                n[n == 0] = 1.0
                V = V / n[:, None]
            codes = np.empty((len(pdf), m), dtype="int32")
            for j in range(m):
                sub = V[:, j * dsub:(j + 1) * dsub]
                dists = np.empty((len(pdf), len(books[j])),
                                 dtype=np.float64)
                for c, cent in enumerate(books[j]):
                    t = sub[:, 0] - cent[0]
                    a = t * t
                    for i in range(1, dsub):
                        t = sub[:, i] - cent[i]
                        a = a + t * t
                    dists[:, c] = a
                codes[:, j] = np.argmin(dists, axis=1)
            out[out_col] = [c.tolist() for c in codes]
            yield out

    return df.mapInPandas(it, schema)


def pq_encode(
    df: DataFrame,
    model: PQModel,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    route: str = "auto",
) -> DataFrame:
    """Attach the m-byte PQ code (array<int>, one entry per subspace).
    Rows with NULL or off-dimension vectors are dropped (the same
    validity contract as ``clustering.kmeans``). One map pass, zero
    shuffle; route picked by the codegen term budget."""
    if route not in ("auto", "codegen", "arrow"):
        raise ValueError(f"unknown encode route: {route!r}")
    valid = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == model.dim))
    terms = model.m * len(model.codebooks[0]) * model.dsub
    if route == "arrow" or (route == "auto"
                            and terms > _CODEGEN_MAX_TERMS):
        return _encode_arrow(valid, model, vec_col, out_col)
    return _encode_codegen(valid, model, vec_col, out_col)


def _query_lut(model: PQModel, query_vec: Sequence[float]):
    """m x 2^nbits ADC table: ||q_sub_j - centroid_c||^2."""
    import numpy as np

    q = np.asarray([float(x) for x in query_vec], dtype="float64")
    if len(q) != model.dim:
        raise ValueError(
            f"query dim {len(q)} != model dim {model.dim}")
    if model.metric == "cosine":
        n = float(np.sqrt((q * q).sum()))
        q = q / (n if n > 0 else 1.0)
    dsub = model.dsub
    lut = []
    for j in range(model.m):
        sub = q[j * dsub:(j + 1) * dsub]
        book = np.asarray(model.codebooks[j], dtype="float64")
        lut.append(((book - sub[None, :]) ** 2).sum(axis=1).tolist())
    return lut


def pq_adc_col(model: PQModel, query_vec: Sequence[float],
               code_col: str = "pq_code"):
    """Column: asymmetric distance ``sum_j lut[j][code_j]`` — an
    m-term ``element_at`` sum over nested double-array literals. Pure
    codegen arithmetic; the scan carrying it reads only the code
    column.

    Built as ONE SQL string (a single F.expr): the m × 2^nbits table
    as per-Column literals is m·2^nbits py4j round-trips (~2048 for
    8×8-bit — measured ~1 s of pure DRIVER time per LUT, ~8 s on a
    residual probe that needs one LUT per probed list)."""
    lut = _query_lut(model, query_vec)
    terms = []
    for j, row in enumerate(lut):
        arr = ",".join(repr(float(v)) + "D" for v in row)
        terms.append(
            f"element_at(array({arr}), "
            f"element_at({code_col}, {j + 1}) + 1)")
    # left-chained + keeps the historical fold order
    return F.expr(" + ".join(terms))


def pq_adc_join_col(model: PQModel, van_col: str,
                    code_col: str = "pq_code"):
    """Column: asymmetric distance between a PER-ROW query vector and
    a PER-ROW code — the JOIN form of :func:`pq_adc_col`, where the
    query is a column (every left row of a kNN join is its own query)
    so no driver-side LUT can exist. Per subspace j the code picks its
    centroid out of the literal codebook (constant-folded to one
    ArrayData) and a dsub-term fold accumulates
    ``||van[j·dsub:(j+1)·dsub] − codebook_j[code_j]||²`` — m·dsub
    multiply-adds per candidate row, the distributed ADC cost.

    ``van_col`` must already live in the metric's space (L2-normalized
    for a cosine model — the space the codes quantize). Built as ONE
    SQL string: the m × 2^nbits × dsub codebook as per-Column literals
    would be tens of thousands of py4j round-trips (the
    :func:`pq_adc_col` lesson)."""
    dsub = model.dsub
    terms = []
    for j, book in enumerate(model.codebooks):
        arrs = ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
            for c in book)
        terms.append(
            f"aggregate(zip_with(slice({van_col}, {j * dsub + 1}, {dsub}), "
            f"element_at(array({arrs}), element_at({code_col}, {j + 1}) + 1), "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)")
    return F.expr("(" + " + ".join(terms) + ")")


def pq_topk(
    df: DataFrame,
    model: PQModel,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: Optional[int] = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: Optional[DataFrame] = None,
    code_col: str = "pq_code",
    route: str = "auto",
) -> DataFrame:
    """ADC top-k with exact cosine/L2 re-rank.

    ``codes`` (a persisted (id, pq_code) table from
    :func:`build_pq_layout` / a prior :func:`pq_encode`) is the scale
    path: the ADC sweep scans 8-byte codes instead of 256-byte
    vectors, and only the ``shortlist`` survivors fetch their vector
    for the exact re-rank. ``shortlist=None`` re-ranks every row —
    exact by construction (the oracle configuration).

    Output: (id, score, adc_dist) where score is ``cosine_sim``
    (descending) or ``dist2`` (ascending) per the model metric."""
    if codes is None:
        codes = pq_encode(df, model, vec_col=vec_col,
                          out_col=code_col, route=route)
    adc = pq_adc_col(model, query_vec, code_col).alias("adc_dist")
    scored = codes.select(F.col(id_col), adc)
    return _exact_rerank(df, scored, query_vec, model.metric, k,
                         shortlist, id_col, vec_col)


def _exact_rerank(df, scored, query_vec, metric, k, shortlist,
                  id_col, vec_col):
    """Shortlist the (id, adc_dist) sweep, fetch the survivors'
    original vectors by id, and rank them by the EXACT metric — the
    shared tail of every PQ probe (``shortlist=None`` re-ranks every
    scored row: exact by construction)."""
    if shortlist is not None:
        scored = scored.orderBy(F.col("adc_dist").asc(),
                                F.col(id_col).asc()) \
                       .limit(int(shortlist))
    base = df.select(id_col, vec_col)
    joined = scored.join(base, on=id_col, how="inner")
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(F.zip_with(v, qv, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nq = F.sqrt(F.aggregate(F.transform(qv, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    if metric == "cosine":
        score = F.when(nv * nq > 0, dot / (nv * nq)).otherwise(F.lit(0.0))
        out = joined.withColumn("cosine_sim", score) \
            .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()) \
            .limit(int(k)) \
            .select(id_col, "cosine_sim", "adc_dist")
    else:
        d2 = F.aggregate(
            F.zip_with(v, qv, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        out = joined.withColumn("dist2", d2) \
            .orderBy(F.col("dist2").asc(), F.col(id_col).asc()) \
            .limit(int(k)) \
            .select(id_col, "dist2", "adc_dist")
    return out


def build_pq_layout(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 8,
    metric: str = "cosine",
    sample_cap: int = 4096,
    iters: int = 10,
    seed: int = 42,
    route: str = "auto",
) -> PQModel:
    """Persist the codes table (id, pq_code — 8 bytes/row of payload
    at m=8) plus the model JSON. The base vector table stays where it
    is; probes join back to it by id for the re-rank only."""
    model = pq_train(df, vec_col=vec_col, m=m, nbits=nbits,
                     metric=metric, sample_cap=sample_cap, iters=iters,
                     seed=seed)
    enc = pq_encode(df, model, vec_col=vec_col, route=route)
    enc.select(id_col, "pq_code").write.mode("overwrite") \
       .parquet(path + "/codes")
    import os

    os.makedirs(path, exist_ok=True)
    with open(path + "/pq_meta.json", "w") as f:
        f.write(json.dumps({"id_col": id_col, "model":
                            json.loads(model.to_json())}))
    return model


def load_pq_layout(spark, path: str):
    """→ (codes_df, model, id_col)."""
    with open(path + "/pq_meta.json") as f:
        meta = json.load(f)
    model = PQModel.from_json(json.dumps(meta["model"]))
    return spark.read.parquet(path + "/codes"), model, meta["id_col"]


def pq_topk_layout(
    spark,
    path: str,
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: Optional[int] = None,
    vec_col: str = "embedding",
) -> DataFrame:
    codes, model, id_col = load_pq_layout(spark, path)
    return pq_topk(df, model, query_vec, k, shortlist=shortlist,
                   vec_col=vec_col, id_col=id_col, codes=codes)


# ---------------------------------------------------------------------------
# IVF x PQ composition — the two-level FAISS-style layout: IVF prunes
# WHICH partition directories a probe reads, PQ shrinks WHAT each
# surviving row costs. Scan bytes ~ (nprobe / n_centroids) x codes
# bytes, vs the full vector column for brute force.


def _ivf_residual_arrow(df: DataFrame, vec_col: str, cents, metric: str
                        ) -> DataFrame:
    """Arrow kernel appending ``__ivf`` (nearest coarse list) and
    ``__resid`` (vector − centroid, in normalized space for cosine) in
    ONE pass. Same accumulation order as ``clustering._assign_arrow``
    (left-fold per-dimension adds, argmin ties to lowest index) and
    the same normalization as ``pq._encode_arrow`` — so the sample's
    driver-side numpy derivation in :func:`build_ivfpq_layout` and the
    distributed assignment agree. Rows must be pre-filtered to valid
    dim-length vectors."""
    cmat = [[float(x) for x in c] for c in cents]
    keep = [f for f in df.schema.fields
            if f.name not in ("__ivf", "__resid")]
    keep_names = [f.name for f in keep]
    schema = T.StructType(keep + [
        T.StructField("__ivf", T.IntegerType()),
        T.StructField("__resid", T.ArrayType(T.DoubleType())),
    ])

    def it(batches):
        import numpy as np

        C = np.asarray(cmat, dtype=np.float64)
        for pdf in batches:
            out = pdf[keep_names].copy()
            if len(pdf) == 0:
                out["__ivf"] = np.empty(0, dtype="int32")
                out["__resid"] = []
                yield out
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if metric == "cosine":
                acc = V[:, 0] * V[:, 0]
                for i in range(1, V.shape[1]):
                    acc = acc + V[:, i] * V[:, i]
                n = np.sqrt(acc)
                n[n == 0] = 1.0
                V = V / n[:, None]
            dists = np.empty((len(pdf), len(C)), dtype=np.float64)
            for j in range(len(C)):
                t = V[:, 0] - C[j, 0]
                a = t * t
                for i in range(1, V.shape[1]):
                    t = V[:, i] - C[j, i]
                    a = a + t * t
                dists[:, j] = a
            ivf = np.argmin(dists, axis=1)
            R = V - C[ivf]
            out["__ivf"] = ivf.astype("int32")
            out["__resid"] = [r.tolist() for r in R]
            yield out

    return df.mapInPandas(it, schema)


def build_ivfpq_layout(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 8,
    metric: str = "cosine",
    sample_cap: int = 4096,
    iters: int = 10,
    seed: int = 42,
    route: str = "auto",
    encode: str = "raw",
) -> None:
    """Persist the two-level index: PQ codes partitioned by IVF list
    (``codes/__ivf=<list>/``) plus coarse centroids + codebooks in the
    meta JSON.

    ``encode='raw'`` (IVF-Flat-PQ) codes the vectors themselves —
    codes stay list-independent (a re-clustered coarse quantizer never
    forces a re-encode). ``encode='residual'`` (the Jégou et al.
    IVFADC form) codes ``x − centroid[list]``: residuals span a much
    smaller cell-local range, so the same 8 bytes quantize finer and
    recall at a given shortlist rises (asserted in tests/test_pq.py
    and measured in bench_ann.json); the cost is that codes bind to
    the coarse quantizer and the probe needs one LUT per probed list.
    The residual subtraction is pure Column arithmetic
    (``zip_with(vec, element_at(centroids, __ivf+1), -)``) — one map
    pass either way, and the PQ model itself is metric='l2' over
    residual space (for cosine the vectors are L2-normalized BEFORE
    the subtraction; the exact re-rank restores the true metric).

    Build cost: one coarse-assign map pass + one encode map pass; both
    trainings are bounded driver-side samples."""
    import numpy as np

    from .similarity import _kmeans_centroids, _centroid_assign_col

    if encode not in ("raw", "residual"):
        raise ValueError(f"unknown ivfpq encode: {encode!r}")
    first = df.select(F.size(vec_col).alias("d")) \
              .filter(F.col("d") > 0).first()
    if first is None:
        raise ValueError("build_ivfpq_layout: no non-empty vectors")
    dim = int(first["d"])
    sample = [
        r[0]
        for r in df.select(vec_col)
        # size == dim matches pq_train: one off-dimension vector in
        # the sample would make np.asarray build a ragged object
        # array and crash (or corrupt) the k-means training
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>"),
                            F.lit(int(seed) + 7)))
        .limit(int(sample_cap))
        .collect()
    ]
    if encode == "residual":
        # residual space lives where the metric lives: for cosine,
        # normalize FIRST, then coarse-train / assign / subtract all
        # in normalized space (the raw path keeps its historical
        # raw-vector coarse quantizer untouched)
        X = np.asarray(sample, dtype="float64")
        if metric == "cosine":
            X = _normalize_rows(X)
        cents = _kmeans_centroids(X.tolist(), n_centroids, iters,
                                  int(seed) + 7)
        C = np.asarray(cents, dtype="float64")
        # nearest coarse centroid per sample row (same argmin-by-L2 as
        # the distributed _centroid_assign_col; ties to lowest index)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        R = X - C[np.argmin(d2, axis=1)]
        model = PQModel(dim, m, nbits, "l2",
                        _train_books(R, m, nbits, iters, int(seed)))
    else:
        cents = _kmeans_centroids(sample, n_centroids, iters,
                                  int(seed) + 7)
        model = pq_train(df, vec_col=vec_col, m=m, nbits=nbits,
                         metric=metric, sample_cap=sample_cap,
                         iters=iters, seed=seed)
    if encode == "residual":
        # one Arrow pass computes normalize → coarse argmin → residual
        # together. A Column formulation here is a trap: the normalized
        # vector is a COMPUTED higher-order expression, and Catalyst
        # inlines it into every one of the n_centroids distance folds
        # (no CSE across HOF lambdas, none of which codegen) — measured
        # ~60× slower at 1M×64-d×64 lists than this kernel.
        valid = df.filter(
            F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        assigned = _ivf_residual_arrow(valid, vec_col, cents, metric)
        enc = pq_encode(assigned, model, vec_col="__resid", route=route)
    else:
        assigned = df.withColumn(
            "__ivf", _centroid_assign_col(vec_col, cents))
        enc = pq_encode(assigned, model, vec_col=vec_col, route=route)
    enc.select(id_col, "__ivf", "pq_code").write.mode("overwrite") \
       .partitionBy("__ivf").parquet(path + "/codes")
    import os

    os.makedirs(path, exist_ok=True)
    with open(path + "/ivfpq_meta.json", "w") as f:
        f.write(json.dumps({
            "id_col": id_col,
            "encode": encode,
            "metric": metric,
            "centroids": [[float(x) for x in c] for c in cents],
            "model": json.loads(model.to_json()),
        }))


def ivfpq_topk(
    spark,
    path: str,
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    shortlist: Optional[int] = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the two-level layout: nearest ``nprobe`` coarse lists
    picked driver-side from the query alone, the codes scan restricted
    to those partition DIRECTORIES (planning-time pruning — the
    ``__ivf IN (...)`` filter is a PartitionFilter, plan-asserted in
    tests), ADC ranks the surviving 8-byte codes, and the
    ``shortlist`` survivors fetch their vectors by id for the exact
    re-rank. ``nprobe >= n_centroids`` with ``shortlist=None`` visits
    every list and re-ranks every row — exact by construction (the
    oracle configuration).

    A residual layout (``build_ivfpq_layout(encode='residual')``)
    scores each probed list with its OWN LUT — the ADC table for list
    L is built from ``q − centroid[L]`` — so the scan is a union of
    ``nprobe`` partition-pruned branches, one per probed directory;
    branch count is a query parameter (≤ nprobe), never data. The
    exact re-rank is identical either way."""
    import numpy as np

    with open(path + "/ivfpq_meta.json") as f:
        meta = json.load(f)
    model = PQModel.from_json(json.dumps(meta["model"]))
    id_col = meta["id_col"]
    cents = np.asarray(meta["centroids"], dtype="float64")
    q = np.asarray([float(x) for x in query_vec], dtype="float64")
    if meta.get("encode", "raw") == "residual":
        metric = meta.get("metric", "cosine")
        qq = q.copy()
        if metric == "cosine":
            n = float(np.sqrt((qq * qq).sum()))
            qq = qq / (n if n > 0 else 1.0)
        d2 = ((cents - qq[None, :]) ** 2).sum(axis=1)
        probes = [int(i) for i in np.argsort(d2)[: int(nprobe)]]
        codes = spark.read.parquet(path + "/codes")
        branches = []
        for p in probes:
            rq = (qq - cents[p]).tolist()
            adc = pq_adc_col(model, rq, "pq_code").alias("adc_dist")
            branches.append(
                codes.filter(F.col("__ivf") == int(p))
                .select(F.col(id_col), adc))
        scored = branches[0]
        for b in branches[1:]:
            scored = scored.unionByName(b)
        return _exact_rerank(df, scored, query_vec, metric, k,
                             shortlist, id_col, vec_col)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[: int(nprobe)]]
    codes = spark.read.parquet(path + "/codes").filter(
        F.col("__ivf").isin(probes))
    return pq_topk(df, model, query_vec, k, shortlist=shortlist,
                   vec_col=vec_col, id_col=id_col,
                   codes=codes.drop("__ivf"))


# --- scalar quantization (SQ8) ----------------------------------------------


class SQModel:
    """Per-dimension 8-bit scalar quantizer: code_i = affine(x_i) in
    0..255 between the corpus's exact per-dim [lo_i, hi_i]. The
    simplest vector-compression tier (4x vs float32, 8x vs float64 —
    next to PQ's 32x) with near-lossless recall at high shortlists:
    reconstruction error is bounded by (hi_i - lo_i)/510 per dim."""

    def __init__(self, dim: int, metric: str, lo, hi):
        if metric not in ("cosine", "l2"):
            raise ValueError(f"unknown metric: {metric}")
        if len(lo) != dim or len(hi) != dim:
            raise ValueError("lo/hi length != dim")
        self.dim = int(dim)
        self.metric = metric
        self.lo = [float(x) for x in lo]
        self.hi = [float(x) for x in hi]
        # bounds are inlined as SQL double literals by sq_encode /
        # sq_adc_col (repr(v)+'D'); a non-finite corpus value would
        # render as the unparseable 'infD'/'nanD' and fail far from
        # the root cause — reject it here instead
        import math

        for name, vals in (("lo", self.lo), ("hi", self.hi)):
            for i, v in enumerate(vals):
                if not math.isfinite(v):
                    raise ValueError(
                        f"SQModel: non-finite {name}[{i}]={v!r} — the "
                        "corpus contains an inf/nan embedding value; "
                        "clean the vectors before sq_train"
                    )

    @property
    def scale(self):
        """Encode slopes: 255/(hi-lo), 0 for constant dims."""
        return [
            (255.0 / (h - l)) if h > l else 0.0
            for l, h in zip(self.lo, self.hi)
        ]

    @property
    def inv_scale(self):
        """Decode slopes: (hi-lo)/255, 0 for constant dims."""
        return [
            ((h - l) / 255.0) if h > l else 0.0
            for l, h in zip(self.lo, self.hi)
        ]

    def to_json(self) -> str:
        import json

        return json.dumps({"dim": self.dim, "metric": self.metric,
                           "lo": self.lo, "hi": self.hi})

    @classmethod
    def from_json(cls, s: str) -> "SQModel":
        import json

        d = json.loads(s)
        return cls(d["dim"], d["metric"], d["lo"], d["hi"])


def _sq_norm_expr(vec_col: str) -> str:
    """SQL text: the L2-normalized double vector (zero vectors pass
    through — their codes are all-lo, harmless)."""
    n = (f"sqrt(aggregate(transform({vec_col}, "
         f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
         f"0.0D, (acc, x) -> acc + x))")
    return (f"CASE WHEN {n} > 0.0D THEN "
            f"transform({vec_col}, x -> CAST(x AS DOUBLE) / {n}) "
            f"ELSE transform({vec_col}, x -> CAST(x AS DOUBLE)) END")


def sq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    metric: str = "cosine",
    dim: Optional[int] = None,
) -> SQModel:
    """Fit the per-dim [lo, hi] bounds over the FULL corpus (exact
    min/max are order-insensitive, so no sample is needed — unlike
    Lloyd's): one aggregate pass of 2·dim mins/maxes (combine-friendly,
    2 array rows to the driver — parameter-sized state). Vectors are
    L2-normalized first under the cosine metric, so bounds live in
    the same space the query is scored in."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")) \
                  .filter(F.col("d") > 0).first()
        if first is None:
            raise ValueError("sq_train: no non-empty vectors")
        dim = int(first["d"])
    valid = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
    nv = (_sq_norm_expr(vec_col) if metric == "cosine"
          else f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    lo_a = ",".join(
        f"min(element_at(__nv, {i + 1}))" for i in range(dim))
    hi_a = ",".join(
        f"max(element_at(__nv, {i + 1}))" for i in range(dim))
    row = (
        valid.select(F.expr(nv).alias("__nv"))
        .agg(F.expr(f"array({lo_a})").alias("lo"),
             F.expr(f"array({hi_a})").alias("hi"))
        .first()
    )
    return SQModel(dim, metric, row["lo"], row["hi"])


def sq_encode(
    df: DataFrame,
    model: SQModel,
    vec_col: str = "embedding",
    out_col: str = "sq_code",
) -> DataFrame:
    """Attach the dim-byte SQ code (array<int>, 0..255 per dim,
    clamped — out-of-range values from corpus drift saturate instead
    of wrapping). One map pass, zero shuffle, whole-stage codegen;
    assembled as ONE SQL expression (the pq_adc_col driver-time
    lesson). NULL / off-dimension vectors are dropped."""
    valid = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == model.dim))
    nv = (_sq_norm_expr(vec_col) if model.metric == "cosine"
          else f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    lo = ",".join(repr(v) + "D" for v in model.lo)
    sc = ",".join(repr(v) + "D" for v in model.scale)
    expr = (
        f"transform({nv}, (x, i) -> "
        f"least(255, greatest(0, CAST(round("
        f"(x - element_at(array({lo}), i + 1)) * "
        f"element_at(array({sc}), i + 1), 0) AS INT))))"
    )
    return valid.withColumn(out_col, F.expr(expr))


def sq_adc_col(model: SQModel, query_vec: Sequence[float],
               code_col: str = "sq_code"):
    """Column: approximate squared distance from the query to the
    DEQUANTIZED code, sum_i (q_i - lo_i - c_i·inv_i)² — pure codegen
    over the code column only (the scan never touches vectors), one
    aggregate fold, literals inlined as ONE SQL string."""
    import numpy as np

    q = np.asarray([float(x) for x in query_vec], dtype="float64")
    if len(q) != model.dim:
        raise ValueError(f"query dim {len(q)} != model dim {model.dim}")
    if model.metric == "cosine":
        n = float(np.sqrt((q * q).sum()))
        q = q / (n if n > 0 else 1.0)
    a = [float(qi - lo) for qi, lo in zip(q, model.lo)]
    A = ",".join(repr(v) + "D" for v in a)
    I = ",".join(repr(v) + "D" for v in model.inv_scale)
    term = (f"(element_at(array({A}), i + 1) - "
            f"c * element_at(array({I}), i + 1))")
    return F.expr(
        f"aggregate(transform({code_col}, (c, i) -> {term} * {term}), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def sq_topk(
    df: DataFrame,
    model: SQModel,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: Optional[int] = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: Optional[DataFrame] = None,
    code_col: str = "sq_code",
) -> DataFrame:
    """SQ8 ANN top-k with exact re-rank — the same probe shape as
    :func:`pq_topk` (ADC sweep over codes, shortlist, exact-metric
    re-rank fetching vectors by id), one tier up the
    accuracy/compression ladder: dim bytes per vector instead of m,
    no codebook training, near-lossless at modest shortlists.
    ``shortlist=None`` re-ranks every row — exact by construction
    (the oracle configuration)."""
    if codes is None:
        codes = sq_encode(df, model, vec_col=vec_col, out_col=code_col)
    adc = sq_adc_col(model, query_vec, code_col).alias("adc_dist")
    scored = codes.select(F.col(id_col), adc)
    return _exact_rerank(df, scored, query_vec, model.metric, k,
                         shortlist, id_col, vec_col)
