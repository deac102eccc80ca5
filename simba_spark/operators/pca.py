"""PCA projection / whitening over an embedding column.

The feature-engineering step before ANN or clustering at corpus scale
(dimensionality reduction improves IVF/LSH recall-per-byte; whitening
equalizes component scales). Spark MLlib's PCA wants a Vector column
and a fit/transform round-trip; this works directly on
``array<float/double>`` and stays in the package's determinism
contract.

Scale design: ONE Arrow moments pass — each batch emits its
(count, Σx, upper-triangle of XᵀX) as 1 + d + d(d+1)/2 doubles via a
per-batch BLAS matmul, reduced by a skinny (index, partial) groupBy
(combine-friendly; only parameter-sized rows leave any executor). A
pure-SQL 2144-aggregate formulation was measured first and rejected:
its plan cost is ~35-60 s at d=64 regardless of data size (the
aggregate overflows whole-stage codegen and every row pays 2144
interpreted expressions — catastrophic at corpus scale), vs ~1 s for
the Arrow kernel. The driver forms the sample covariance, takes its
top eigenvectors with numpy (`eigh` — symmetric, deterministic),
fixes each eigenvector's sign (largest-|coefficient| entry made
positive, ties to the lower index) so the basis is unique, and the
projection is a per-component constant-size
``aggregate(zip_with(...))`` fold — JVM-side, no UDF, no codegen
blowup at any d (the fold is a loop expression, not an unrolled
literal chain; cf. the 512-term cliff documented in
operators/clustering.py).

Moments are rounded to ``round_dp`` before the driver eig so the
fitted basis is engine/partitioning-stable (partial-sum
reassociation noise is ~n·1e-16 relative — far below the 1e-6
rounding grain at any tested scale); the projection arithmetic
itself is exact IEEE given the literal basis.

No reference counterpart (the reference ships no linear algebra);
this extends the similarity/clustering family.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
    dim: Optional[int] = None,
    round_dp: int = 6,
    whiten: bool = False,
) -> Tuple[List[float], List[List[float]], List[float]]:
    """One-pass PCA fit: returns (mean, components, eigenvalues) —
    ``components`` is a list of ``n_components`` unit eigenvectors of
    the sample covariance, descending eigenvalue, sign-fixed. With
    ``whiten``, each component is pre-divided by sqrt(eigenvalue) so
    projected coordinates have ~unit variance."""
    import numpy as np

    if dim is None:
        row = (
            df.filter(F.col(vec_col).isNotNull())
            .groupBy(F.size(vec_col).alias("d")).count()
            .orderBy(F.col("count").desc(), F.col("d").asc())
            .first()
        )
        if row is None:
            raise ValueError("fit_pca: no non-null vectors")
        dim = int(row["d"])
    d = int(dim)
    nc = int(n_components)
    if not 1 <= nc <= d:
        raise ValueError(f"n_components must be in [1, {d}]: {nc}")
    base = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d))
    m = d * (d + 1) // 2

    def it(batches):
        import numpy as np  # noqa: F811 (executor-side)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            iu = np.triu_indices(d)
            part = np.concatenate(
                [[float(len(V))], V.sum(axis=0), (V.T @ V)[iu]])
            import pandas as pd
            yield pd.DataFrame({"v": [part.tolist()]})

    partials = base.select(vec_col).mapInPandas(it, "v array<double>")
    tot = {
        r["i"]: r["s"]
        for r in partials.select(
            F.posexplode("v").alias("i", "x"))
        .groupBy("i").agg(F.sum("x").alias("s")).collect()
    }
    n = int(tot.get(0, 0.0))
    if n < 2:
        raise ValueError(f"fit_pca: needs >= 2 valid vectors, got {n}")
    rd = int(round_dp)
    mean = np.array([round(tot[1 + i] / n, rd) for i in range(d)])
    iu = np.triu_indices(d)
    S = np.empty((d, d))
    flat = [round(tot[1 + d + t] / n, rd) for t in range(m)]
    for t, (i, j) in enumerate(zip(*iu)):
        S[i, j] = S[j, i] = flat[t]
    # sample covariance from rounded moments: n/(n-1) * (E[xx] - m m^T)
    C = (S - np.outer(mean, mean)) * (n / (n - 1.0))
    evals, evecs = np.linalg.eigh(C)          # ascending
    order = np.argsort(evals)[::-1][:nc]
    comps, lams = [], []
    for idx in order:
        v = evecs[:, idx].copy()
        # unique sign: the largest-|coefficient| entry (lowest index on
        # exact ties) is made positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        lam = float(max(evals[idx], 0.0))
        if whiten:
            v = v / np.sqrt(lam) if lam > 0 else v * 0.0
        comps.append([float(x) for x in v])
        lams.append(lam)
    return [float(x) for x in mean], comps, lams


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
    dim: Optional[int] = None,
    round_dp: int = 6,
    whiten: bool = False,
    out_col: str = "pca",
    model: Optional[Tuple[List[float], List[List[float]], List[float]]] = None,
) -> DataFrame:
    """Project the embedding column onto its top principal components:
    adds ``out_col`` = array<double> of length ``n_components``. Pass
    ``model`` (a :func:`fit_pca` result) to reuse a fitted basis —
    e.g. fit on a train split, project train and test identically.
    Rows failing the validity filter (NULL / non-modal dimension) are
    dropped, as in :func:`..clustering.kmeans`."""
    mean, comps, _ = model if model is not None else fit_pca(
        df, vec_col=vec_col, n_components=n_components, dim=dim,
        round_dp=round_dp, whiten=whiten)
    d = len(mean)
    base = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d))
    vc = F.col(vec_col)
    outs = []
    for w in comps:
        lit_w = F.array(*[F.lit(float(x)) for x in w])
        dot = F.aggregate(
            F.zip_with(vc, lit_w, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        offset = float(sum(m * x for m, x in zip(mean, w)))
        outs.append(dot - F.lit(offset))
    return base.withColumn(out_col, F.array(*outs))
