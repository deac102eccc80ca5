"""Hybrid retrieval: reciprocal-rank fusion of ranked candidate lists.

The standard way to combine lexical (BM25) and vector (cosine/ANN)
retrieval without calibrating their incomparable score scales: each
list contributes 1/(k + rank) per document and the fused score is the
sum (Cormack & Clarke, SIGIR'09). This composes the engine's
:func:`~simba_spark.operators.text.bm25_topk` and
:func:`~simba_spark.operators.similarity.cosine_topk` /
``cosine_topk_ivf`` outputs into one retrieval answer — the
RAG-corpus query shape.

Scale shape: inputs are per-query top-N candidate frames (bounded —
N rows per query each), so ranking is a window over skinny frames and
the fuse is ONE groupBy on (query, id). Nothing here touches the
corpus; the heavy lifting stays in the upstream retrievers where the
scans are pruned (inverted postings / IVF probes).

The reference has no retrieval operators (SURVEY.md §2.4 is inherited
aggregation only); this is a north-star addition alongside BM25 and
the ANN family.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_cols: Sequence[str],
    score_cols: Sequence[str],
    k: int = 60,
    by: Optional[Sequence[str]] = None,
    topk: Optional[int] = None,
) -> DataFrame:
    """Fuse ranked candidate lists by reciprocal-rank fusion.

    Parameters
    ----------
    ranked : one DataFrame per retriever; each carries ``id_cols``
        (and ``by`` columns if given) plus its own score column.
    id_cols : the document identity shared by every list.
    score_cols : per-list score column (``score_cols[i]`` belongs to
        ``ranked[i]``); higher is better. Ranks are 1-based with ties
        broken by ascending ``id_cols`` (deterministic).
    k : the RRF damping constant (60 is the published default).
    by : optional query/group columns — fusion is computed per group
        (multi-query batch retrieval).
    topk : keep only the ``topk`` fused rows (per group when ``by``).

    Returns ``(by…, id_cols…, rrf_score, n_lists)``. ``rrf_score`` is
    built as a FIXED-ORDER sum of per-list coalesced contributions
    (one expression tree, not a row-order-dependent float aggregate),
    so results are bit-reproducible and the DuckDB mirror
    (:func:`rrf_fuse_sql`) matches exactly.
    """
    if not ranked or len(ranked) != len(score_cols):
        raise ValueError(
            "rrf_fuse: need one score column per ranked input "
            f"(got {len(ranked)} inputs, {len(score_cols)} scores)"
        )
    if k < 1:
        raise ValueError("rrf_fuse: k must be >= 1")
    ids = list(id_cols)
    groups = list(by or [])
    tagged = []
    for i, (df, sc) in enumerate(zip(ranked, score_cols)):
        w = Window.partitionBy(*groups).orderBy(
            F.col(sc).desc(), *[F.col(c).asc() for c in ids]
        )
        tagged.append(
            df.select(
                *groups, *ids,
                F.lit(i).alias("__rrf_src"),
                F.row_number().over(w).alias("__rrf_r"),
            )
        )
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.unionByName(t)
    per_src = [
        F.min(
            F.when(
                F.col("__rrf_src") == i,
                F.lit(1.0) / (F.lit(float(k)) + F.col("__rrf_r").cast("double")),
            )
        ).alias(f"__rrf_c{i}")
        for i in range(len(ranked))
    ]
    agg = allr.groupBy(*groups, *ids).agg(
        *per_src, F.count(F.lit(1)).alias("n_lists")
    )
    score = F.coalesce(F.col("__rrf_c0"), F.lit(0.0))
    for i in range(1, len(ranked)):
        score = score + F.coalesce(F.col(f"__rrf_c{i}"), F.lit(0.0))
    out = agg.select(*groups, *ids, score.alias("rrf_score"), "n_lists")
    if topk is None:
        return out
    order = [F.col("rrf_score").desc()] + [F.col(c).asc() for c in ids]
    if groups:
        w = Window.partitionBy(*groups).orderBy(*order)
        return (
            out.withColumn("__rrf_k", F.row_number().over(w))
            .filter(F.col("__rrf_k") <= int(topk))
            .drop("__rrf_k")
        )
    # global top-k compiles to TakeOrderedAndProject (≤ topk rows to
    # the driver, never a single-partition sort)
    return out.orderBy(*order).limit(int(topk))


def rrf_fuse_sql(
    ranked_sqls: Sequence[str],
    id_exprs: Sequence[str],
    score_exprs: Sequence[str],
    k: int = 60,
    by_exprs: Optional[Sequence[str]] = None,
    topk: Optional[int] = None,
) -> str:
    """DuckDB mirror of :func:`rrf_fuse` — identical rank windows and
    the same fixed-order coalesced float sum, bit-for-bit."""
    ids = list(id_exprs)
    groups = list(by_exprs or [])
    gsel = "".join(f"{g}, " for g in groups)
    isel = ", ".join(ids)
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    lists = []
    for i, (sql, sc) in enumerate(zip(ranked_sqls, score_exprs)):
        order = f"{sc} DESC, " + ", ".join(f"{c} ASC" for c in ids)
        lists.append(
            f"SELECT {gsel}{isel}, {i} AS __rrf_src,\n"
            f"       row_number() OVER ({part} ORDER BY {order}) AS __rrf_r\n"
            f"FROM ({sql})"
        )
    union = "\nUNION ALL\n".join(lists)
    per_src = ",\n         ".join(
        f"min(CASE WHEN __rrf_src = {i} THEN 1.0::DOUBLE / "
        f"({float(k)!r}::DOUBLE + CAST(__rrf_r AS DOUBLE)) END) AS __rrf_c{i}"
        for i in range(len(ranked_sqls))
    )
    score = " + ".join(
        f"coalesce(__rrf_c{i}, 0.0::DOUBLE)" for i in range(len(ranked_sqls))
    )
    base = f"""
WITH __rrf_all AS (
{union}
),
__rrf_agg AS (
  SELECT {gsel}{isel},
         {per_src},
         count(*) AS n_lists
  FROM __rrf_all GROUP BY {gsel}{isel}
)
SELECT {gsel}{isel}, {score} AS rrf_score, n_lists FROM __rrf_agg
"""
    if topk is None:
        return base
    order = "rrf_score DESC, " + ", ".join(f"{c} ASC" for c in ids)
    if groups:
        return f"""
SELECT {gsel}{isel}, rrf_score, n_lists FROM (
  SELECT *, row_number() OVER ({part} ORDER BY {order}) AS __rrf_k
  FROM ({base})
) WHERE __rrf_k <= {int(topk)}
"""
    return f"SELECT * FROM ({base}) ORDER BY {order} LIMIT {int(topk)}"
