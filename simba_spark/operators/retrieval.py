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


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    score_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) of a bounded candidate list: greedily pick k documents
    maximizing ``λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)`` — relevance
    traded against redundancy with what's already selected. THE
    diversity pass between retrieval (BM25 / ANN / RRF) and a RAG
    context window: near-duplicate hits stop crowding out coverage.

    ``candidates`` is a TOP-N frame (bounded by the upstream
    retriever) with an id, a relevance score, and an embedding.
    Returns ``(selection_rank, id, rel, mmr)`` — min(k, N) rows in
    selection order; the round-1 pick has no redundancy penalty
    (empty-set max = 0.0).

    Determinism / oracle parity: pairwise cosines round to 6 BEFORE
    the max (the engine's vector ranking convention), the MMR score
    rounds to 6, ties break id-asc — bit-reproducible in SQL.

    Scale / plan shape: k bounded rounds, each an anti-join against
    the ≤k selected ids, a broadcast cross against the ≤k selected
    VECTORS (bounded by the parameter, the only cross in the plan), a
    max-aggregate, and a 1-row TakeOrderedAndProject; no driver
    collect anywhere — each round's ≤i-row pick frame materializes via
    localCheckpoint (a fully-lazy k-round plan grows O(k²) and chokes
    Catalyst analysis past k≈10, measured). Candidates stay
    parameter-sized by contract, so round cost is O(N·k) sims total.
    """
    lam = float(lam)
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1]: {lam}")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from ..functions import cosine_similarity

    cand = candidates.select(
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("double").alias("__rel"),
        F.col(vec_col).alias("__vec"),
    ).localCheckpoint(eager=False)
    selected = None
    for i in range(1, int(k) + 1):
        if selected is None:
            remaining = cand
            penalty = F.lit(0.0)
            scored = remaining
        else:
            selvecs = cand.join(
                selected.select("__id"), "__id"
            ).select(F.col("__vec").alias("__svec"))
            sims = (
                cand.crossJoin(F.broadcast(selvecs))
                .select(
                    "__id",
                    F.round(
                        cosine_similarity(F.col("__vec"), F.col("__svec")), 6
                    ).alias("__sim"),
                )
                .groupBy("__id")
                .agg(F.max("__sim").alias("__ms"))
            )
            remaining = cand.join(selected.select("__id"), "__id", "left_anti")
            scored = remaining.join(sims, "__id", "left")
            penalty = F.coalesce(F.col("__ms"), F.lit(0.0))
        pick = (
            scored.select(
                "__id",
                "__rel",
                F.round(
                    F.lit(lam) * F.col("__rel")
                    - F.lit(1.0 - lam) * penalty,
                    6,
                ).alias("__mmr"),
            )
            .orderBy(F.desc("__mmr"), F.asc("__id"))
            .limit(1)
            .select("__id", "__rel", F.lit(i).alias("selection_rank"), "__mmr")
        )
        # EAGER checkpoint: each round's pick references every prior
        # round, so a fully-lazy plan grows O(k²) and Catalyst analysis
        # time explodes past k≈10 (measured). Materializing the ≤i-row
        # selected frame per round keeps the plan flat — k bounded jobs,
        # still zero driver collects (the picks stay distributed).
        selected = (
            pick if selected is None else selected.unionByName(pick)
        ).localCheckpoint()
    return selected.select(
        "selection_rank",
        F.col("__id").alias(id_col),
        F.col("__rel").alias(score_col),
        F.col("__mmr").alias("mmr"),
    )


def mmr_rerank_sql(
    cand_sql: str,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    score_col: str = "rel",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`mmr_rerank` — the greedy unrolled as k
    MATERIALIZED CTE rounds (each selection feeds every later round's
    penalty), identical round-6-before-max cosine convention and
    λ arithmetic (literals CAST to DOUBLE)."""
    lam = float(lam)
    L = f"CAST({lam!r} AS DOUBLE)"
    OML = f"CAST({1.0 - lam!r} AS DOUBLE)"
    parts = [
        f"""__cand AS MATERIALIZED (
  SELECT {id_col} AS __id, CAST({score_col} AS DOUBLE) AS __rel,
         {vec_col}::DOUBLE[] AS __vec
  FROM ({cand_sql})
)""",
        f"""__sel1 AS MATERIALIZED (
  SELECT __id, __rel, 1 AS selection_rank,
         round({L} * __rel - {OML} * 0.0::DOUBLE, 6) AS __mmr
  FROM __cand
  ORDER BY round({L} * __rel - {OML} * 0.0::DOUBLE, 6) DESC, __id ASC
  LIMIT 1
)""",
        "__all1 AS MATERIALIZED (SELECT * FROM __sel1)",
    ]
    for i in range(2, int(k) + 1):
        parts.append(f"""__sel{i} AS MATERIALIZED (
  SELECT c.__id, c.__rel, {i} AS selection_rank,
         round({L} * c.__rel
               - {OML} * coalesce(m.__ms, 0.0::DOUBLE), 6) AS __mmr
  FROM __cand c
  LEFT JOIN (
    SELECT c2.__id,
           max(round(list_cosine_similarity(c2.__vec, sv.__vec), 6)) AS __ms
    FROM __cand c2, __cand sv
    WHERE sv.__id IN (SELECT __id FROM __all{i - 1})
    GROUP BY c2.__id
  ) m ON m.__id = c.__id
  WHERE c.__id NOT IN (SELECT __id FROM __all{i - 1})
  ORDER BY round({L} * c.__rel
                 - {OML} * coalesce(m.__ms, 0.0::DOUBLE), 6) DESC,
           c.__id ASC
  LIMIT 1
)""")
        parts.append(
            f"__all{i} AS MATERIALIZED (SELECT * FROM __all{i - 1} "
            f"UNION ALL SELECT * FROM __sel{i})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT selection_rank, __id AS {id_col}, __rel AS {score_col},
       __mmr AS mmr
FROM __all{int(k)}
ORDER BY selection_rank"""
    )


def prf_expand(
    df: DataFrame,
    query_terms: Sequence[str],
    k_docs: int = 10,
    k_terms: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM1-style relevance
    model, Lavrenko & Croft 2001 family): run BM25, treat the top
    ``k_docs`` as relevant, and score every term they contain by

        weight(t) = idf(t) · Σ_{d ∈ FB} tf(t, d) / |d|

    (within-feedback term mass, corpus-idf-discounted so stopwords
    don't win). Returns the top ``k_terms`` NEW terms ``(term,
    weight)`` — the original query terms are excluded — weight
    rounded, ties term-asc. Feed them back into :func:`~simba_spark.
    operators.text.bm25_topk` for the expanded retrieval round.

    Scale: the feedback set is parameter-sized (k_docs ids from one
    TakeOrdered), so the term-mass pass explodes k_docs documents
    only; the corpus-side df count runs ONLY for the feedback
    vocabulary (semi-join before the distinct-count, combine-friendly);
    N/avgdl ride as 1-row broadcasts; the final top-k_terms is one
    TakeOrderedAndProject.
    """
    from .text import TOKEN_SPLIT_RE, bm25_topk

    terms = [t.lower() for t in query_terms]
    if int(k_docs) < 1 or int(k_terms) < 1:
        raise ValueError("k_docs and k_terms must be >= 1")
    fb = bm25_topk(df, terms, text_col=text_col, id_col=id_col,
                   k=int(k_docs), k1=k1, b=b)
    fbids = fb.select(F.col(id_col).alias("__id"))
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # explode ONLY the k_docs feedback documents: the broadcast semi-
    # join commutes with the explode (both keep exactly the feedback
    # ids' token rows), and filtering the document frame FIRST saves a
    # full-corpus tokenize pass (round-11 opt, guide §2.3 project/
    # filter before the expensive op)
    fbt = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        .join(F.broadcast(fbids), "__id")
        .select(
            "__id",
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dl = fbt.groupBy("__id").agg(F.count(F.lit(1)).alias("__dl"))
    mass = (
        fbt.groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .join(dl, "__id")
        .groupBy("term")
        .agg(F.sum(F.col("__tf").cast("double") / F.col("__dl").cast("double"))
             .alias("__mass"))
        .filter(~F.col("term").isin(terms))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    dfreq = (
        toks.join(F.broadcast(mass.select("term")), "term")
        .groupBy("term")
        .agg(F.countDistinct("__id").alias("__df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    return (
        mass.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(idf * F.col("__mass"), int(round_to)).alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(int(k_terms))
    )


def prf_expand_sql(
    from_sql: str,
    query_terms: Sequence[str],
    k_docs: int = 10,
    k_terms: int = 5,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`prf_expand` — the feedback set comes
    from the shared :func:`~simba_spark.operators.text.bm25_sql`
    ranking, then the same idf-discounted term-mass scoring."""
    from .text import bm25_sql

    fb = bm25_sql(from_sql, query_terms, text_expr=text_expr,
                  id_expr=id_expr, k=int(k_docs), k1=k1, b=b)
    terms = ", ".join(
        "'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    return f"""
WITH __fb AS MATERIALIZED (SELECT {id_expr} AS __id FROM ({fb})),
__alltoks AS (
  SELECT {id_expr} AS __id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+'))
           AS term
  FROM {from_sql}
),
__tk AS (SELECT __id, term FROM __alltoks WHERE term <> ''),
__fbt AS (SELECT t.__id, t.term FROM __tk t JOIN __fb USING (__id)),
__dl AS (SELECT __id, count(*) AS __dl FROM __fbt GROUP BY 1),
__mass AS (
  SELECT term,
         sum(CAST(__tf AS DOUBLE) / CAST(__dl AS DOUBLE)) AS __mass
  FROM (
    SELECT f.term, f.__id, count(*) AS __tf FROM __fbt f GROUP BY 1, 2
  ) JOIN __dl USING (__id)
  WHERE term NOT IN ({terms})
  GROUP BY term
),
__dfq AS (
  SELECT t.term, count(DISTINCT t.__id) AS __df
  FROM __tk t JOIN __mass m ON m.term = t.term
  GROUP BY 1
),
__n AS (SELECT count(*) AS __n FROM {from_sql})
SELECT m.term,
       round(ln(1.0 + (n.__n - d.__df + 0.5) / (d.__df + 0.5)) * m.__mass,
             {int(round_to)}) AS weight
FROM __mass m JOIN __dfq d USING (term), __n n
ORDER BY weight DESC, m.term ASC
LIMIT {int(k_terms)}
"""


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    query_col: str = "query",
    id_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Offline retrieval-quality evaluation: per-query recall@k,
    MRR@k, and nDCG@k of a ranked candidate frame against graded
    relevance judgments — the TREC-style eval loop every retrieval
    stack (BM25 / ANN / hybrid / reranker) is tuned with, run where
    the rankings live instead of exporting run files.

    ``ranked`` holds ``(query, id, score)`` candidate lists (any
    per-query depth; ranks are derived ``score DESC, id ASC`` so the
    order is a deterministic function of the data — rounded upstream
    scores recommended, the :func:`~simba_spark.operators.text.
    bm25_topk` convention). ``qrels`` holds ``(query, id, grade)``;
    rows with grade <= 0 or NULL are non-relevant. Definitions:

    - recall@k  = |relevant ∩ top-k| / |relevant|
    - MRR@k     = 1 / rank of the first relevant in the top-k (0 if
      none — the convention that makes the macro average well-defined)
    - nDCG@k    = DCG@k / IDCG@k with linear gain,
      DCG = Σ_{r<=k} grade_r / log2(r + 1) (Järvelin & Kekäläinen)

    Queries present in ``ranked`` but absent from ``qrels`` return
    NULL recall/ndcg (0/0 — unjudged, not zero-quality). Returns
    ``(query, n_rel, hits_at_k, recall_at_k, mrr_at_k, ndcg_at_k)``.

    Determinism / oracle parity: both DCG sums fold a rank-ORDERED
    term list from 0.0 (Spark ``aggregate`` over the sorted array;
    DuckDB ``list_reduce`` over ``list(... ORDER BY rank)``) — never
    an engine SUM whose accumulation order floats; log2/division are
    per-row. Scale shape: candidate lists are bounded (k·|Q| rows),
    qrels are judgment-sized; everything shuffles on the query key
    once, and the per-query fold state is a <= k-element array.
    """
    kk = int(k)
    if kk < 1:
        raise ValueError(f"k must be >= 1: {k}")
    q, i = "__q", "__i"
    w = Window.partitionBy(q).orderBy(
        F.col("__s").desc(), F.col(i).asc())
    r = (
        ranked.select(
            F.col(query_col).alias(q), F.col(id_col).alias(i),
            F.col(score_col).cast("double").alias("__s"))
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= kk)
    )
    g = qrels.select(
        F.col(query_col).alias(q), F.col(id_col).alias(i),
        F.col(grade_col).cast("double").alias("__g"),
    ).filter(F.col("__g") > 0)

    def _fold(term_struct_list):
        return F.aggregate(
            F.transform(F.array_sort(term_struct_list), lambda s: s["t"]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    j = r.join(g, [q, i], "left").select(
        q, "__rank", F.coalesce(F.col("__g"), F.lit(0.0)).alias("__gain"))
    per_q = j.groupBy(q).agg(
        _fold(F.collect_list(F.struct(
            F.col("__rank").alias("r"),
            (F.col("__gain")
             / F.log2(F.col("__rank").cast("double") + 1.0)).alias("t"),
        ))).alias("__dcg"),
        F.min(F.when(F.col("__gain") > 0, F.col("__rank"))).alias("__first"),
        F.sum((F.col("__gain") > 0).cast("int")).alias("hits_at_k"),
    )
    wq = Window.partitionBy(q).orderBy(F.col("__g").desc(), F.col(i).asc())
    ideal = (
        g.withColumn("__pos", F.row_number().over(wq))
        .filter(F.col("__pos") <= kk)
        .groupBy(q)
        .agg(_fold(F.collect_list(F.struct(
            F.col("__pos").alias("r"),
            (F.col("__g")
             / F.log2(F.col("__pos").cast("double") + 1.0)).alias("t"),
        ))).alias("__idcg"))
    )
    n_rel = g.groupBy(q).agg(F.count(F.lit(1)).alias("n_rel"))
    out = (
        per_q.join(n_rel, q, "left").join(ideal, q, "left")
        .select(
            F.col(q).alias(query_col),
            F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
            "hits_at_k",
            F.round(
                F.col("hits_at_k").cast("double") / F.col("n_rel"),
                int(round_to)).alias("recall_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("__first"), F.lit(0.0)),
                int(round_to)).alias("mrr_at_k"),
            F.round(F.col("__dcg") / F.col("__idcg"),
                    int(round_to)).alias("ndcg_at_k"),
        )
    )
    return out


def retrieval_metrics_sql(
    ranked_sql: str,
    qrels_sql: str,
    query_col: str = "query",
    id_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
    k: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`retrieval_metrics` — identical rank
    derivation, the same rank-ordered ``list_reduce`` DCG folds from
    0.0, the same NULL conventions."""
    kk = int(k)
    if kk < 1:
        raise ValueError(f"k must be >= 1: {k}")
    rt = int(round_to)
    fold = ("list_reduce(list_prepend(0.0::DOUBLE, "
            "list({term} ORDER BY {ord})), (acc, x) -> acc + x)")
    dcg = fold.format(
        term="__gain / log2(CAST(__rank AS DOUBLE) + 1.0)", ord="__rank")
    idcg = fold.format(
        term="__g / log2(CAST(__pos AS DOUBLE) + 1.0)", ord="__pos")
    return f"""
WITH __rk AS (
  SELECT {query_col} AS __q, {id_col} AS __i,
         row_number() OVER (PARTITION BY {query_col}
                            ORDER BY CAST({score_col} AS DOUBLE) DESC,
                                     {id_col} ASC) AS __rank
  FROM ({ranked_sql})
), __r AS (SELECT * FROM __rk WHERE __rank <= {kk}),
__g AS (
  SELECT {query_col} AS __q, {id_col} AS __i,
         CAST({grade_col} AS DOUBLE) AS __g
  FROM ({qrels_sql}) WHERE CAST({grade_col} AS DOUBLE) > 0
), __j AS (
  SELECT r.__q, r.__rank, coalesce(g.__g, 0.0::DOUBLE) AS __gain
  FROM __r r LEFT JOIN __g g ON r.__q = g.__q AND r.__i = g.__i
), __pq AS (
  SELECT __q, {dcg} AS __dcg,
         min(CASE WHEN __gain > 0 THEN __rank END) AS __first,
         sum(CASE WHEN __gain > 0 THEN 1 ELSE 0 END)::BIGINT AS hits_at_k
  FROM __j GROUP BY __q
), __ip AS (
  SELECT __q, {idcg} AS __idcg FROM (
    SELECT __q, __g,
           row_number() OVER (PARTITION BY __q
                              ORDER BY __g DESC, __i ASC) AS __pos
    FROM __g
  ) WHERE __pos <= {kk} GROUP BY __q
), __nr AS (SELECT __q, count(*)::BIGINT AS n_rel FROM __g GROUP BY __q)
SELECT p.__q AS {query_col},
       coalesce(n.n_rel, 0) AS n_rel,
       p.hits_at_k,
       round(CAST(p.hits_at_k AS DOUBLE) / n.n_rel, {rt}) AS recall_at_k,
       round(coalesce(1.0::DOUBLE / p.__first, 0.0::DOUBLE), {rt})
         AS mrr_at_k,
       round(p.__dcg / i.__idcg, {rt}) AS ndcg_at_k
FROM __pq p
LEFT JOIN __nr n ON p.__q = n.__q
LEFT JOIN __ip i ON p.__q = i.__q
"""
