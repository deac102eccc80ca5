"""Reciprocal-rank fusion (hybrid retrieval)."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_rrf_fuse_hand_computed(spark):
    from simba_spark.operators.retrieval import rrf_fuse

    # lexical ranks: d1=1, d2=2, d3=3 ; vector ranks: d3=1, d1=2
    lex = spark.createDataFrame(
        [("d1", 9.0), ("d2", 5.0), ("d3", 2.0)], ["doc", "s"]
    )
    vec = spark.createDataFrame([("d3", 0.9), ("d1", 0.7)], ["doc", "c"])
    out = {
        r["doc"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([lex, vec], ["doc"], ["s", "c"], k=60).collect()
    }
    assert out["d1"] == (1.0 / 61 + 1.0 / 62, 2)
    assert out["d2"] == (1.0 / 62, 1)
    assert out["d3"] == (1.0 / 63 + 1.0 / 61, 2)


def test_rrf_fuse_deterministic_tiebreak_and_topk(spark):
    from simba_spark.operators.retrieval import rrf_fuse

    # equal scores: rank order falls back to ascending id
    lex = spark.createDataFrame(
        [("b", 1.0), ("a", 1.0), ("c", 1.0)], ["doc", "s"]
    )
    one = rrf_fuse([lex], ["doc"], ["s"], k=10, topk=2).collect()
    assert [r["doc"] for r in one] == ["a", "b"]
    plan = _plan(rrf_fuse([lex], ["doc"], ["s"], k=10, topk=2))
    assert "TakeOrderedAndProject" in plan  # global top-k, no full sort


def test_rrf_fuse_grouped_multi_query(spark):
    from simba_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q1", "d1", 3.0), ("q1", "d2", 1.0), ("q2", "d2", 7.0)],
        ["q", "doc", "s"],
    )
    vec = spark.createDataFrame(
        [("q1", "d2", 0.8), ("q2", "d1", 0.5)], ["q", "doc", "c"]
    )
    rows = rrf_fuse(
        [lex, vec], ["doc"], ["s", "c"], k=60, by=["q"], topk=1
    ).collect()
    best = {r["q"]: r["doc"] for r in rows}
    # q1: d2 appears in both lists (1/62 + 1/61) > d1 (1/61)
    assert best == {"q1": "d2", "q2": "d1"} or best["q1"] == "d2"
    assert len(rows) == 2


def test_rrf_fuse_validation(spark):
    from simba_spark.operators.retrieval import rrf_fuse

    df = spark.createDataFrame([("a", 1.0)], ["doc", "s"])
    with pytest.raises(ValueError):
        rrf_fuse([], ["doc"], [])
    with pytest.raises(ValueError):
        rrf_fuse([df], ["doc"], ["s", "extra"])
    with pytest.raises(ValueError):
        rrf_fuse([df], ["doc"], ["s"], k=0)


def test_rrf_fuse_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from simba_spark.operators.retrieval import rrf_fuse, rrf_fuse_sql

    a = spark.range(30).select(
        (F.col("id") % 17).alias("doc"),
        ((F.col("id") * 7) % 13).cast("double").alias("s"),
    ).groupBy("doc").agg(F.max("s").alias("s"))
    b = spark.range(20).select(
        (F.col("id") % 11).alias("doc"),
        ((F.col("id") * 3) % 9).cast("double").alias("c"),
    ).groupBy("doc").agg(F.max("c").alias("c"))
    got = {
        r["doc"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], ["doc"], ["s", "c"], k=60).collect()
    }
    con = duckdb.connect()
    sql = rrf_fuse_sql(
        [
            "SELECT (i % 17) AS doc, max(CAST((i * 7) % 13 AS DOUBLE)) AS s "
            "FROM range(30) r(i) GROUP BY 1",
            "SELECT (i % 11) AS doc, max(CAST((i * 3) % 9 AS DOUBLE)) AS c "
            "FROM range(20) r(i) GROUP BY 1",
        ],
        ["doc"], ["s", "c"], k=60,
    )
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == want  # bit-for-bit: fixed-order coalesced float sum


# --- MMR diversified re-ranking ----------------------------------------------

def _mmr_fixture_rows():
    import random

    rng = random.Random(3)
    base = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]
    rows, i = [], 0
    for ci, b in enumerate(base):
        for j in range(5):
            rows.append((
                i, 0.9 - 0.05 * j - 0.1 * ci,
                [x + rng.uniform(-0.02, 0.02) for x in b],
            ))
            i += 1
    return rows


def test_mmr_rerank_diversifies_across_clusters(spark):
    from simba_spark.operators.retrieval import mmr_rerank

    df = spark.createDataFrame(
        _mmr_fixture_rows(), "vec_id long, rel double, embedding array<double>"
    )
    got = mmr_rerank(df, k=6, lam=0.5).orderBy("selection_rank").collect()
    # pure relevance would pick cluster 0 five times first; MMR's first
    # three picks must cover all three near-duplicate clusters
    assert {r.vec_id // 5 for r in got[:3]} == {0, 1, 2}
    assert [r.selection_rank for r in got] == [1, 2, 3, 4, 5, 6]


def test_mmr_rerank_lambda_one_is_pure_relevance(spark):
    from simba_spark.operators.retrieval import mmr_rerank

    df = spark.createDataFrame(
        _mmr_fixture_rows(), "vec_id long, rel double, embedding array<double>"
    )
    got = [r.vec_id for r in
           mmr_rerank(df, k=5, lam=1.0).orderBy("selection_rank").collect()]
    exp = [r.vec_id for r in
           df.orderBy(F.desc("rel"), F.asc("vec_id")).limit(5).collect()]
    assert got == exp


def test_mmr_rerank_duckdb_parity_and_k_exceeds_n(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.retrieval import mmr_rerank, mmr_rerank_sql

    rows = _mmr_fixture_rows()
    df = spark.createDataFrame(
        rows, "vec_id long, rel double, embedding array<double>"
    )
    got = [
        (r.selection_rank, r.vec_id, r.rel, r.mmr)
        for r in mmr_rerank(df, k=20, lam=0.7).orderBy("selection_rank").collect()
    ]
    assert len(got) == len(rows)  # k > N: every candidate selected once
    con = duckdb.connect()
    con.register("cand", pd.DataFrame(rows, columns=["vec_id", "rel", "embedding"]))
    oracle = [tuple(r) for r in con.execute(
        mmr_rerank_sql("SELECT * FROM cand", k=20, lam=0.7)).fetchall()]
    assert got == oracle


def test_mmr_rerank_validation(spark):
    from simba_spark.operators.retrieval import mmr_rerank

    df = spark.createDataFrame(
        [(0, 1.0, [1.0])], "vec_id long, rel double, embedding array<double>"
    )
    for kw in ({"lam": 1.5}, {"k": 0}):
        with pytest.raises(ValueError):
            mmr_rerank(df, **kw)


# --- PRF query expansion -----------------------------------------------------

def test_prf_expand_values_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.retrieval import prf_expand, prf_expand_sql

    corpus = [
        (0, "spark shuffle join hash partition"),
        (1, "spark join broadcast hash skew"),
        (2, "spark hash aggregate partial merge"),
        (3, "cat dog fish bird"),
        (4, "cat dog tree house"),
        (5, "spark join shuffle partition skew"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = prf_expand(df, ["spark", "join"], k_docs=3, k_terms=3)
    got = [(r.term, r.weight) for r in out.collect()]
    terms = [t for t, _ in got]
    # expansion never echoes the query, and comes from feedback docs
    assert "spark" not in terms and "join" not in terms
    assert set(terms) <= {"shuffle", "hash", "partition", "broadcast",
                          "skew", "aggregate", "partial", "merge"}
    # idf discount: 'cat'/'dog' (absent from feedback docs) never appear
    assert not ({"cat", "dog"} & set(terms))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(corpus, columns=["doc_id", "text"]))
    o = con.execute(
        prf_expand_sql("documents", ["spark", "join"], k_docs=3, k_terms=3)
    ).fetchall()
    assert got == [tuple(r) for r in o]


def test_prf_expand_validation(spark):
    from simba_spark.operators.retrieval import prf_expand

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        prf_expand(df, ["a"], k_docs=0)


def test_bm25_sql_terms_table_matches_literals(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.text import bm25_sql

    corpus = [(i, "alpha beta gamma"[: 5 + 3 * (i % 3)]) for i in range(6)]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(corpus, columns=["doc_id", "text"]))
    lit = con.execute(bm25_sql("documents", ["alpha", "beta"], k=5)).fetchall()
    tab = con.execute(
        bm25_sql("documents", [], k=5,
                 terms_sql="SELECT unnest(['alpha', 'beta']) AS term")
    ).fetchall()
    assert lit == tab
    with pytest.raises(ValueError):
        bm25_sql("documents", [], require_all=True, terms_sql="SELECT 'a' AS term")


# --- retrieval_metrics (nDCG / MRR / recall @ k) ------------------------------

def test_retrieval_metrics_hand_computed(spark):
    import math

    from simba_spark.operators.retrieval import retrieval_metrics

    # q1: ranked d1(3.0) d2(2.0) d3(1.0); relevant: d1 grade 3, d3 grade 1,
    #     d9 grade 2 (never retrieved)
    ranked = spark.createDataFrame(
        [("q1", "d1", 3.0), ("q1", "d2", 2.0), ("q1", "d3", 1.0),
         ("q2", "d1", 1.0), ("q2", "d2", 0.5)],
        ["query", "doc_id", "score"],
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 3), ("q1", "d3", 1), ("q1", "d9", 2),
         ("q3", "d1", 1)],  # q3 judged but never ranked: absent from output
        ["query", "doc_id", "grade"],
    )
    out = {r.query: r for r in
           retrieval_metrics(ranked, qrels, k=3).collect()}
    q1 = out["q1"]
    assert q1.n_rel == 3 and q1.hits_at_k == 2
    assert q1.recall_at_k == round(2 / 3, 6)
    assert q1.mrr_at_k == 1.0
    dcg = 3 / math.log2(2) + 0 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert q1.ndcg_at_k == round(dcg / idcg, 6)
    # q2: no judgments at all -> NULL recall/ndcg, mrr 0
    q2 = out["q2"]
    assert q2.n_rel == 0 and q2.hits_at_k == 0
    assert q2.recall_at_k is None and q2.ndcg_at_k is None
    assert q2.mrr_at_k == 0.0
    assert "q3" not in out


def test_retrieval_metrics_duckdb_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.retrieval import (retrieval_metrics,
                                                 retrieval_metrics_sql)

    rng = random.Random(3)
    ranked = [(f"q{i % 5}", f"d{rng.randrange(40)}", round(rng.random(), 4))
              for i in range(120)]
    ranked = list({(q, d): (q, d, s) for q, d, s in ranked}.values())
    qrels = [(f"q{i % 5}", f"d{rng.randrange(40)}", rng.randrange(0, 4))
             for i in range(60)]
    qrels = list({(q, d): (q, d, g) for q, d, g in qrels}.values())
    rdf = spark.createDataFrame(ranked, ["query", "doc_id", "score"])
    gdf = spark.createDataFrame(qrels, ["query", "doc_id", "grade"])
    got = sorted(map(tuple, retrieval_metrics(rdf, gdf, k=7).collect()))
    con = duckdb.connect()
    con.register("rk", pd.DataFrame(ranked, columns=["query", "doc_id", "score"]))
    con.register("qr", pd.DataFrame(qrels, columns=["query", "doc_id", "grade"]))
    oracle = sorted(map(tuple, con.execute(retrieval_metrics_sql(
        "SELECT * FROM rk", "SELECT * FROM qr", k=7)).fetchall()))
    assert got == oracle


def test_bm25_topk_batch_matches_single(spark):
    from simba_spark.operators.text import bm25_topk, bm25_topk_batch

    corpus = [(i, ("alpha beta " * (i % 4)) + ("gamma " * (i % 3)) + "delta")
              for i in range(30)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    batch = bm25_topk_batch(
        df, {"a": ["alpha"], "ab": ["alpha", "beta"], "g": ["gamma"]}, k=8)
    for qid, terms in [("a", ["alpha"]), ("ab", ["alpha", "beta"]),
                       ("g", ["gamma"])]:
        single = [(r.doc_id, r.score)
                  for r in bm25_topk(df, terms, k=8).collect()]
        got = [(r.doc_id, r.score)
               for r in batch.filter(F.col("query") == qid)
               .orderBy(F.desc("score"), F.asc("doc_id")).collect()]
        assert got == single, qid


def test_bm25_batch_sql_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.text import bm25_batch_sql, bm25_topk_batch

    corpus = [(i, ("alpha beta " * (i % 4)) + ("gamma " * (i % 3)) + "delta")
              for i in range(30)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    queries = {"a": ["alpha"], "ab": ["alpha", "beta"], "g": ["gamma"]}
    got = sorted(map(tuple,
                     bm25_topk_batch(df, queries, k=8).collect()))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(corpus, columns=["doc_id", "text"]))
    oracle = sorted(map(tuple, con.execute(
        bm25_batch_sql("documents", queries, k=8)).fetchall()))
    assert got == oracle


# --- truncation_recall (Matryoshka eval) --------------------------------------

def test_truncation_recall_semantics_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.similarity import (truncation_recall,
                                                  truncation_recall_sql)

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = truncation_recall(df, [4, 16], k=5, n_queries=4)
    got = sorted(map(tuple, out.collect()))
    # full-width "truncation" is the ground truth itself: recall 1.0
    assert all(r == 1.0 for q, d, r in got if d == 16)
    # 4 queries x 2 widths
    assert len(got) == 8
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        rows, columns=["vec_id", "embedding"]))
    oracle = sorted(map(tuple, con.execute(truncation_recall_sql(
        "embeddings", [4, 16], k=5, n_queries=4)).fetchall()))
    assert got == oracle
    with pytest.raises(ValueError):
        truncation_recall(df, [], k=5)
    with pytest.raises(ValueError):
        truncation_recall(df, [4], k=0)


# --- contrastive_pairs (hard positive/negative mining) -------------------------

def test_contrastive_pairs_semantics_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.similarity import (contrastive_pairs,
                                                  contrastive_pairs_sql)

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(40)]
    rows.append((40, [rng.uniform(-1, 1) for _ in range(8)], None))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = contrastive_pairs(df, k=4, n_anchors=3)
    got = sorted(map(tuple, out.collect()))
    # 3 anchors x 2 kinds x 4 pairs; NULL-label row never appears
    assert len(got) == 24
    assert all(p != 40 for _, _, p, _, _ in got)
    # kind semantics: negatives are the highest sims, positives lowest
    by = {}
    for a, kind, p, s, r in got:
        by.setdefault((a, kind), []).append((r, s, p))
    labels = {i: i % 3 for i in range(40)}
    for (a, kind), items in by.items():
        items.sort()
        sims = [s for _, s, _ in items]
        assert sims == sorted(sims, reverse=(kind == "neg"))
        for _, _, p in items:
            assert (labels[p] != labels[a]) == (kind == "neg")
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        rows, columns=["vec_id", "embedding", "label"]))
    oracle = sorted(map(tuple, con.execute(contrastive_pairs_sql(
        "embeddings", k=4, n_anchors=3)).fetchall()))
    assert got == oracle
    with pytest.raises(ValueError):
        contrastive_pairs(df, k=0)
    with pytest.raises(ValueError):
        contrastive_pairs(df, kinds=["bad"])


def test_contrastive_pairs_non_dense_ids(spark):
    """Anchor contract on NON-dense ids (offset range): the anchors
    must be the true n lowest ids, not `id < n_anchors` (which would
    select an empty set here). Shifting every id by a constant must
    shift the output ids and nothing else."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import random

    from simba_spark.operators.similarity import (contrastive_pairs,
                                                  contrastive_pairs_sql)

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(40)]
    OFF = 1000
    shifted = [(i + OFF, v, l) for i, v, l in rows]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    sdf = spark.createDataFrame(
        shifted, "vec_id long, embedding array<double>, label int")
    base = sorted(map(tuple, contrastive_pairs(df, k=4, n_anchors=3)
                      .collect()))
    got = sorted(map(tuple, contrastive_pairs(sdf, k=4, n_anchors=3)
                     .collect()))
    assert len(got) == 24  # the old id<n rule would return 0 rows
    assert got == [(a + OFF, kd, p + OFF, s, r) for a, kd, p, s, r in base]
    # SQL mirror agrees on the shifted domain too
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        shifted, columns=["vec_id", "embedding", "label"]))
    oracle = sorted(map(tuple, con.execute(contrastive_pairs_sql(
        "embeddings", k=4, n_anchors=3)).fetchall()))
    assert got == oracle


# --- lm_dirichlet_topk (query-likelihood retrieval) -----------------------------

def test_lm_dirichlet_semantics_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import math
    import pandas as pd

    from simba_spark.operators.text import lm_dirichlet_topk, lm_dirichlet_sql

    rows = [
        (1, "spark join join join filler filler filler filler"),
        (2, "spark join"),                      # short doc, both terms
        (3, "spark alone here with words"),     # one term
        (4, "nothing relevant at all"),         # no terms -> excluded
        (5, "join " * 50),                      # long, high tf
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mu = 10.0
    got = lm_dirichlet_topk(df, ["spark", "join"], k=10, mu=mu).collect()
    ids = [r.doc_id for r in got]
    assert 4 not in ids and set(ids) == {1, 2, 3, 5}

    # brute-force the per-matched-term formula
    toks = {i: t.split() for i, t in rows}
    ctot = sum(len(v) for v in toks.values())
    cf = {q: sum(v.count(q) for v in toks.values()) for q in ("spark", "join")}
    ref = {}
    for i, v in toks.items():
        s = 0.0
        for q in ("spark", "join"):
            tf = v.count(q)
            if tf:
                s += math.log(1 + tf / (mu * cf[q] / ctot)) \
                     + math.log(mu / (len(v) + mu))
        if s != 0.0:
            ref[i] = round(s, 6)
    for r in got:
        assert abs(r.score - ref[r.doc_id]) < 1e-6

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = con.execute(lm_dirichlet_sql(
        "documents", ["spark", "join"], k=10, mu=mu)).fetchall()
    assert sorted(map(tuple, got)) == sorted(map(tuple, oracle))

    with pytest.raises(ValueError):
        lm_dirichlet_topk(df, [])
    with pytest.raises(ValueError):
        lm_dirichlet_topk(df, ["a"], mu=0.0)


# --- lexical_diversity (TTR / hapax / Guiraud) ----------------------------------

def test_lexical_diversity_semantics_and_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import math
    import pandas as pd

    from simba_spark.operators.text import (lexical_diversity,
                                            lexical_diversity_sql)

    rows = [
        (1, "a a a a"),                 # 4 tokens, 1 type, 0 hapax
        (2, "one two three four"),      # all hapax
        (3, "x y x z"),                 # mixed
        (4, ""),                        # token-less -> NULL ratios
        (5, "A a B b"),                 # lowercased -> 2 types
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lexical_diversity(df).collect()}
    assert out[1].n_tokens == 4 and out[1].n_types == 1
    assert out[1].ttr == 0.25 and out[1].hapax_ratio == 0.0
    assert out[2].ttr == 1.0 and out[2].hapax_ratio == 1.0
    assert out[3].n_types == 3 and out[3].hapax_ratio == round(2 / 3, 6)
    assert out[4].n_tokens == 0 and out[4].ttr is None
    assert out[5].n_types == 2
    assert out[2].guiraud == round(4 / math.sqrt(4), 6)

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = sorted(map(tuple, con.execute(
        lexical_diversity_sql("documents")).fetchall()))
    assert sorted(map(tuple, (tuple(r) for r in out.values()))) == oracle
