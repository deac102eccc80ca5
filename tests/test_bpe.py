"""BPE tokenizer training (operators/text.py bpe_train / bpe_apply).

The correctness bar is the published algorithm itself: a pure-Python
Sennrich-style reference (frequency-weighted overlapping pair counts,
left-to-right non-overlapping merges, count-desc / pair-asc ties) must
reproduce the distributed merge sequence exactly, and the DuckDB SQL
mirror must hash-match it bit-for-bit.
"""
import collections
import re

import pytest
from pyspark.sql import functions as F

from simba_spark.operators.text import bpe_apply, bpe_train, bpe_train_sql

CORPUS = [
    (0, "low lower lowest low low newer newest new"),
    (1, "wider wide widest low lower new newer newer"),
    (2, "aaa aab the the the lowest newest wide wide"),
    (3, "banana bandana ana ana nab the lowest of the low"),
]


def _ref_bpe(texts, num_merges, min_word_freq=1):
    """Pure-Python Sennrich-style reference implementation."""
    wf = collections.Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if re.fullmatch(r"[a-z]+", w):
                wf[w] += 1
    seqs = {tuple(w): f for w, f in wf.items() if f >= min_word_freq}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = collections.Counter()
        for s, f in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        new = {}
        for s, f in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        seqs = new
    return merges, seqs


def _ref_apply(text, merges):
    toks = []
    for w in text.lower().strip().split():
        if not re.fullmatch(r"[a-z]+", w):
            continue
        s = list(w)
        for _, l, r, _ in merges:
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        toks.extend(s)
    return toks


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_bpe_train_matches_reference(spark, corpus_df):
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(corpus_df, num_merges=12).orderBy("merge_rank").collect()
    ]
    exp, _ = _ref_bpe([t for _, t in CORPUS], 12)
    assert got == exp
    # merges are strictly non-increasing in count (greedy argmax)
    counts = [c for *_, c in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_train_partitioning_invariance(spark, corpus_df):
    a = bpe_train(corpus_df, num_merges=6).collect()
    b = bpe_train(corpus_df.repartition(7), num_merges=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_train_duckdb_parity(spark, corpus_df):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    got = [
        tuple(r)
        for r in bpe_train(corpus_df, num_merges=10).orderBy("merge_rank").collect()
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
    oracle = [tuple(r) for r in con.execute(bpe_train_sql(num_merges=10)).fetchall()]
    assert got == oracle


def test_bpe_train_sample_fraction(spark, corpus_df):
    """The sampled path: deterministic, SQL-mirrored, and merge-stable
    for frequency-dominant pairs (the 100 TB training mode)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    # dominance robustness: a corpus where one pair ('t','h') carries
    # overwhelming mass keeps its top merge under 50% word sampling
    big = [(i, "the this that with math " + w)
           for i, w in enumerate(
               ["lower", "wider", "newer", "banana", "zebra", "quartz",
                "jumps", "vexed", "fjord", "glyph"] * 3)]
    bdf = spark.createDataFrame(big, "doc_id long, text string")
    exact = [(r.lhs, r.rhs) for r in bpe_train(bdf, num_merges=3)
             .orderBy("merge_rank").collect()]
    samp = [(r.lhs, r.rhs) for r in
            bpe_train(bdf, num_merges=3, sample_fraction=0.5)
            .orderBy("merge_rank").collect()]
    assert exact[0] == ("t", "h")
    assert samp[0] == ("t", "h")

    # determinism: membership depends only on the word hash
    again = [(r.lhs, r.rhs) for r in
             bpe_train(bdf.repartition(5), num_merges=3,
                       sample_fraction=0.5).orderBy("merge_rank").collect()]
    assert samp == again

    # SQL mirror replays the identical sampled merge table
    got = [tuple(r) for r in
           bpe_train(corpus_df, num_merges=6, sample_fraction=0.7)
           .orderBy("merge_rank").collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
    oracle = [tuple(r) for r in con.execute(
        bpe_train_sql(num_merges=6, sample_fraction=0.7)).fetchall()]
    assert got == oracle

    with pytest.raises(ValueError):
        bpe_train(corpus_df, num_merges=2, sample_fraction=0.0)
    with pytest.raises(ValueError):
        bpe_train_sql(num_merges=2, sample_fraction=1.5)


def test_bpe_train_min_word_freq(spark, corpus_df):
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(corpus_df, num_merges=5, min_word_freq=2)
        .orderBy("merge_rank")
        .collect()
    ]
    exp, _ = _ref_bpe([t for _, t in CORPUS], 5, min_word_freq=2)
    assert got == exp


def test_bpe_train_early_stop_and_schema(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f a 123 !!")], "doc_id long, text string"
    )
    out = bpe_train(df, num_merges=5)
    assert out.columns == ["merge_rank", "lhs", "rhs", "pair_count"]
    assert out.count() == 0  # single-char words: no pairs, stop at once
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=-1)


def test_bpe_apply_reproduces_training_segmentation(spark, corpus_df):
    merges_rows = bpe_train(corpus_df, num_merges=12).orderBy("merge_rank").collect()
    merges = [(r.merge_rank, r.lhs, r.rhs, r.pair_count) for r in merges_rows]
    enc = bpe_apply(corpus_df, merges=merges_rows).orderBy("doc_id").collect()
    for row, (_, text) in zip(enc, CORPUS):
        assert row.bpe_tokens == _ref_apply(text, merges)


def test_bpe_apply_unknown_word_falls_back_to_chars(spark, corpus_df):
    merges = bpe_train(corpus_df, num_merges=8).orderBy("merge_rank").collect()
    df = spark.createDataFrame([(0, "zzq")], "doc_id long, text string")
    out = bpe_apply(df, merges=merges).collect()[0].bpe_tokens
    assert out == ["z", "z", "q"]  # no learned merge touches these chars


def test_bpe_apply_plan_is_udf_free(spark, corpus_df):
    merges = bpe_train(corpus_df, num_merges=4).collect()
    plan = bpe_apply(corpus_df, merges=merges)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_apply_sql_mirror_matches(spark, corpus_df):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from simba_spark.operators.text import bpe_apply_sql

    merges = bpe_train(corpus_df, num_merges=8).orderBy("merge_rank").collect()
    enc = bpe_apply(corpus_df, merges=merges)
    got = {
        r.doc_id: (r.n, r.h)
        for r in enc.select(
            "doc_id", F.size("bpe_tokens").alias("n"),
            F.expr("array_join(slice(bpe_tokens, 1, 5), ' ')").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe_apply_sql(num_merges=8)).fetchall()
    }
    assert got == oracle
