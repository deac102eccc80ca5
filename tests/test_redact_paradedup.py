"""PII redaction + paragraph-level dedup (training-data pipeline ops,
north-star §2.6/§2.7). Both are oracle-checked end-to-end in
__spark_entry__; these tests pin the operator-level semantics the
oracle can't express as clearly (sequential counts, within-doc dedup,
empty-doc handling, partitioning invariance)."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redact_kinds_and_sequential_counts(spark):
    from simba_spark.operators.text import pii_redact

    rows = [
        (1, "write to alice.smith+x@example.co.uk today"),
        (2, "server at 192.168.001.42 port 80"),
        (3, "call +1 555-867-5309 or (555) 123-4567"),
        (4, "card 4111 1111 1111 1111 exp 11/26"),
        (5, "ssn 078-05-1120 on file"),
        (6, "clean text, nothing to see"),
        (7, "multi a@b.io c@d.org and 10.0.0.1"),
    ]
    out = {r["doc_id"]: r for r in pii_redact(_docs(spark, rows)).collect()}
    assert out[1]["n_email"] == 1 and "@" not in out[1]["text_redacted"]
    assert out[2]["n_ipv4"] == 1 and "<ipv4>" in out[2]["text_redacted"]
    assert out[3]["n_phone"] == 2
    # a card number is counted ONCE as card — the later phone/ipv4
    # patterns never see its digits (sequential-count semantics)
    assert out[4]["n_card"] == 1 and out[4]["n_phone"] == 0
    assert out[5]["n_ssn"] == 1 and out[5]["n_phone"] == 0
    assert out[6]["n_pii"] == 0
    assert out[6]["text_redacted"] == rows[5][1]
    assert out[7]["n_email"] == 2 and out[7]["n_ipv4"] == 1
    assert out[7]["n_pii"] == 3
    # original text column is preserved alongside
    assert out[4]["text"] == rows[3][1]


def test_pii_redact_custom_kinds_and_token(spark):
    from simba_spark.operators.text import pii_redact

    rows = [(1, "a@b.io and 10.0.0.1")]
    out = pii_redact(
        _docs(spark, rows), kinds=["email"], token_fmt="[{kind} removed]"
    ).collect()[0]
    assert out["n_email"] == 1
    assert "[email removed]" in out["text_redacted"]
    # ipv4 not requested → untouched, and no n_ipv4 column
    assert "10.0.0.1" in out["text_redacted"]
    assert "n_ipv4" not in out.asDict()


def test_paragraph_dedup_semantics(spark):
    from simba_spark.operators.dedup import paragraph_dedup

    sep = "\n\n"
    rows = [
        (1, sep.join(["alpha", "boiler", "beta"])),
        (2, sep.join(["boiler", "gamma"])),      # boiler seen in doc 1
        (3, sep.join(["delta", "delta"])),       # within-doc duplicate
        (4, "boiler"),                            # fully duplicated doc
        (5, "unique"),
    ]
    out = {r["doc_id"]: r for r in
           paragraph_dedup(_docs(spark, rows), sep=sep).collect()}
    assert out[1]["text"] == sep.join(["alpha", "boiler", "beta"])
    assert out[1]["n_dropped"] == 0
    assert out[2]["text"] == "gamma" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "delta" and out[3]["n_dropped"] == 1
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 1
    assert out[4]["n_paras"] == 1
    assert out[5]["text"] == "unique"
    # row count preserved (callers filter empties themselves)
    assert len(out) == 5


def test_paragraph_dedup_partitioning_invariant(spark):
    from simba_spark.operators.dedup import paragraph_dedup

    sep = "\n\n"
    rows = [
        (i, sep.join([f"own-{i}", f"shared-{i % 3}", f"tail-{i % 7}"]))
        for i in range(60)
    ]
    a = paragraph_dedup(_docs(spark, rows), sep=sep).collect()
    b = paragraph_dedup(
        _docs(spark, rows).repartition(7), sep=sep
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # exactly one keeper per distinct paragraph
    total_kept = sum(r["n_paras"] - r["n_dropped"] for r in a)
    distinct = len({p for _, t in rows for p in t.split(sep)})
    assert total_kept == distinct


def test_paragraph_dedup_metachar_separator(spark):
    from simba_spark.operators.dedup import paragraph_dedup

    rows = [(1, "x||y||x"), (2, "y||z")]
    out = {r["doc_id"]: r for r in
           paragraph_dedup(_docs(spark, rows), sep="||").collect()}
    assert out[1]["text"] == "x||y" and out[1]["n_dropped"] == 1
    assert out[2]["text"] == "z" and out[2]["n_dropped"] == 1


def test_remove_duplicated_ngrams_semantics(spark):
    from simba_spark.operators.dedup import remove_duplicated_ngrams

    rows = [
        (1, "aa bb cc unique one text"),
        (2, "other words aa bb cc more"),
        (3, "totally different content here"),
        (4, "aa bb cc"),                       # fully covered
        (5, "xx"),                             # shorter than n
    ]
    out = {r["doc_id"]: r for r in remove_duplicated_ngrams(
        _docs(spark, rows), n=3, max_doc_freq=2).collect()}
    # "aa bb cc" occurs in 3 distinct docs (> 2) → covered everywhere
    assert out[1]["text"] == "unique one text" and out[1]["n_removed"] == 3
    assert out[2]["text"] == "other words more" and out[2]["n_removed"] == 3
    assert out[3]["text"] == rows[2][1] and out[3]["n_removed"] == 0
    assert out[4]["text"] == "" and out[4]["n_removed"] == 3
    assert out[5]["text"] == "xx" and out[5]["n_removed"] == 0
    assert out[4]["n_tokens"] == 3


def test_remove_duplicated_ngrams_overlap_and_threshold(spark):
    from simba_spark.operators.dedup import remove_duplicated_ngrams

    # the shared span is 4 tokens (two overlapping 3-grams); covered
    # positions must union, not double-remove
    rows = [
        (1, "p q r s alpha"),
        (2, "beta p q r s"),
        (3, "gamma delta"),
    ]
    out = {r["doc_id"]: r for r in remove_duplicated_ngrams(
        _docs(spark, rows), n=3, max_doc_freq=1).collect()}
    assert out[1]["text"] == "alpha" and out[1]["n_removed"] == 4
    assert out[2]["text"] == "beta" and out[2]["n_removed"] == 4
    assert out[3]["n_removed"] == 0
    # higher threshold → pair-duplicated span survives
    out2 = {r["doc_id"]: r for r in remove_duplicated_ngrams(
        _docs(spark, rows), n=3, max_doc_freq=2).collect()}
    assert out2[1]["text"] == rows[0][1]


def test_remove_duplicated_ngrams_partitioning_invariant(spark):
    from simba_spark.operators.dedup import remove_duplicated_ngrams

    rows = [
        (i, " ".join(
            [f"u{i}w{j}" for j in range(5)]
            + ["shared", "foot", "er"] * (i % 2)))
        for i in range(40)
    ]
    a = remove_duplicated_ngrams(_docs(spark, rows)).collect()
    b = remove_duplicated_ngrams(_docs(spark, rows).repartition(9)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# Blocked edit-distance self-join (PassJoin pigeonhole)


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_edit_distance_pairs_exhaustive_vs_naive(spark):
    import itertools
    import random

    from simba_spark.operators.dedup import edit_distance_pairs

    random.seed(11)
    strs = ["", "a", "b", "ab", "ba"] + [
        "".join(random.choice("abc") for _ in range(random.randint(1, 8)))
        for _ in range(60)
    ]
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, ["rid", "s"])
    for d in (0, 1, 2):
        got = {
            (r["a_id"], r["b_id"], r["dist"])
            for r in edit_distance_pairs(df, "s", "rid", max_dist=d).collect()
        }
        want = {
            (i, j, _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= d
        }
        assert got == want, f"d={d}"


def test_edit_distance_pairs_no_cartesian_plan(spark):
    from simba_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "abcdef"), (2, "abcdxf")], ["rid", "s"])
    plan = spark._jvm.PythonSQLUtils.explainString(
        edit_distance_pairs(df, "s", "rid", 2)._jdf.queryExecution(),
        "formatted",
    )
    assert "CartesianProduct" not in plan
    # nested-loop joins exist only against the checkpointed 1-ROW
    # affix-meta frame (constant size by construction) — every BNL in
    # the plan must broadcast that scan, never a data-sized side
    import re
    n_bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    n_rdd = len(re.findall(r"Scan ExistingRDD|LogicalRDD", plan))
    assert n_bnl <= n_rdd, (n_bnl, n_rdd)


def test_edit_distance_pairs_nulls_and_validation(spark):
    import pytest

    from simba_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "abcd"), (2, None), (3, "abce"), (None, "abcf")], ["rid", "s"]
    )
    got = edit_distance_pairs(df, "s", "rid", 1).collect()
    assert [(r["a_id"], r["b_id"], r["dist"]) for r in got] == [(1, 3, 1)]
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "s", "rid", -1)
