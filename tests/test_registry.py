"""Driver-contract invariants: the external correctness gate checks the
FIRST 50 ``queries()`` entries — these tests keep the registry shaped so
no query silently falls out of coverage again (round-3 lesson)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_queries_exactly_at_driver_cap():
    assert len(entrymod.queries()) == entrymod._DRIVER_QUERY_CAP == 50


def test_registry_split_is_disjoint_and_fully_oracled():
    q = entrymod.queries()
    x = entrymod.extra_queries()
    o = entrymod.oracle_sql()
    assert not set(q) & set(x)
    allq = set(q) | set(x)
    # every registered query has a SQL oracle and vice versa
    assert allq == set(o)


def test_oracle_output_types_driver_safe():
    """Sweep EVERY oracle's DuckDB output schema for types the driver's
    type-sensitive hasher represents differently from Spark (HUGEINT,
    unsigned, DECIMAL). Round-5 lesson: `inverted_index` was
    cell-for-cell identical yet red at the driver because an uncast
    `sum(tf)` returned int128 — this test makes that class unshippable.
    Plan-time only (``DESCRIBE``), so it is cheap for all ~110 oracles."""
    import duckdb

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts"),
    )
    from check_oracle import bad_oracle_types

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        bad = bad_oracle_types(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with driver-divergent output types (cast to "
        f"BIGINT/DOUBLE in the SQL): {offenders}"
    )


def test_round11_debuts_lead_the_window():
    """Newest-first: the round-11 debuts, then the 2 seated round-10
    late debuts (first driver check), the 25 retained one-green
    round-10 rows (earning 2nds), and the re-seat batches (dict order
    IS the driver's check order)."""
    head = list(entrymod.queries())[:50]
    r11_debuts = [
        "blocking_eval",
        "fdr_ks",
        "textrank",
        "dbscan",
        "betweenness",
        "ivfpq_knn_join",
    ]
    n11 = len(r11_debuts)
    assert head[:n11] == r11_debuts
    assert head[n11:n11 + 2] == ["k_truss", "stream_quantile"]
    r10_retained = {
        "louvain_levels", "anova_events", "silhouette", "qlm_retrieval",
        "lexdiv", "scd2_delete", "stream_hll", "fd_profile", "km_churn",
        "ivf_knn_join",
        "bpe_merges_sampled", "retrieval_eval", "temperature_mixture",
        "trunc_recall", "kn_trigram_lm", "kruskal_events", "scd2_apply",
        "contrastive_pairs", "skyline_orders", "clustering_coeff_capped",
        "stream_trending", "holt_winters", "louvain", "stream_cm",
        "bpe_fertility",
    }
    assert set(head[n11 + 2:n11 + 27]) == r10_retained
    reseats = {
        # after-r3 ledger batch
        "top_orders", "nation_volume", "window_top_orders",
        "customers_without_orders", "parts_with_lineitems", "events_agg",
        "rollup_lineitem", "doc_token_stats", "doc_lang_id",
        "embedding_topk", "doc_quality", "embedding_dup_pairs",
        # after-r4 batch
        "segment_range", "box_range", "interval_overlap", "sessionize",
        "ngram_jaccard",
    }
    assert set(head[n11 + 27:]) == reseats
