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


def test_round10_debuts_lead_the_window():
    """Newest-first: the 9 round-10 debuts, then the seated 15-query
    round-9 late-debut queue, the 2 round-9 streaming debuts + 18
    round-9 seatings (earning 2nd greens), and the 6 after-r3 re-seats
    (dict order IS the driver's check order)."""
    head = list(entrymod.queries())[:50]
    debuts = [
        "louvain_levels", "anova_events", "silhouette", "qlm_retrieval",
        "lexdiv", "scd2_delete", "stream_hll", "fd_profile", "km_churn",
        "ivf_knn_join",
    ]
    assert head[:10] == debuts
    r9_late = {
        "bpe_merges_sampled", "retrieval_eval", "temperature_mixture",
        "trunc_recall", "kn_trigram_lm", "kruskal_events", "scd2_apply",
        "contrastive_pairs", "skyline_orders", "clustering_coeff_capped",
        "stream_trending", "holt_winters", "louvain", "stream_cm",
        "bpe_fertility",
    }
    assert set(head[10:25]) == r9_late
    r9_seated = {
        "stream_session_window", "stream_ohlc",
        "seasonal_decompose", "bpe_merges", "holt_forecast",
        "pmi_collocations", "harmonic_centrality", "mmr_rerank",
        "sq_topk", "effective_diameter", "dataset_fingerprint",
        "doc_bpe", "clustering_coeff", "zipf_fit", "prf_bm25",
        "stickiness", "theil_sen", "spearman", "mannwhitney",
        "assortativity",
    }
    assert set(head[25:45]) == r9_seated
    reseats = {
        "knn_and_filter", "layout_routed_knn", "distance_join_self",
        "range_filter", "tpch_q1",
    }
    assert set(head[45:]) == reseats
