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


def test_round7_debuts_lead_the_window():
    """Newest-first: the 6 round-7 debuts, then the 44-query backlog
    seated per the round-6 brief (dict order IS the driver's check
    order)."""
    head = list(entrymod.queries())[:50]
    assert head[:6] == [
        "geo_distance_join",
        "geo_knn_join",
        "scd2_build",
        "tpch_q8",
        "tpch_q12",
        "tpch_q21",
    ]
    backlog = {
        "pq_topk", "ivfpq_topk", "k_core", "hyperanf", "funnel",
        "cohort_retention", "volume_anomaly", "bm25", "label_prop",
        "k_hop", "skew_report", "phrase_search", "events_pivot",
        "attribution", "transition_matrix", "top_paths", "acf_events",
        "cusum_events", "ks_value", "welch_value", "mi_docs",
        "linreg_trend", "modularity", "build_vocab", "bigram_lm",
        "gini_prices", "benford_prices", "linkage",
        "quantile_bin_grouped", "personalized_pagerank",
        "rfm_segments", "rank_normalize", "chisq_events",
        "rollup_incremental", "theta_active", "hybrid_retrieval",
        "edit_dist", "basket_rules", "adamic_adar", "forecast_events",
        "robust_z", "psi_drift", "shortest_paths", "hits",
    }
    assert set(head[6:]) == backlog
