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


def test_round6_debuts_lead_the_window():
    """Newest-first: round-6 debuts, then the 15 promotions (round-5
    registrations that went straight to extra_queries() without driver
    rows), then the round-5 debuts still earning their 3 greens (dict
    order IS the driver's check order)."""
    head = list(entrymod.queries())[:50]
    assert head == [
        "events_ewma",
        "cov_matrix",
        "validate_events",
        "corr_matrix",
        "sorted_neighborhood",
        "quantile_bin",
        "table_diff",
        "events_gapfill",
        "leakage_split",
        "semantic_dedup",
        "kmeans_embeddings",
        "quantile_events",
        "quantile_merged",
        "cm_heavy",
        "winsorize_events",
        "token_cooc",
        "tpch_q4",
        "tpch_q7",
        "tpch_q10",
        "tpch_q13",
        "tpch_q14",
        "tpch_q15",
        "tpch_q17",
        "tpch_q19",
        "tpch_q22",
        "global_order",
        "scrub_ngrams",
        "events_json",
        "events_histogram",
        "heavy_tokens",
        "table_profile",
        "hll_orders",
        "hll_merged",
        "theta_parts",
        "pagerank",
        "triangles",
        "weighted_sample",
        "bloom_join",
        "pii_redact",
        "paragraph_dedup",
        "mixture_sample",
        "tpch_q18",
        "lm_score",
        "inverted_index",
        "dedup_resolve",
        "box_box_join",
        "segment_circle_join",
        "knn_join_highd",
        "doc_chunk",
        "dup_ngrams",
    ]
