"""Source helpers.

The reference inherits every Spark 2.1 format and adds no connectors
(ref: SimbaSession.scala:40-41); likewise we pass through
``spark.read.*``. This module adds only convenience loaders for the
driver's test tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for SQL-mode queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
