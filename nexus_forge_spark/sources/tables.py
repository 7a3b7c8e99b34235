"""Parquet table sources.

The reference reads records from JSON files / dicts / HTTP stores
(kgforge/core/archetypes/mapper.py:44-62, specializations/stores/*).  Here
every source is a columnar table scan: `spark.read.parquet` gives Catalyst
predicate pushdown + column pruning for free — the filters the reference
compiled into SPARQL/ES text (sparql_query_builder.py:94-186) reach the
parquet reader as PushedFilters instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    # Pin the session timezone on WHATEVER session runs the query.  Calendar
    # functions (month/date_trunc/to_date) over TIMESTAMP columns are
    # timezone-dependent in Spark but timezone-free in the DuckDB oracle; a
    # non-UTC driver session shifts every midnight timestamp a day and moves
    # first-of-period rows across group boundaries (row counts survive, values
    # don't).  Our own get_spark pins UTC (session.py), but contract queries
    # run on the caller's session — pin it here, the one chokepoint every
    # query passes through.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or TPCH_TABLES)}
