"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline on sf0.001;
``queries``/``oracle_sql`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-checkable oracle (see
nexus_forge_spark/plans/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved-span documents -> mentions -> exact+fuzzy
    resolve -> deduplicated (subj, pred, obj) triples."""
    from nexus_forge_spark.plans import pipeline
    from nexus_forge_spark.sources import flat_to_interleaved, load_table

    docs = flat_to_interleaved(load_table(spark, "documents", "/root/testdata/sf0.001"))
    return pipeline.construct_kg(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nexus_forge_spark.plans.driver_queries import QUERIES

    return {name: fns[0] for name, fns in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from nexus_forge_spark.plans.driver_queries import QUERIES

    return {name: fns[1]() for name, fns in QUERIES.items() if fns[1] is not None}
