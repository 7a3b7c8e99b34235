"""Golden tests for the Iceberg production port of the versioned store
(store/iceberg_ddl.py): every ParquetStore method's DDL/DML is pinned
verbatim, and the statements Spark's grammar covers are run through the
actual SQL parser so an emitted syntax error fails here, not on the
cluster."""

from __future__ import annotations

import pytest

from nexus_forge_spark.store import iceberg_ddl as I

COLS = {"id": "STRING", "name": "STRING", "type": "STRING"}


def test_goldens():
    script = I.store_ddl_script("cat.db.resources", COLS)
    assert script["create"] == (
        "CREATE TABLE cat.db.resources (id STRING, name STRING, "
        "type STRING, _rev INT, _deprecated BOOLEAN)\nUSING iceberg"
    )
    assert script["register"] == (
        "MERGE INTO cat.db.resources t\n"
        "USING (SELECT *, 1 AS _rev, false AS _deprecated FROM batch) b\n"
        "ON t.id = b.id\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert script["update"] == (
        "MERGE INTO cat.db.resources t\n"
        "USING batch b\n"
        "ON t.id = b.id\n"
        "WHEN MATCHED THEN UPDATE SET t.name = b.name, t.type = b.type, "
        "t._rev = t._rev + 1"
    )
    assert script["deprecate"] == (
        "MERGE INTO cat.db.resources t\n"
        "USING batch b\n"
        "ON t.id = b.id AND NOT t._deprecated\n"
        "WHEN MATCHED THEN UPDATE SET t._deprecated = true, "
        "t._rev = t._rev + 1"
    )
    assert script["tag"] == (
        "ALTER TABLE cat.db.resources CREATE TAG `v1.0` AS OF VERSION 42"
    )
    assert script["retrieve"] == (
        "SELECT * FROM cat.db.resources VERSION AS OF 'v1.0' "
        "WHERE id = 'res-1' LIMIT 1"
    )
    assert script["compact"] == [
        "CALL spark_catalog.system.rewrite_data_files"
        "(table => 'cat.db.resources')",
        "CALL spark_catalog.system.rewrite_position_delete_files"
        "(table => 'cat.db.resources')",
    ]


def test_partitioned_create():
    ddl = I.create_table_ddl(
        "t", {"id": "STRING", "ts": "TIMESTAMP"}, partition_by=("days(ts)",)
    )
    assert ddl.endswith("USING iceberg\nPARTITIONED BY (days(ts))")


@pytest.mark.parametrize(
    "key", ["create", "register", "update", "deprecate", "retrieve"]
)
def test_statements_parse_in_spark_grammar(spark, key):
    """MERGE/CREATE/SELECT (incl. VERSION AS OF time travel) are all in
    Spark 4's grammar — parse, don't execute (no Iceberg catalog in the
    sandbox).  CREATE TAG and CALL are Iceberg parser extensions, golden
    only."""
    stmt = I.store_ddl_script("db.resources", COLS)[key]
    spark._jsparkSession.sessionState().sqlParser().parsePlan(stmt)
