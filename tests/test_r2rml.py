from __future__ import annotations

import duckdb
import pytest

from nexus_forge_spark.operators.r2rml import (
    MappingError,
    compile_triples_maps,
    sql_compile_triples_maps,
)

NATIONS = [(1, "FR", 10), (2, "DE", 10), (3, "JP", 20)]
PEOPLE = [(100, "ann", 1), (101, "bob", 3)]

MAPS = {
    "people": {
        "table": "people",
        "subject": "p:{pid}",
        "types": ["ex:Person"],
        "pom": [
            {"pred": "ex:name", "column": "name"},
            {"pred": "ex:tag", "template": "t:{name}:{pid}"},
            {"pred": "ex:kind", "constant": "ex:Human"},
            {"pred": "ex:nation", "parent": "nations", "join": [["nat", "nid"]]},
        ],
    },
    "nations": {
        "table": "nations",
        "subject": "n:{nname}",
        "pom": [{"pred": "ex:zone", "template": "z:{zone}"}],
    },
}


def _load(spark):
    tables = {
        "nations": spark.createDataFrame(NATIONS, "nid long, nname string, zone long"),
        "people": spark.createDataFrame(PEOPLE, "pid long, name string, nat long"),
    }
    return lambda t: tables[t]


def test_r2rml_compiles_all_map_kinds(spark):
    out = {
        (r.subj, r.pred, r.obj)
        for r in compile_triples_maps(spark, MAPS, _load(spark)).collect()
    }
    assert ("p:100", "rdf:type", "ex:Person") in out
    assert ("p:100", "ex:name", "ann") in out
    assert ("p:101", "ex:tag", "t:bob:101") in out
    assert ("p:100", "ex:kind", "ex:Human") in out
    assert ("p:100", "ex:nation", "n:FR") in out  # parent join
    assert ("p:101", "ex:nation", "n:JP") in out
    assert ("n:FR", "ex:zone", "z:10") in out
    # 2 people x 5 maps + 3 nations x 1 map
    assert len(out) == 13


def test_r2rml_oracle_differential(spark):
    got = sorted(
        tuple(r) for r in compile_triples_maps(spark, MAPS, _load(spark)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nations AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, '{b}', {c})" for a, b, c in NATIONS)
        + ") t(nid, nname, zone)"
    )
    con.execute(
        "CREATE TABLE people AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, '{b}', {c})" for a, b, c in PEOPLE)
        + ") t(pid, name, nat)"
    )
    want = sorted(tuple(r) for r in con.execute(sql_compile_triples_maps(MAPS)).fetchall())
    assert got == want


def test_r2rml_errors(spark):
    load = _load(spark)
    with pytest.raises(MappingError, match="not defined"):
        compile_triples_maps(
            spark,
            {
                "p": {
                    "table": "people",
                    "subject": "p:{pid}",
                    "pom": [{"pred": "x", "parent": "ghost", "join": [["nat", "nid"]]}],
                }
            },
            load,
        )
    with pytest.raises(MappingError, match="needs column"):
        compile_triples_maps(
            spark,
            {"p": {"table": "people", "subject": "p:{pid}", "pom": [{"pred": "x"}]}},
            load,
        )


def test_r2rml_scan_is_column_pruned(spark, sf_dir):
    # the compiled plan's parquet scan must read ONLY the referenced
    # columns (subject template + pom column), never the full row
    maps = {
        "c": {
            "table": "customer",
            "subject": "cust:{c_custkey}",
            "pom": [{"pred": "ex:name", "column": "c_name"}],
        }
    }
    load = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    df = compile_triples_maps(spark, maps, load)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "c_custkey" in plan and "c_name" in plan
    assert "c_acctbal" not in plan and "c_mktsegment" not in plan
