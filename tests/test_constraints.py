from __future__ import annotations

import duckdb

from nexus_forge_spark.operators.ontology import (
    disjoint_violations,
    functional_violations,
    sql_disjoint_violations,
    sql_functional_violations,
)


def _sql_rows(rows, cols):
    return " UNION ALL ".join(
        "SELECT " + ", ".join(f"'{v}' AS {c}" for v, c in zip(r, cols)) for r in rows
    )


def test_functional_violations_basic(spark):
    trips = [
        ("e1", "birth_place", "paris"),
        ("e1", "birth_place", "lyon"),
        ("e1", "birth_place", "paris"),  # duplicate assertion counts once
        ("e2", "birth_place", "rome"),
        ("e1", "knows", "e2"),
        ("e1", "knows", "e3"),  # not declared functional -> ignored
    ]
    df = spark.createDataFrame(trips, "subj string, pred string, obj string")
    out = functional_violations(df, ["birth_place"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.pred, r.n_values) == ("e1", "birth_place", 2)
    assert r.values == "lyon|paris"


def test_functional_violations_oracle(spark):
    trips = [
        ("e1", "p", "a"),
        ("e1", "p", "b"),
        ("e1", "p", "c"),
        ("e2", "p", "a"),
        ("e3", "q", "a"),
        ("e3", "q", "b"),
    ]
    df = spark.createDataFrame(trips, "subj string, pred string, obj string")
    got = {tuple(r) for r in functional_violations(df, ["p", "q"]).collect()}
    want = {
        tuple(r)
        for r in duckdb.connect()
        .execute(
            sql_functional_violations(
                _sql_rows(trips, ["subj", "pred", "obj"]), ["p", "q"]
            )
        )
        .fetchall()
    }
    assert got == want


def _hierarchy():
    # cat ⊑ mammal ⊑ animal; rock ⊑ mineral; disjoint(animal, mineral)
    edges = [("cat", "mammal"), ("mammal", "animal"), ("rock", "mineral")]
    types = [
        ("tom", "cat"),          # entails animal
        ("pebble", "rock"),      # entails mineral
        ("golem", "cat"),
        ("golem", "rock"),       # entailed animal+mineral -> violation
        ("ghost", "animal"),     # direct, no second side
    ]
    disjoint = [("mineral", "animal")]  # unordered declaration
    return edges, types, disjoint


def test_disjoint_requires_entailment(spark):
    edges, types, disjoint = _hierarchy()
    e = spark.createDataFrame(edges, "child string, parent string")
    t = spark.createDataFrame(types, "instance string, cls string")
    d = spark.createDataFrame(disjoint, "a string, b string")
    out = disjoint_violations(t, e, d).collect()
    assert {(r.instance, r.cls_a, r.cls_b) for r in out} == {
        ("golem", "animal", "mineral")
    }


def test_disjoint_oracle(spark):
    edges, types, disjoint = _hierarchy()
    e = spark.createDataFrame(edges, "child string, parent string")
    t = spark.createDataFrame(types, "instance string, cls string")
    d = spark.createDataFrame(disjoint, "a string, b string")
    got = {tuple(r) for r in disjoint_violations(t, e, d).collect()}
    want = {
        tuple(r)
        for r in duckdb.connect()
        .execute(
            sql_disjoint_violations(
                _sql_rows(types, ["instance", "cls"]),
                _sql_rows(edges, ["child", "parent"]),
                _sql_rows(disjoint, ["a", "b"]),
            )
        )
        .fetchall()
    }
    assert got == want
