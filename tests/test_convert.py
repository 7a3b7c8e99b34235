"""Conversion parity: struct->triples explosion, reassembly round-trip,
flatten/deflatten (golden shapes from tests/core/conversions/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_forge_spark.operators.convert import (
    apply_ld_keys,
    deflatten,
    expand_term,
    flatten,
    struct_to_triples,
    triples_to_resources,
)

CONTEXT = {
    "schema": "https://schema.org/",
    "name": "https://schema.org/name",
    "Person": "https://schema.org/Person",
}


def _person_df(spark):
    return spark.createDataFrame(
        [
            (
                "http://p/1",
                "Person",
                "Jane",
                ("PostalAddress", "Main st 1", 10115),
                ["a@x.org", "b@x.org"],
            )
        ],
        "id string, type string, name string,"
        "address struct<type:string, streetAddress:string, postalCode:long>,"
        "email array<string>",
    )


def test_struct_to_triples(spark):
    t = struct_to_triples(_person_df(spark))
    rows = {(r.subj, r.pred, r.obj) for r in t.collect()}
    assert ("http://p/1", "rdf:type", "Person") in rows
    assert ("http://p/1", "name", "Jane") in rows
    # nested struct -> deterministic skolem subject + nested triples
    addr_edges = [r for r in t.collect() if r.pred == "address"]
    assert len(addr_edges) == 1 and addr_edges[0].obj.startswith("_:")
    skolem = addr_edges[0].obj
    assert (skolem, "streetAddress", "Main st 1") in rows
    assert (skolem, "rdf:type", "PostalAddress") in rows
    # arrays -> one triple per element, typed literals
    emails = sorted(r.obj for r in t.collect() if r.pred == "email")
    assert emails == ["a@x.org", "b@x.org"]
    lits = {r.pred: (r.obj_is_literal, r.obj_datatype) for r in t.collect()}
    assert lits["name"] == (True, "xsd:string")
    assert lits["address"][0] is False


def test_struct_to_triples_deterministic_skolem(spark):
    a = {(r.subj, r.pred, r.obj) for r in struct_to_triples(_person_df(spark)).collect()}
    b = {(r.subj, r.pred, r.obj) for r in struct_to_triples(_person_df(spark)).collect()}
    assert a == b


def test_struct_to_triples_context_expansion(spark):
    t = struct_to_triples(_person_df(spark), context=CONTEXT)
    preds = {r.pred for r in t.collect()}
    assert "https://schema.org/name" in preds
    types = {r.obj for r in t.collect() if r.pred == "rdf:type"}
    assert "https://schema.org/Person" in types  # type IRIs expand via context


def test_nested_id_preferred_over_skolem(spark):
    df = spark.createDataFrame(
        [("http://p/1", ("http://org/9", "Acme"))],
        "id string, worksFor struct<id:string, name:string>",
    )
    rows = {(r.subj, r.pred, r.obj) for r in struct_to_triples(df).collect()}
    assert ("http://p/1", "worksFor", "http://org/9") in rows
    assert ("http://org/9", "name", "Acme") in rows


def test_array_of_structs(spark):
    df = spark.createDataFrame(
        [("d1", [("Derivation", "e1"), ("Derivation", "e2")])],
        "id string, derivation array<struct<type:string, entity:string>>",
    )
    rows = {(r.subj, r.pred, r.obj) for r in struct_to_triples(df).collect()}
    edges = [o for s, p, o in rows if p == "derivation"]
    assert len(edges) == 2 and all(o.startswith("_:") for o in edges)
    assert sum(1 for s, p, o in rows if p == "entity") == 2


def test_triples_roundtrip_reassembly(spark):
    t = struct_to_triples(_person_df(spark))
    res = triples_to_resources(t)
    rows = {r.subj: r for r in res.collect()}
    assert rows["http://p/1"].types == ["Person"]
    assert rows["http://p/1"].properties["name"] == ["Jane"]
    assert sorted(rows["http://p/1"].properties["email"]) == ["a@x.org", "b@x.org"]


def test_flatten_deflatten_roundtrip(spark):
    df = _person_df(spark).drop("email")
    flat = flatten(df)
    assert flat.columns == [
        "id", "type", "name",
        "address.type", "address.streetAddress", "address.postalCode",
    ]
    back = deflatten(flat)
    assert back.schema.simpleString() == df.schema.simpleString()  # mod nullability
    assert back.collect() == df.collect()


def test_deflatten_mixed_nesting_error(spark):
    df = spark.createDataFrame([(1, 2)], "`a` long, `a.b` long")
    with pytest.raises(ValueError):
        deflatten(df)


def test_ld_keys(spark):
    df = _person_df(spark).select("id", "type", "name")
    ld = apply_ld_keys(df, "add")
    assert ld.columns == ["@id", "@type", "name"]
    assert apply_ld_keys(ld, "remove").columns == ["id", "type", "name"]


def test_expand_term():
    assert expand_term("name", CONTEXT) == "https://schema.org/name"
    assert expand_term("schema:givenName", CONTEXT) == "https://schema.org/givenName"
    assert expand_term("unknown", CONTEXT) == "unknown"
