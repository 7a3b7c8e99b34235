"""Nested JSON-LD expand/compact (C2/C5) vs the reference's fixture forms.

The expected documents reproduce the shapes the reference's own conversion
tests assert (tests/conftest.py:280-409 building_jsonld: expanded keys are
full IRIs, literals wrap as [{"@value": v}] with the term's declared
datatype, @id-typed values wrap as [{"@id": iri}]; compacted keeps plain
keys with @id/@type; _remove_ld_keys resolves @id against the context and
shrinks @id-typed term values — rdf.py:199-272, 489-527)."""

import json

from pyspark.sql import functions as F

from nexus_forge_spark.operators.convert import (
    apply_ld_keys,
    as_jsonld_expanded,
    expand_iri,
    resolve_iri_col,
    shrink_iri_col,
)

BUILDING_CONTEXT = {
    "@context": {
        "@base": "http://example.org/",
        "schema": "http://schema.org/",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
        "Building": "schema:Building",
        "name": "schema:name",
        "description": "schema:description",
        "image": {"@id": "schema:image", "@type": "@id"},
        "geo": "schema:geo",
        "latitude": {"@id": "schema:latitude", "@type": "xsd:float"},
    }
}

BUILDING = {
    "type": "Building",
    "name": "The Empire State Building",
    "description": "The Empire State Building is a 102-story landmark in New York City.",
    "image": "http://www.civil.usherbrooke.ca/cours/gci215a/empire-state-building.jpg",
    "geo": {"latitude": "40.75"},
}


def test_expand_iri_chases_terms():
    assert expand_iri("Building", BUILDING_CONTEXT) == "http://schema.org/Building"
    assert expand_iri("latitude", BUILDING_CONTEXT) == "http://schema.org/latitude"
    assert expand_iri("xsd:float", BUILDING_CONTEXT) == (
        "http://www.w3.org/2001/XMLSchema#float"
    )


def test_expanded_form_matches_reference_fixture(spark):
    df = spark.createDataFrame(
        [BUILDING],
        schema="type string, name string, description string, image string, "
        "geo struct<latitude:string>",
    )
    out = json.loads(
        as_jsonld_expanded(df, BUILDING_CONTEXT).collect()[0]["jsonld"]
    )
    expected = {
        "@type": ["http://schema.org/Building"],
        "http://schema.org/description": [{"@value": BUILDING["description"]}],
        "http://schema.org/geo": [
            {
                "http://schema.org/latitude": [
                    {
                        "@type": "http://www.w3.org/2001/XMLSchema#float",
                        "@value": "40.75",
                    }
                ]
            }
        ],
        "http://schema.org/image": [{"@id": BUILDING["image"]}],
        "http://schema.org/name": [{"@value": BUILDING["name"]}],
    }
    assert out == expected


def test_compacted_nested_roundtrip(spark):
    """Nested founder resource: @keys appear at BOTH levels; the round trip
    back through from_jsonld resolves ids against the context base."""
    ctx = {
        "@context": {
            "@base": "http://example.org/",
            "foaf": "http://xmlns.com/foaf/0.1/",
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "isDefinedBy": {"@id": "rdfs:isDefinedBy", "@type": "@id"},
        }
    }
    df = spark.createDataFrame(
        [
            (
                "org-1",
                "Organization",
                ("c51f4e4e", "Person", "Jami Booth"),
                "http://www.w3.org/2000/01/rdf-schema#something",
            )
        ],
        schema="id string, type string, "
        "founder struct<id:string,type:string,name:string>, isDefinedBy string",
    )
    ld = apply_ld_keys(df, "add", ctx)
    assert ld.columns == ["@id", "@type", "founder", "isDefinedBy"]
    assert ld.schema["founder"].dataType.names == ["@id", "@type", "name"]

    back = apply_ld_keys(ld, "remove", ctx).collect()[0]
    # @id values resolve against @base at both levels (rdf.py:470-487)
    assert back["id"] == "http://example.org/org-1"
    assert back["founder"]["id"] == "http://example.org/c51f4e4e"
    assert back["founder"]["name"] == "Jami Booth"
    # @id-typed term values shrink to curies (rdf.py:519-522)
    assert back["isDefinedBy"] == "rdfs:something"


def test_shrink_longest_prefix_wins(spark):
    ctx = {
        "@context": {
            "ex": "http://example.org/",
            "exv": "http://example.org/vocab/",
        }
    }
    df = spark.createDataFrame(
        [("http://example.org/vocab/X",), ("http://example.org/Y",)], "v string"
    )
    got = [r["c"] for r in df.select(shrink_iri_col(F.col("v"), ctx).alias("c")).collect()]
    assert got == ["exv:X", "ex:Y"]


def test_resolve_iri_passthrough_and_curie(spark):
    ctx = {"@context": {"@base": "http://b.org/", "s": "http://s.org/"}}
    df = spark.createDataFrame(
        [("http://abs.org/x",), ("s:local",), ("bare",)], "v string"
    )
    got = [
        r["c"] for r in df.select(resolve_iri_col(F.col("v"), ctx).alias("c")).collect()
    ]
    assert got == ["http://abs.org/x", "http://s.org/local", "http://b.org/bare"]


def test_expanded_array_values(spark):
    """Array-typed properties expand element-wise; multi-type rows expand
    every @type entry."""
    ctx = {
        "@context": {
            "schema": "http://schema.org/",
            "Person": "schema:Person",
            "Agent": "schema:Agent",
            "name": "schema:name",
            "keywords": "schema:keywords",
        }
    }
    df = spark.createDataFrame(
        [(["Person", "Agent"], "Jami", ["a", "b"])],
        schema="type array<string>, name string, keywords array<string>",
    )
    out = json.loads(as_jsonld_expanded(df, ctx).collect()[0]["jsonld"])
    assert out["@type"] == ["http://schema.org/Person", "http://schema.org/Agent"]
    assert out["http://schema.org/keywords"] == [{"@value": "a"}, {"@value": "b"}]
    assert out["http://schema.org/name"] == [{"@value": "Jami"}]


def test_expanded_list_container(spark):
    """{"@container": "@list"} keeps order via the [{"@list": [...]}] form
    (JSON-LD 1.1 §4.3.1 expanded list representation)."""
    ctx = {
        "@context": {
            "schema": "http://schema.org/",
            "steps": {"@id": "schema:steps", "@container": "@list"},
            "name": "schema:name",
        }
    }
    df = spark.createDataFrame(
        [(["boil", "stir", "serve"], "recipe")],
        schema="steps array<string>, name string",
    )
    out = json.loads(as_jsonld_expanded(df, ctx).collect()[0]["jsonld"])
    assert out["http://schema.org/steps"] == [
        {"@list": [{"@value": "boil"}, {"@value": "stir"}, {"@value": "serve"}]}
    ]
    # non-list arrays stay as plain value arrays
    assert out["http://schema.org/name"] == [{"@value": "recipe"}]


def test_expanded_language_tags(spark):
    """Term-level @language wins; context-root default applies to untagged
    string terms; term-level null cancels the default; typed literals and
    @id-typed terms never carry @language."""
    ctx = {
        "@context": {
            "@language": "en",
            "schema": "http://schema.org/",
            "xsd": "http://www.w3.org/2001/XMLSchema#",
            "label": {"@id": "schema:label", "@language": "fr"},
            "name": "schema:name",
            "code": {"@id": "schema:code", "@language": None},
            "born": {"@id": "schema:born", "@type": "xsd:date"},
            "ref": {"@id": "schema:ref", "@type": "@id"},
        }
    }
    df = spark.createDataFrame(
        [("bonjour", "hello", "X1", "2020-01-01", "http://e.org/r")],
        schema="label string, name string, code string, born string, ref string",
    )
    out = json.loads(as_jsonld_expanded(df, ctx).collect()[0]["jsonld"])
    assert out["http://schema.org/label"] == [
        {"@language": "fr", "@value": "bonjour"}
    ]
    assert out["http://schema.org/name"] == [
        {"@language": "en", "@value": "hello"}
    ]
    assert out["http://schema.org/code"] == [{"@value": "X1"}]
    assert out["http://schema.org/born"] == [
        {"@type": "http://www.w3.org/2001/XMLSchema#date", "@value": "2020-01-01"}
    ]
    assert out["http://schema.org/ref"] == [{"@id": "http://e.org/r"}]
