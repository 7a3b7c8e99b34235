"""Validation parity vs the reference's SHACL test matrix
(tests/specializations/models/test_rdf_model.py:79-174, shapes fixtures
tests/data/shacl-model/commons/shapes-{1,2,3}.json)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from nexus_forge_spark.operators.validate import (
    ShapeCompiler,
    load_shapes,
    load_subclass_closure,
)

COMMONS = "/root/reference/tests/data/shacl-model/commons"


@pytest.fixture(scope="module")
def compiler():
    shapes = load_shapes(sorted(glob.glob(f"{COMMONS}/shapes-*.json")))
    closure = load_subclass_closure(f"{COMMONS}/schemaorg-v26.0.json")
    return ShapeCompiler(shapes, closure)


def test_shapes_loaded(compiler):
    assert "Person" in compiler.shapes
    assert "Activity" in compiler.shapes
    assert compiler.shapes["Activity"].target_class == "Activity"
    assert "Person" in compiler.subclass_of.get("Patient", set())


ACT_SCHEMA = (
    "id string, type string, generated struct<type:string>, status string"
)


def test_valid_activity(spark, compiler):
    # valid_activity_resource: id + generated Entity + status completed
    df = spark.createDataFrame(
        [("http://testing/123", "Activity", ("Entity",), "completed")], ACT_SCHEMA
    )
    row = compiler.validate(df, "Activity").collect()[0]
    assert row.validated, row.violations


def test_invalid_activity_missing_id(spark, compiler):
    # invalid_activity_resource: missing id -> nodeKind IRI violation
    df = spark.createDataFrame(
        [(None, "Activity", ("Entity",), "completed")], ACT_SCHEMA
    )
    row = compiler.validate(df, "Activity").collect()[0]
    assert not row.validated
    assert any("nodeKind" in v for v in row.violations)


def test_activity_wrong_status_and_missing_generated(spark, compiler):
    df = spark.createDataFrame(
        [("http://t/1", "Activity", None, "in-progress")], ACT_SCHEMA
    )
    row = compiler.validate(df, "Activity").collect()[0]
    assert not row.validated
    assert any("hasValue" in v for v in row.violations)
    assert any("generated" in v for v in row.violations)


PATIENT_SCHEMA = (
    "id string, type string, familyName string, givenName string,"
    "gender string, birthDate string"
)
PATIENT_ROW = ("https://testing/1234", "Patient", "Doe", "John", "male", "2004-04-12T13:20:15.5")


@pytest.mark.parametrize(
    "inference, validated",
    [("rdfs", True), (None, False), ("none", False)],
)
def test_patient_as_person_inference_matrix(spark, compiler, inference, validated):
    # test_rdf_model.py:130-158: Patient passes Person only with rdfs
    inf = None if inference in (None, "none") else inference
    df = spark.createDataFrame([PATIENT_ROW], PATIENT_SCHEMA)
    row = compiler.validate(df, "Person", inference=inf).collect()[0]
    assert row.validated == validated, row.violations
    if not validated:
        assert any("focus" in v for v in row.violations)


def test_validate_many_mixed(spark, compiler):
    # test_validate_many: one valid + one invalid in the same frame
    df = spark.createDataFrame(
        [
            ("http://testing/123", "Activity", ("Entity",), "completed"),
            (None, "Activity", ("Entity",), "completed"),
        ],
        ACT_SCHEMA,
    )
    out = {r.id: r.validated for r in compiler.validate(df, "Activity").collect()}
    assert out["http://testing/123"] is True
    assert out[None] is False


def test_person_gender_in_and_datatype(spark, compiler):
    person_schema = (
        "id string, type string, familyName string, givenName string,"
        "gender string, birthDate string"
    )
    rows = [
        ("http://p/1", "Person", "Doe", "Jane", "female", "2000-01-01"),
        ("http://p/2", "Person", "Doe", "Jon", "other", "2000-01-01"),
        ("http://p/3", "Person", None, "NoFam", "male", "2000-01-01"),
    ]
    df = spark.createDataFrame(rows, person_schema)
    out = {r.id: r for r in compiler.validate(df, "Person").collect()}
    assert out["http://p/1"].validated, out["http://p/1"].violations
    assert not out["http://p/2"].validated  # gender not in (female, male)
    assert not out["http://p/3"].validated  # familyName minCount 1


def test_building_mandatory(spark, compiler):
    if "Building" not in compiler.shapes:
        pytest.skip("no Building shape in fixtures")
    schema = (
        "id string, type string, description string, name string,"
        "geo struct<latitude:double,longitude:double>"
    )
    df = spark.createDataFrame(
        [
            ("http://b/1", "Building", "HQ", "Main", (1.0, 2.0)),
            ("http://b/2", "Building", None, "Main", (1.0, 2.0)),
        ],
        schema,
    )
    out = {r.id: r.validated for r in compiler.validate(df, "Building").collect()}
    assert out["http://b/1"] is True
    assert out["http://b/2"] is False  # description mandatory
