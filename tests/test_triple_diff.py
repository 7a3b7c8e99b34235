"""triple_diff snapshot-delta semantics (kg_diff contract query)."""

from pyspark.sql import functions as F

from nexus_forge_spark.operators.triples import triple_diff


def _trips(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_diff_directions(spark):
    old = _trips(spark, [("s1", "p", "o1"), ("s2", "p", "o2")])
    new = _trips(spark, [("s2", "p", "o2"), ("s3", "p", "o3")])
    out = {(r.subj, r.obj): r.change for r in triple_diff(old, new).collect()}
    assert out == {("s1", "o1"): "removed", ("s3", "o3"): "added"}


def test_diff_set_semantics_duplicates_are_not_changes(spark):
    # duplicate rows within a snapshot collapse (rdflib.Graph is a set)
    old = _trips(spark, [("s", "p", "o"), ("s", "p", "o")])
    new = _trips(spark, [("s", "p", "o")])
    assert triple_diff(old, new).count() == 0


def test_diff_empty_sides(spark):
    old = _trips(spark, [])
    new = _trips(spark, [("s", "p", "o")])
    rows = triple_diff(old, new).collect()
    assert [(r.subj, r.change) for r in rows] == [("s", "added")]
    rows = triple_diff(new, old).collect()
    assert [(r.subj, r.change) for r in rows] == [("s", "removed")]


def test_diff_single_shuffle_plan(spark):
    """ONE exchange: union + hash aggregate, no join operators."""
    old = _trips(spark, [("s1", "p", "o1")])
    new = _trips(spark, [("s2", "p", "o2")])
    plan = triple_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
