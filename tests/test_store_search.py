"""Store CRUD/versioning semantics (demo_store.feature behavioral contract)
and the Filter DSL."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nexus_forge_spark.operators.search import apply_filters, paths
from nexus_forge_spark.store import ParquetStore


@pytest.fixture()
def store(spark):
    d = tempfile.mkdtemp()
    yield ParquetStore(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def _people(spark, rows):
    return spark.createDataFrame(rows, "id string, name string, age long")


def test_register_and_conflict(spark, store):
    r1 = store.register(_people(spark, [("p1", "Jane", 40), ("p2", "John", 30)]))
    assert r1 == {"action": "register", "succeeded": 2, "failed": 0}
    # re-register p1 -> per-row conflict, p3 succeeds
    r2 = store.register(_people(spark, [("p1", "Dup", 1), ("p3", "Ada", 36)]))
    assert r2["succeeded"] == 1 and r2["failed"] == 1
    cur = {r.id: r for r in store.retrieve().collect()}
    assert set(cur) == {"p1", "p2", "p3"}
    assert cur["p1"].name == "Jane"  # conflict did not overwrite
    assert cur["p1"]._rev == 1


def test_update_bumps_rev_and_time_travel(spark, store):
    store.register(_people(spark, [("p1", "Jane", 40)]))
    v1 = store.current_version()
    r = store.update(_people(spark, [("p1", "Jane Doe", 41), ("missing", "X", 0)]))
    assert r["succeeded"] == 1 and r["failed"] == 1
    now = store.retrieve("p1").collect()[0]
    assert now.name == "Jane Doe" and now._rev == 2
    # time travel to the pre-update snapshot
    old = store.retrieve("p1", version=v1).collect()[0]
    assert old.name == "Jane" and old._rev == 1


def test_deprecate_and_search_excludes(spark, store):
    store.register(_people(spark, [("p1", "Jane", 40), ("p2", "John", 30)]))
    r = store.deprecate(["p2"])
    assert r["succeeded"] == 1
    ids = {x.id for x in store.search().collect()}
    assert ids == {"p1"}
    ids_all = {x.id for x in store.search(deprecated=True).collect()}
    assert ids_all == {"p1", "p2"}
    p2 = store.retrieve("p2").collect()[0]
    assert p2._deprecated is True and p2._rev == 2


def test_tag_retrieval(spark, store):
    store.register(_people(spark, [("p1", "Jane", 40)]))
    store.tag("initial")
    store.update(_people(spark, [("p1", "Jane II", 41)]))
    tagged = store.retrieve("p1", tag="initial").collect()[0]
    assert tagged.name == "Jane" and tagged._rev == 1


def test_freeze_rewrites_ids(spark, store):
    store.register(_people(spark, [("p1", "Jane", 40)]))
    store.update(_people(spark, [("p1", "Jane", 41)]))
    refs = spark.createDataFrame([("p1",), ("unknown",)], "id string")
    out = {r.id for r in store.freeze(refs).collect()}
    assert out == {"p1?_version=2", "unknown"}


def test_filter_dsl(spark):
    df = spark.createDataFrame(
        [("b1", "Building", 40.5, 3.2), ("b2", "Building", 39.0, 5.5), ("p1", "Person", 0.0, 0.0)],
        "id string, type string, latitude double, longitude double",
    )
    p = paths()
    out = apply_filters(df, p.type == "Building", p.latitude > 40)
    assert [r.id for r in out.collect()] == ["b1"]
    # dict sugar + ne + limit/offset
    out2 = apply_filters(df, {"type": "Building"}, p.id != "b1")
    assert [r.id for r in out2.collect()] == ["b2"]
    assert apply_filters(df, limit=2).count() == 2
    assert apply_filters(df, limit=None, offset=1).count() == 2


def test_filter_dsl_nested_paths(spark):
    df = spark.createDataFrame(
        [("b1", (40.5, 3.2)), ("b2", (39.0, 5.5))],
        "id string, geo struct<latitude:double, longitude:double>",
    )
    p = paths()
    out = apply_filters(df, p.geo.latitude > 40)
    assert [r.id for r in out.collect()] == ["b1"]
