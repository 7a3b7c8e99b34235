"""Dataset PROV helpers vs the reference's _set/_add_prov_property model.

Differential: refsem's pure-dict restatement of
specializations/resources/datasets.py:27-205 is the EXPECTED side; the
set-oriented Spark operators (operators/datasets.py) are the ACTUAL side,
compared as flattened (path, value) fact sets per dataset row."""

import pytest
from pyspark.sql import functions as F

from nexus_forge_spark import refsem
from nexus_forge_spark.operators import datasets as D


def _row_to_facts(row) -> set:
    out: set = set()
    refsem.flatten("d", _clean(row.asDict(recursive=True)), "", out)
    return out


def _clean(v):
    """Drop None leaves so absent != null distinctions vanish (Spark structs
    carry every declared field; the reference dicts omit absent keys)."""
    if isinstance(v, dict):
        return {k: _clean(s) for k, s in v.items() if s is not None}
    if isinstance(v, list):
        return [_clean(s) for s in v]
    return v


def _expected_facts(d: dict) -> set:
    out: set = set()
    refsem.flatten("d", d, "", out)
    return out


AGENT = {"id": "agents/jdoe", "type": "Person", "_rev": 3}
ACTIVITY = {"id": "activities/run-42", "type": "Activity", "_rev": 1}
ENTITY = {"id": "entities/src", "type": "Entity", "name": "source corpus", "_rev": 7}


@pytest.fixture()
def one_dataset(spark):
    return spark.createDataFrame(
        [("ds-1", "Dataset", "k1")], "id string, type string, k string"
    )


def _agent_df(spark, rec, extra_name=False):
    cols = "id string, type string, _rev int" + (", name string" if extra_name else "")
    vals = [tuple(rec[c] for c in ("id", "type", "_rev")) + ((rec.get("name"),) if extra_name else ())]
    return spark.createDataFrame(vals, cols).withColumn("k", F.lit("k1"))


def test_contribution_versioned_reference(spark, one_dataset):
    actual = D.add_contribution(
        one_dataset, _agent_df(spark, AGENT), on=("k", "k"), versioned=True,
    ).drop("k").collect()[0]
    expected = {"id": "ds-1", "type": "Dataset"}
    refsem.ref_add_prov(expected, "contribution", AGENT, versioned=True)
    assert _row_to_facts(actual) == _expected_facts(expected)
    # versioned id materialized
    assert actual["contribution"]["agent"]["id"] == "agents/jdoe?_version=3"


def test_generation_and_invalidation_str_reference(one_dataset):
    out = D.add_generation(one_dataset, "activities/gen", versioned=False)
    out = D.add_invalidation(out, "activities/kill", versioned=False)
    actual = out.drop("k").collect()[0]
    expected = {"id": "ds-1", "type": "Dataset"}
    refsem.ref_add_prov(expected, "generation", "activities/gen", versioned=False)
    refsem.ref_add_prov(expected, "invalidation", "activities/kill", versioned=False)
    assert _row_to_facts(actual) == _expected_facts(expected)


def test_str_reference_with_versioned_raises(one_dataset):
    with pytest.raises(ValueError):
        D.add_contribution(one_dataset, "agents/x", versioned=True)
    with pytest.raises(ValueError):
        refsem.ref_add_prov({}, "contribution", "agents/x", versioned=True)


def test_derivation_keeps_name(spark, one_dataset):
    ent = _agent_df(spark, ENTITY, extra_name=True)
    actual = D.add_derivation(
        one_dataset, ent, on=("k", "k"), versioned=True
    ).drop("k").collect()[0]
    expected = {"id": "ds-1", "type": "Dataset"}
    refsem.ref_add_prov(expected, "derivation", ENTITY, versioned=True)
    assert _row_to_facts(actual) == _expected_facts(expected)
    assert actual["derivation"]["entity"]["name"] == "source corpus"


def test_set_promotes_scalar_to_list(spark, one_dataset):
    """Second add_contribution appends — scalar promotes to [old, new]
    (_set, datasets.py:198-203)."""
    a1 = _agent_df(spark, AGENT)
    a2 = _agent_df(spark, {"id": "agents/other", "type": "Person", "_rev": 9})
    out = D.add_contribution(one_dataset, a1, on=("k", "k"))
    out = D.add_contribution(out, a2, on=("k", "k"))
    actual = out.drop("k").collect()[0]
    expected = {"id": "ds-1", "type": "Dataset"}
    refsem.ref_add_prov(expected, "contribution", AGENT)
    refsem.ref_add_prov(
        expected, "contribution", {"id": "agents/other", "type": "Person", "_rev": 9}
    )
    assert _row_to_facts(actual) == _expected_facts(expected)
    assert len(actual["contribution"]) == 2


def test_missing_rev_versioned_raises(spark, one_dataset):
    agent = spark.createDataFrame(
        [("agents/x", "Person", "k1")], "id string, type string, k string"
    )
    with pytest.raises(ValueError, match="revision"):
        D.add_contribution(one_dataset, agent, on=("k", "k"), versioned=True)


def test_add_parts_collects_per_dataset(spark, one_dataset):
    parts = spark.createDataFrame(
        [
            ("p1", "File", "part one", 2, ("http://files/p1",), "k1"),
            ("p2", "File", "part two", 5, ("http://files/p2",), "k1"),
        ],
        "id string, type string, name string, _rev int, "
        "distribution struct<contentUrl:string>, k string",
    )
    actual = D.add_parts(one_dataset, parts, on=("k", "k")).drop("k").collect()[0]
    expected = {"id": "ds-1", "type": "Dataset"}
    refsem.ref_add_parts(
        expected,
        [
            {"id": "p1", "type": "File", "name": "part one", "_rev": 2,
             "distribution": {"contentUrl": "http://files/p1"}},
            {"id": "p2", "type": "File", "name": "part two", "_rev": 5,
             "distribution": {"contentUrl": "http://files/p2"}},
        ],
    )
    # array order from collect_list is nondeterministic across partitions;
    # fact-set comparison must not depend on it -> sort both sides by id
    facts_a = {f for f in _row_to_facts(actual)}
    facts_e = _expected_facts(expected)
    strip = lambda s: {(c, p.replace("[0]", "[]").replace("[1]", "[]"), v) for c, p, v in s}
    assert strip(facts_a) == strip(facts_e)


def test_distribution_and_files(spark, one_dataset):
    out = D.add_distribution(one_dataset, "http://files/all.zip", "application/zip")
    out = D.add_files(out, F.concat(F.lit("dir/"), F.col("id")), "text/plain")
    actual = out.drop("k").collect()[0]
    assert actual["distribution"]["contentUrl"] == "http://files/all.zip"
    assert actual["distribution"]["encodingFormat"] == "application/zip"
    assert actual["hasPart"]["distribution"]["contentUrl"] == "dir/ds-1"
    urls = D.download_refs(out, "distribution.contentUrl", keep=["id"]).collect()[0]
    assert urls["values"] == ["http://files/all.zip"]
