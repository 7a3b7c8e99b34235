"""Differential tests: alternating large-star/small-star connected
components vs min-label propagation (the O(diameter) oracle)."""

from __future__ import annotations

import random

import pytest

from nexus_forge_spark.operators import canonicalize as CC


def _labels(df):
    return {(r.entity_id, r.canonical_id) for r in df.collect()}


def _check(spark, edges_py, nodes_py):
    e = spark.createDataFrame(edges_py, "a string, b string")
    n = spark.createDataFrame([(x,) for x in nodes_py], "entity_id string")
    star = _labels(CC.connected_components(e, n))
    prop = _labels(CC.connected_components_propagation(e, n, max_iter=300))
    assert star == prop


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_star_matches_propagation_random(spark, seed):
    rnd = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [(rnd.choice(nodes), rnd.choice(nodes)) for _ in range(150)]
    _check(spark, edges, nodes)


def test_star_handles_long_path(spark):
    # diameter 199: propagation needs ~200 rounds, star converges in O(log n)
    nodes = [f"p{i:03d}" for i in range(200)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(199)]
    _check(spark, edges, nodes)


def test_star_self_loops_and_isolated(spark):
    _check(spark, [("x", "x"), ("y", "z")], ["x", "y", "z", "w"])
