"""Integer-exact distributed k-means vs a pure-numpy reference."""

from __future__ import annotations

import math
import random

import numpy as np

from nexus_forge_spark.operators.clustering import (
    KMEANS_SCALE,
    KMEANS_SHIFT,
    assign_clusters,
    kmeans_train,
    quantize_vectors,
)


def ref_quantize(vecs):
    return [
        [math.floor((float(x) + KMEANS_SHIFT) * KMEANS_SCALE) for x in v]
        for v in vecs
    ]


def ref_kmeans(q, k, iters):
    """Same rules: init = first k rows (by id order), int squared-L2,
    ties -> lowest cid, truncated positive mean, empty keeps centroid."""
    cents = [list(q[i]) for i in range(k)]
    for _ in range(iters):
        groups: dict[int, list[int]] = {}
        for i, v in enumerate(q):
            d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
            cid = d.index(min(d))
            groups.setdefault(cid, []).append(i)
        for cid, members in groups.items():
            n = len(members)
            cents[cid] = [
                sum(q[i][j] for i in members) // n for j in range(len(q[0]))
            ]
    assign = []
    for i, v in enumerate(q):
        d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        cid = d.index(min(d))
        assign.append((i, cid, d[cid]))
    return cents, assign


def _pts(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    return quantize_vectors(df)


def test_quantization_matches_python_floor(spark):
    vecs = [[0.05424950644373894, -0.2524777352809906, 0.0]]
    got = _pts(spark, vecs).collect()[0]["qv"]
    assert list(got) == ref_quantize(vecs)[0]


def test_kmeans_matches_reference_randomized(spark):
    rng = random.Random(5)
    for trial in range(2):
        vecs = [
            [rng.uniform(-0.3, 0.3) for _ in range(6)] for _ in range(30)
        ]
        q = ref_quantize(vecs)
        want_c, want_a = ref_kmeans(q, k=3, iters=3)
        got_c, got_adf = kmeans_train(_pts(spark, vecs), k=3, iters=3)
        assert got_c == want_c, f"trial {trial}"
        got_a = sorted(
            (r["vid"], r["cid"], r["dist"]) for r in got_adf.collect()
        )
        assert got_a == want_a, f"trial {trial}"


def test_ties_break_to_lowest_cid(spark):
    # two identical centroids: every point equidistant -> cid 0 wins
    vecs = [[0.1, 0.1], [0.1, 0.1], [0.2, 0.0]]
    pts = _pts(spark, vecs)
    q = ref_quantize(vecs)
    out = assign_clusters(pts, [q[0], q[0]]).collect()
    assert all(r["cid"] == 0 for r in out)


def test_empty_cluster_keeps_centroid(spark):
    # all points identical: after iter 1 only cluster 0 has members;
    # clusters 1.. keep their initial centroids verbatim
    vecs = [[0.1, 0.2]] * 5
    q = ref_quantize(vecs)
    cents, final = kmeans_train(_pts(spark, vecs), k=2, iters=2)
    assert cents[0] == q[0] and cents[1] == q[1] == q[0]
    assert {r["cid"] for r in final.collect()} == {0}


def test_assignment_is_arrow_batched_not_per_row(spark):
    pts = _pts(spark, [[0.1, 0.2], [0.0, 0.3]])
    plan = (
        assign_clusters(pts, [[2100, 2200], [2000, 2300]])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan
