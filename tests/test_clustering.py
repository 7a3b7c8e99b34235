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


def test_kcenter_greedy_trajectory_and_assignment(spark):
    """Hand-checkable greedy farthest-point run: selection order, strict
    '<' tie rule (earlier center keeps the point), exact integer dists."""
    from nexus_forge_spark.operators.clustering import kcenter_select

    pts = spark.createDataFrame(
        [(1, [0, 0]), (2, [1, 0]), (3, [10, 0]), (4, [11, 0]), (5, [20, 0])],
        "vid long, qv array<long>",
    )
    selected, assign = kcenter_select(pts, k=3, dim=2)
    # seed = lowest vid (1, at 0); farthest = 20 (vid 5); then 10 (vid 3):
    # min-dists to {0,20}: p2=1, p3=100, p4=81 -> argmax p3
    assert selected == [1, 5, 3]
    got = {r.vid: (r.center_vid, r.dist) for r in assign.collect()}
    assert got == {
        1: (1, 0),
        2: (1, 1),      # 1 vs 81 to center 3 -> stays with seed
        3: (3, 0),
        4: (3, 1),
        5: (5, 0),
    }


def test_kcenter_matches_pure_python_random(spark):
    """Randomized differential vs a literal python replay of the rule."""
    import random

    from nexus_forge_spark.operators.clustering import kcenter_select

    rng = random.Random(7)
    rows = [(i, [rng.randrange(0, 100) for _ in range(4)]) for i in range(60)]
    k = 5

    def replay():
        sel = [min(r[0] for r in rows)]
        byid = dict(rows)

        def sq(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        st = {i: (sq(v, byid[sel[0]]), sel[0]) for i, v in rows}
        for _ in range(k - 1):
            far = max(st.items(), key=lambda kv: (kv[1][0], -kv[0]))[0]
            sel.append(far)
            for i, v in rows:
                dn = sq(v, byid[far])
                if dn < st[i][0]:
                    st[i] = (dn, far)
        return sel, {i: (c, d) for i, (d, c) in st.items()}

    exp_sel, exp_assign = replay()
    df = spark.createDataFrame(rows, "vid long, qv array<long>")
    selected, assign = kcenter_select(df, k=k, dim=4)
    assert selected == exp_sel
    assert {r.vid: (r.center_vid, r.dist) for r in assign.collect()} == exp_assign


# --------------------------------------------------------------- DBSCAN


def test_dbscan_roles_star_and_noise(spark):
    from nexus_forge_spark.operators.clustering import dbscan_from_pairs

    # star: hub h adjacent to 3 leaves (min_pts=4 -> hub core, leaves
    # border); pair p1-p2 below density; isolated q never in pairs
    pairs = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3"), ("p1", "p2")],
        "a string, b string",
    )
    points = spark.createDataFrame(
        [("h",), ("l1",), ("l2",), ("l3",), ("p1",), ("p2",), ("q",)],
        "id string",
    )
    out = {r.id: (r.cluster, r.role)
           for r in dbscan_from_pairs(pairs, points, min_pts=4).collect()}
    assert out["h"] == ("h", "core")
    assert out["l1"] == ("h", "border")
    assert out["p1"] == (None, "noise") and out["q"] == (None, "noise")


def test_dbscan_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.clustering import (
        dbscan_from_pairs,
        sql_dbscan_from_pairs,
    )

    pairs = [(f"n{i % 12}", f"n{(i * 5 + 1) % 12}") for i in range(30)]
    points = [(f"n{i}",) for i in range(15)]
    pe = spark.createDataFrame(pairs, "a string, b string")
    po = spark.createDataFrame(points, "id string")
    got = sorted(tuple(r) for r in dbscan_from_pairs(pe, po, min_pts=3).collect())
    ev = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    pv = ", ".join(f"('{x}')" for (x,) in points)
    sql = sql_dbscan_from_pairs(
        f"SELECT * FROM (VALUES {ev}) AS t(a, b)",
        f"SELECT * FROM (VALUES {pv}) AS t(id)",
        min_pts=3,
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_dbscan_min_pts_validated(spark):
    import pytest

    from nexus_forge_spark.operators.clustering import dbscan_from_pairs

    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    pts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_from_pairs(pairs, pts, min_pts=1)


def test_simplified_silhouette_hand_values(spark):
    """Two tight clusters far apart -> s near 1e6; a point midway ->
    small s.  a2/b2 algebra checked by hand on the planted geometry."""
    from pyspark.sql import functions as F

    from nexus_forge_spark.operators.clustering import (
        assign_clusters,
        simplified_silhouette,
    )

    pts = spark.createDataFrame(
        [(1, [0, 0]), (2, [2, 0]), (3, [100, 0]), (4, [102, 0]), (5, [52, 0])],
        "vid long, qv array<long>",
    )
    cents = [[1, 0], [101, 0]]
    out = {
        r.cid: r for r in simplified_silhouette(
            assign_clusters(pts, cents), cents
        ).collect()
    }
    # points 1,2: a2=1, b2=(101-0)^2=10201 / (101-2)^2=9801 -> s ~ 999901
    assert out[0].n == 2 and out[1].n == 3  # midway point lands in c1
    # midway point 5: a2=(52-1)^2=2601, b2=(101-52)^2=2401 -> assigned to
    # cluster 1 (argmin), so a2=2401, b2=2601, s=(200)*1e6//2601
    assert out[-1].n == 5
    assert 0 <= out[-1].mean_s_ppm <= 1_000_000
    assert out[0].mean_s_ppm > 600_000  # tight clusters score high


def test_simplified_silhouette_requires_k2(spark):
    import pytest as _pt

    from nexus_forge_spark.operators.clustering import simplified_silhouette

    with _pt.raises(ValueError):
        simplified_silhouette(None, [[1, 0]])
