from __future__ import annotations

import duckdb

from nexus_forge_spark.operators.canonicalize import (
    connected_components,
    ifp_sameas_edges,
    sql_ifp_sameas_edges,
)
from nexus_forge_spark.operators.ontology import (
    mine_disjointness,
    sql_mine_disjointness,
)


def _trips(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _sql_rows(rows, cols):
    return " UNION ALL ".join(
        "SELECT " + ", ".join(f"'{v}' AS {c}" for v, c in zip(r, cols)) for r in rows
    )


IFP_ROWS = [
    ("e1", "mbox", "a@x"),
    ("e2", "mbox", "a@x"),
    ("e3", "mbox", "a@x"),
    ("e4", "mbox", "b@x"),          # singleton value -> no edges
    ("e5", "isbn", "123"),
    ("e6", "isbn", "123"),
    ("e1", "name", "Ann"),          # not an IFP -> ignored
    ("e9", "name", "Ann"),
    ("j1", "mbox", "unknown"),
    ("j2", "mbox", "unknown"),
    ("j3", "mbox", "unknown"),
    ("j4", "mbox", "unknown"),
]


def test_star_replacement_preserves_components(spark):
    edges = ifp_sameas_edges(_trips(spark, IFP_ROWS), ["mbox", "isbn"])
    got = {(r.a, r.b) for r in edges.collect()}
    # star on the min entity, both directions, never the full clique
    assert ("e1", "e2") in got and ("e2", "e1") in got
    assert ("e2", "e3") not in got  # clique edge replaced by star
    nodes = edges.select("a").union(edges.select("b")).distinct().toDF("entity_id")
    comp = connected_components(edges, nodes)
    cid = {r.entity_id: r.canonical_id for r in comp.collect()}
    assert cid["e1"] == cid["e2"] == cid["e3"]
    assert cid["e5"] == cid["e6"] != cid["e1"]
    assert cid["j1"] == cid["j4"]
    assert "e4" not in cid and "e9" not in cid


def test_max_block_drops_junk_values(spark):
    edges = ifp_sameas_edges(_trips(spark, IFP_ROWS), ["mbox", "isbn"], max_block=3)
    got = {(r.a, r.b) for r in edges.collect()}
    assert not any(a.startswith("j") for a, _ in got)  # 4-entity block dropped
    assert ("e1", "e3") in got  # 3-entity block kept


def test_ifp_oracle(spark):
    for cap in (None, 3):
        got = {
            tuple(r)
            for r in ifp_sameas_edges(
                _trips(spark, IFP_ROWS), ["mbox", "isbn"], max_block=cap
            ).collect()
        }
        want = {
            tuple(r)
            for r in duckdb.connect()
            .execute(
                sql_ifp_sameas_edges(
                    _sql_rows(IFP_ROWS, ["subj", "pred", "obj"]),
                    ["mbox", "isbn"],
                    max_block=cap,
                )
            )
            .fetchall()
        }
        assert got == want


TYPE_ROWS = (
    [(f"i{k}", "cat") for k in range(10)]
    + [(f"i{k}", "dog") for k in range(10, 20)]
    + [(f"i{k}", "pet") for k in range(20)]
    + [("i0", "dog")]        # one noisy co-typing: cat/dog overlap 1
    + [("r1", "rare")]       # below min_support -> never in the grid
)


def test_disjointness_mining_thresholds(spark):
    t = spark.createDataFrame(TYPE_ROWS, "instance string, cls string")
    strict = {
        (r.cls_a, r.cls_b): r for r in mine_disjointness(t, min_support=5).collect()
    }
    # cat/pet and dog/pet fully overlap -> never candidates; cat/dog has
    # 1 noisy overlap -> excluded at 0 ppm tolerance
    assert strict == {}
    loose = {
        (r.cls_a, r.cls_b): r
        for r in mine_disjointness(t, min_support=5, max_overlap_ppm=200_000).collect()
    }
    assert set(loose) == {("cat", "dog")}
    r = loose[("cat", "dog")]
    assert (r.n_a, r.n_b, r.n_overlap) == (10, 11, 1)
    assert r.overlap_ppm == 1_000_000 // 10


def test_disjointness_oracle(spark):
    t = spark.createDataFrame(TYPE_ROWS, "instance string, cls string")
    for ppm in (0, 200_000, 1_000_000):
        got = {
            tuple(r)
            for r in mine_disjointness(t, min_support=5, max_overlap_ppm=ppm).collect()
        }
        want = {
            tuple(r)
            for r in duckdb.connect()
            .execute(
                sql_mine_disjointness(
                    _sql_rows(TYPE_ROWS, ["instance", "cls"]),
                    min_support=5,
                    max_overlap_ppm=ppm,
                )
            )
            .fetchall()
        }
        assert got == want
