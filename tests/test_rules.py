from __future__ import annotations

import duckdb

from nexus_forge_spark.operators.rules import mine_chain_rules, sql_mine_chain_rules

PPM = 1_000_000


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _sql_rows(rows):
    return " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj" for s, p, o in rows
    )


def _composition_graph():
    # located_in(sup, nat), part_of(nat, reg), operates_in holds for all
    # but sup3 -> a confidence-3/4 rule; bought is a red herring.
    rows = []
    for i in range(4):
        rows.append((f"sup{i}", "located_in", f"nat{i % 2}"))
    rows += [("nat0", "part_of", "reg0"), ("nat1", "part_of", "reg1")]
    for i in range(3):
        rows.append((f"sup{i}", "operates_in", f"reg{i % 2}"))
    rows.append(("cust0", "bought", "part0"))
    return rows


def test_chain_rule_confidences(spark):
    rows = _composition_graph()
    out = {
        (r.p1, r.p2, r.head_pred): r
        for r in mine_chain_rules(_triples(spark, rows), min_support=2).collect()
    }
    r = out[("located_in", "part_of", "operates_in")]
    assert r.support == 3 and r.body_size == 4
    assert r.conf_ppm == 3 * PPM // 4
    # PCA: sup3 has no operates_in fact at all -> pca_body = 3, pca conf 1.0
    assert r.pca_body == 3 and r.pca_conf_ppm == PPM


def test_self_loop_and_reflexive_bindings_excluded(spark):
    # a->a edges and x==z compositions must not create support
    rows = [
        ("a", "p", "a"),
        ("a", "p", "b"),
        ("b", "q", "a"),  # composition a-p-b-q-a has x == z -> excluded
        ("a", "r", "a"),
    ]
    out = mine_chain_rules(_triples(spark, rows), min_support=1).collect()
    assert all(row.p1 != "r" and row.p2 != "r" for row in out)
    assert ("p", "q") not in {(row.p1, row.p2) for row in out}


def test_hub_cap_drops_connector(spark):
    # hub 'h' has 3 in x 3 out = 9 > cap 8 -> rules through h vanish;
    # the quiet connector 'q' (1x1) survives.
    rows = []
    for i in range(3):
        rows.append((f"a{i}", "into", "h"))
        rows.append(("h", "outof", f"b{i}"))
        rows.append((f"a{i}", "direct", f"b{i}"))
    rows += [("c0", "into2", "q"), ("q", "outof2", "d0"), ("c0", "direct2", "d0")]
    capped = mine_chain_rules(_triples(spark, rows), min_support=1, hub_cap=8)
    keys = {(r.p1, r.p2, r.head_pred) for r in capped.collect()}
    assert ("into", "outof", "direct") not in keys
    assert ("into2", "outof2", "direct2") in keys
    uncapped = mine_chain_rules(_triples(spark, rows), min_support=1)
    assert ("into", "outof", "direct") in {
        (r.p1, r.p2, r.head_pred) for r in uncapped.collect()
    }


def test_duplicate_assertions_count_once(spark):
    rows = _composition_graph() * 5
    out = {
        (r.p1, r.p2, r.head_pred): r
        for r in mine_chain_rules(_triples(spark, rows), min_support=2).collect()
    }
    r = out[("located_in", "part_of", "operates_in")]
    assert r.support == 3 and r.body_size == 4


def test_oracle_differential(spark):
    rows = _composition_graph()
    for cap in (None, 8):
        got = {
            tuple(r)
            for r in mine_chain_rules(
                _triples(spark, rows), min_support=1, hub_cap=cap
            ).collect()
        }
        want = {
            tuple(r)
            for r in duckdb.connect()
            .execute(sql_mine_chain_rules(_sql_rows(rows), min_support=1, hub_cap=cap))
            .fetchall()
        }
        assert got == want
