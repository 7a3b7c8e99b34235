from __future__ import annotations

import random

import duckdb

from nexus_forge_spark.operators.fusion import (
    align_properties,
    sql_align_properties,
    sql_truth_discovery,
    truth_discovery,
)


def _sql_rows(rows, cols):
    return " UNION ALL ".join(
        "SELECT " + ", ".join(f"'{v}' AS {c}" for v, c in zip(r, cols)) for r in rows
    )


def test_truth_discovery_reliability_flips_spam_majority(spark):
    # A, B, C agree on e0..e7; D and E claim wrong values there, so their
    # measured reliability collapses.  On entity X the raw majority is the
    # two spammers (2 votes vs A's 1), but reliability-weighted round 1
    # elects A's value.
    claims = []
    for i in range(8):
        for s in ("A", "B", "C"):
            claims.append((s, f"e{i}", f"t{i}"))
        for s in ("D", "E"):
            claims.append((s, f"e{i}", f"f{i}"))
    claims += [("A", "X", "good"), ("D", "X", "bad"), ("E", "X", "bad")]
    df = spark.createDataFrame(claims, "source string, entity string, value string")
    got = {r.entity: r for r in truth_discovery(df, rounds=2).collect()}
    assert got["X"].value == "good" and bool(got["X"].changed)
    assert got["e0"].value == "t0" and not got["e0"].changed
    assert got["X"].n_sources == 3 and got["X"].n_values == 2


def test_truth_discovery_tiebreak_is_lexicographic(spark):
    claims = [("A", "e", "zzz"), ("B", "e", "aaa")]
    df = spark.createDataFrame(claims, "source string, entity string, value string")
    out = truth_discovery(df, rounds=1).collect()
    assert out[0].value == "aaa"


def test_truth_discovery_duplicate_claims_count_once(spark):
    # one source asserting the same value 100 times is still one vote
    claims = [("A", "e", "v1")] * 100 + [("B", "e", "v2"), ("C", "e", "v2")]
    df = spark.createDataFrame(claims, "source string, entity string, value string")
    out = truth_discovery(df, rounds=1).collect()
    assert out[0].value == "v2"


def test_truth_discovery_matches_duckdb_oracle(spark):
    rng = random.Random(42)
    claims = sorted(
        {
            (f"s{rng.randrange(12)}", f"e{rng.randrange(40)}", f"v{rng.randrange(4)}")
            for _ in range(600)
        }
    )
    df = spark.createDataFrame(
        claims, "source string, entity string, value string"
    )
    got = sorted(tuple(r) for r in truth_discovery(df, rounds=2).collect())
    sql = sql_truth_discovery(
        _sql_rows(claims, ["source", "entity", "value"]), rounds=2
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_align_properties_renamed_predicate_scores_full(spark):
    base = [(f"s{i}", "p_old", f"o{i}") for i in range(10)]
    left = spark.createDataFrame(base, "subj string, pred string, obj string")
    right = spark.createDataFrame(
        [(s, "p_new", o) for s, _, o in base] + [("sx", "p_new", "ox")],
        "subj string, pred string, obj string",
    )
    out = align_properties(left, right, min_overlap=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred_l, r.pred_r, r.n_inter, r.n_l, r.n_r) == ("p_old", "p_new", 10, 10, 11)
    assert r.jaccard_ppm == 10 * 1_000_000 // 11


def test_align_properties_no_shared_instances_never_pair(spark):
    left = spark.createDataFrame(
        [("a", "p1", "x"), ("b", "p1", "y")], "subj string, pred string, obj string"
    )
    right = spark.createDataFrame(
        [("c", "p2", "z")], "subj string, pred string, obj string"
    )
    assert align_properties(left, right, min_overlap=1).count() == 0


def test_align_properties_matches_duckdb_oracle(spark):
    rng = random.Random(7)
    left = sorted(
        {
            (f"s{rng.randrange(30)}", f"p{rng.randrange(5)}", f"o{rng.randrange(8)}")
            for _ in range(300)
        }
    )
    right = sorted(
        {
            (f"s{rng.randrange(30)}", f"q{rng.randrange(5)}", f"o{rng.randrange(8)}")
            for _ in range(300)
        }
    )
    l_df = spark.createDataFrame(left, "subj string, pred string, obj string")
    r_df = spark.createDataFrame(right, "subj string, pred string, obj string")
    got = sorted(tuple(r) for r in align_properties(l_df, r_df).collect())
    sql = sql_align_properties(
        _sql_rows(left, ["subj", "pred", "obj"]),
        _sql_rows(right, ["subj", "pred", "obj"]),
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
