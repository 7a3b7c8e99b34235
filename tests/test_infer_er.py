"""RDFS domain/range inference and Fellegi-Sunter classification semantics
(engine parity is covered by the kg_inferred_types / er_fs_scores contract
queries)."""

import pytest
from pyspark.sql import functions as F

from nexus_forge_spark.operators.er import fs_classify
from nexus_forge_spark.operators.triples import infer_types

TRIP_SCHEMA = "subj string, pred string, obj string, obj_is_literal boolean"
DECL_SCHEMA = "pred string, domain_class string, range_class string"


def _decls(spark):
    return spark.createDataFrame(
        [
            ("knows", "Person", "Person"),
            ("name", "Person", None),
            ("memberOf", None, "Org"),
        ],
        DECL_SCHEMA,
    )


def test_infer_types_domain_and_range(spark):
    trip = spark.createDataFrame(
        [
            ("a", "knows", "b", False),
            ("a", "name", "Ada", True),
            ("b", "memberOf", "acme", False),
        ],
        TRIP_SCHEMA,
    )
    out = infer_types(trip, _decls(spark), literal_col="obj_is_literal")
    got = {(r.subj, r.obj): r.novel for r in out.collect()}
    assert got == {
        ("a", "Person"): True,  # domain of knows + domain of name (dedup'd)
        ("b", "Person"): True,  # range of knows
        ("acme", "Org"): True,  # range of memberOf
    }
    assert all(r.pred == "rdf:type" for r in out.collect())


def test_infer_types_literal_objects_never_typed(spark):
    # 'name' has no range decl, but even with one a literal obj must not
    # be typed when literal_col is passed
    trip = spark.createDataFrame([("a", "knows", "lit", True)], TRIP_SCHEMA)
    out = infer_types(trip, _decls(spark), literal_col="obj_is_literal")
    got = {(r.subj, r.obj) for r in out.collect()}
    assert got == {("a", "Person")}  # domain fires, range suppressed


def test_infer_types_novel_flag(spark):
    trip = spark.createDataFrame(
        [
            ("a", "knows", "b", False),
            ("a", "rdf:type", "Person", False),  # already asserted
        ],
        TRIP_SCHEMA,
    )
    out = {(r.subj, r.obj): r.novel for r in
           infer_types(trip, _decls(spark), literal_col="obj_is_literal").collect()}
    assert out == {("a", "Person"): False, ("b", "Person"): True}


WEIGHTS = {"f1": (2000, -1000), "f2": (500, -500)}


def test_fs_classify_bands(spark):
    rows = [
        (1, True, True),    # 2500 -> match
        (2, True, False),   # 1500 -> possible
        (3, False, False),  # -1500 -> nonmatch
        (4, False, True),   # -500 -> nonmatch
    ]
    df = spark.createDataFrame(rows, "id int, f1 boolean, f2 boolean")
    out = {r.id: (r.score_milli, r.decision)
           for r in fs_classify(df, WEIGHTS, 2500, 0).collect()}
    assert out == {
        1: (2500, "match"),
        2: (1500, "possible"),
        3: (-1500, "nonmatch"),
        4: (-500, "nonmatch"),
    }


def test_fs_classify_null_contributes_zero(spark):
    df = spark.createDataFrame(
        [(1, None, True)], "id int, f1 boolean, f2 boolean"
    )
    r = fs_classify(df, WEIGHTS, 2500, 0).collect()[0]
    assert r.score_milli == 500 and r.decision == "possible"


def test_fs_classify_rejects_inverted_thresholds(spark):
    df = spark.createDataFrame([(1, True)], "id int, f1 boolean")
    with pytest.raises(ValueError):
        fs_classify(df, {"f1": (1, -1)}, upper_milli=0, lower_milli=10)


def test_blocking_metrics_hand_computed(spark):
    from nexus_forge_spark.operators.er import blocking_metrics

    # 5 records -> 10 possible pairs; blocker proposed 3 (one reversed,
    # one self-pair to be ignored); truth has 2 pairs, 1 covered
    cand = spark.createDataFrame(
        [(1, 2), (3, 1), (4, 4)], "a long, b long"
    )
    truth = spark.createDataFrame([(2, 1), (4, 5)], "a long, b long")
    r = blocking_metrics(cand, truth, n_records=5).collect()[0]
    assert (r.n_candidates, r.n_truth, r.n_truth_covered) == (2, 2, 1)
    assert r.reduction_ratio_ppm == (10 - 2) * 1000000 // 10
    assert r.pair_completeness_ppm == 500000


def test_dangling_refs_detection(spark):
    from nexus_forge_spark.operators.triples import dangling_refs

    trip = spark.createDataFrame(
        [
            ("a", "rdf:type", "Person", False),
            ("a", "knows", "ghost", False),   # ghost never described
            ("b", "knows", "ghost", False),
            ("a", "memberOf", "b", False),    # b IS described (below)
            ("b", "name", "B Corp", True),
            ("a", "note", "hello", True),     # literal: not a reference
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    out = {r.ref: (r.n_uses, r.example_pred)
           for r in dangling_refs(trip, literal_col="obj_is_literal").collect()}
    # 'Person' excluded as a class term, 'hello' as a literal, 'b' described
    assert out == {"ghost": (2, "knows")}


def test_infer_inverses_symmetric_and_novel(spark):
    from nexus_forge_spark.operators.triples import infer_inverses

    trip = spark.createDataFrame(
        [
            ("a", "hasPart", "b", False),
            ("x", "marriedTo", "y", False),   # symmetric
            ("y", "marriedTo", "x", False),   # reverse already asserted
            ("a", "name", "lit", True),       # literal never inverts
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    decls = spark.createDataFrame(
        [("hasPart", "partOf"), ("marriedTo", "marriedTo")],
        "pred string, inverse_pred string",
    )
    out = {(r.subj, r.pred, r.obj): r.novel
           for r in infer_inverses(trip, decls, literal_col="obj_is_literal").collect()}
    assert out == {
        ("b", "partOf", "a"): True,
        ("y", "marriedTo", "x"): False,  # both directions asserted
        ("x", "marriedTo", "y"): False,
    }


def test_range_violations_any_type_conforms(spark):
    from nexus_forge_spark.operators.triples import range_violations

    trip = spark.createDataFrame(
        [
            ("a", "worksAt", "acme", False),
            ("acme", "rdf:type", "Org", False),
            ("a", "worksAt", "bob", False),
            ("bob", "rdf:type", "Person", False),
            ("bob", "rdf:type", "Org", False),  # ALSO an Org -> conforms
            ("a", "worksAt", "ghost", False),   # untyped -> not judged
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    decls = spark.createDataFrame(
        [("worksAt", None, "Org")],
        "pred string, domain_class string, range_class string",
    )
    out = range_violations(trip, decls, literal_col="obj_is_literal").collect()
    assert out == []  # acme is Org; bob has Org among its types; ghost unjudged

    decls2 = spark.createDataFrame(
        [("worksAt", None, "Person")],
        "pred string, domain_class string, range_class string",
    )
    bad = {(r.obj, tuple(r.actual_types))
           for r in range_violations(trip, decls2, literal_col="obj_is_literal").collect()}
    assert bad == {("acme", ("Org",))}  # bob conforms via Person


def test_er_resolution_composition(spark, sf_dir):
    """End-to-end ER: one row per (cluster, attr); cluster ids are the
    min member; sizes consistent with the election support."""
    from nexus_forge_spark.plans.driver_queries import q_er_resolution

    out = q_er_resolution(spark, sf_dir).collect()
    seen = {}
    for r in out:
        key = (r.cluster_id, r.attr)
        assert key not in seen  # exactly one golden value per attribute
        seen[key] = r
        assert r.attr in ("source", "lang")
        assert 1 <= r.support <= r.n_members
    # every cluster elects BOTH attributes
    clusters = {c for c, _ in seen}
    assert all((c, "source") in seen and (c, "lang") in seen for c in clusters)
    # at least one multi-member cluster exists (mutant docs pair up)
    assert any(r.n_members >= 2 for r in out)


def test_align_releases_rename_detection(spark):
    from nexus_forge_spark.operators.er import align_releases

    def tri(s):
        s = s.lower()
        return set(s[i:i + 3] for i in range(len(s) - 2)) if len(s) >= 3 else {s}

    old = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "stable name")],
        "entity_id long, label string",
    )
    new = spark.createDataFrame(
        [(11, "beta gamma"), (12, "stable name"), (13, "zzz qqq vvv")],
        "entity_id long, label string",
    )
    out = {r.old_id: r for r in align_releases(old, new).collect()}
    # stable label cancels: old 3 never appears
    assert 3 not in out
    # rename detected with the exact integer trigram-jaccard score
    a, b = tri("alpha beta gamma"), tri("beta gamma")
    expected = len(a & b) * 1000 // len(a | b)
    assert expected >= 500
    assert out[1].new_id == 11 and out[1].sim_milli == expected
    # dissimilar removed label has no match above threshold
    assert 2 not in out


def test_align_releases_best_match_tiebreak(spark):
    from nexus_forge_spark.operators.er import align_releases

    old = spark.createDataFrame([(1, "abcdef")], "entity_id long, label string")
    # two identical-similarity candidates -> min new_id wins
    new = spark.createDataFrame(
        [(20, "abcdefg"), (10, "abcdefg")], "entity_id long, label string"
    )
    out = align_releases(old, new).collect()
    assert len(out) == 1 and out[0].new_id == 10


def test_soundex_standard_vectors(spark):
    from nexus_forge_spark.operators.er import soundex_code

    vectors = [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Ashcraft", "A261"),   # h-transparency: S,C merge across the H
        ("Ashcroft", "A261"),
        ("Tymczak", "T522"),
        ("Pfister", "P236"),    # first-letter run merges (P,F both 1)
        ("Honeyman", "H555"),   # HW-initial branch
        ("Jackson", "J250"),
        ("lee", "L000"),
        ("Washington", "W252"),
        ("123", None),
        ("O'Brien", "O165"),
    ]
    df = spark.createDataFrame([(n,) for n, _ in vectors], "name string")
    got = {
        r.name: r.code
        for r in df.select("name", soundex_code(F.col("name")).alias("code")).collect()
    }
    for name, expect in vectors:
        assert got[name] == expect, (name, got[name], expect)


def test_soundex_sql_matches_spark(spark):
    import duckdb

    from nexus_forge_spark.operators.er import soundex_code, sql_soundex_code

    names = [
        "Robert", "Ashcraft", "Honeyman", "Pfister", "Washington",
        "Wu", "Hwang", "Czarkowska", "de la Cruz", "Schmidt", "Smythe",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r.name: r.code
        for r in df.select("name", soundex_code(F.col("name")).alias("code")).collect()
    }
    con = duckdb.connect()
    for n in names:
        (code,) = con.sql(
            f"SELECT {sql_soundex_code('?')}".replace("?", f"'{n}'")
        ).fetchone()
        assert got[n] == code, (n, got[n], code)


def test_pr_curve_hand(spark):
    from nexus_forge_spark.operators.er import pr_curve

    scored = spark.createDataFrame(
        [(1, 2, 90), (3, 4, 80), (5, 6, 80), (7, 8, 50), (9, 10, 30)],
        "a long, b long, score_milli long",
    )
    # truth: (1,2), (3,4), (9,10) in-candidates + (11,12) never surfaced
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (9, 10), (11, 12)], "a long, b long"
    )
    out = {r.threshold: r for r in pr_curve(scored, truth).collect()}
    assert set(out) == {90, 80, 50, 30}
    r90 = out[90]
    assert (r90.tp, r90.fp, r90.fn) == (1, 0, 3)
    assert r90.prec_ppm == 1_000_000 and r90.rec_ppm == 250_000
    r80 = out[80]
    assert (r80.tp, r80.fp) == (2, 1)
    assert r80.prec_ppm == 2 * 1_000_000 // 3 and r80.rec_ppm == 500_000
    r30 = out[30]
    # the blocker-missed pair (11,12) depresses recall forever
    assert (r30.tp, r30.fp, r30.fn) == (3, 2, 1)
    assert r30.rec_ppm == 750_000
    # f1 harmonic mean check at threshold 90: 2*1e6*25e4/(125e4)
    assert r90.f1_ppm == 2 * 1_000_000 * 250_000 // 1_250_000


def test_pr_curve_duplicate_pairs_collapse_to_max_score(spark):
    from nexus_forge_spark.operators.er import pr_curve

    # the same pair surfaced by three LSH bands at different scores, plus
    # its flipped orientation — must count as ONE candidate at max score
    scored = spark.createDataFrame(
        [(1, 2, 90), (2, 1, 70), (1, 2, 50), (3, 4, 50)],
        "a long, b long, score_milli long",
    )
    truth = spark.createDataFrame([(1, 2)], "a long, b long")
    out = {r.threshold: r for r in pr_curve(scored, truth).collect()}
    assert set(out) == {90, 50}
    # tp never exceeds the truth size; recall capped at 1e6 ppm
    assert (out[90].tp, out[90].fp) == (1, 0)
    assert out[90].rec_ppm == 1_000_000
    assert (out[50].tp, out[50].fp) == (1, 1)
    assert all(r.rec_ppm <= 1_000_000 and r.tp <= 1 for r in out.values())


# ------------------------------------------------ EM-trained Fellegi-Sunter


def _em_pairs(spark, rows):
    return spark.createDataFrame(
        rows, "a long, b long, f0 boolean, f1 boolean"
    )


def test_em_fs_separates_planted_mixture(spark):
    """Two planted populations: dups agree on both fields, non-dups on
    neither.  EM must learn m >> u for both fields and classify the
    agreeing pairs as matches."""
    from nexus_forge_spark.operators.er import em_fs_train

    rows = [(i, i + 1000, True, True) for i in range(30)]
    rows += [(i + 100, i + 2000, False, False) for i in range(70)]
    out, params = em_fs_train(
        _em_pairs(spark, rows), ["f0", "f1"], rounds=3
    )
    got = {(r.a, r.b): r.matched for r in out.collect()}
    assert all(got[(i, i + 1000)] == 1 for i in range(30))
    assert all(got[(i + 100, i + 2000)] == 0 for i in range(70))
    assert params["m_ppm"][0] > params["u_ppm"][0]
    assert params["m_ppm"][1] > params["u_ppm"][1]
    # lambda should land near the planted 30% dup rate
    assert 200000 < params["lambda_ppm"] < 400000


def test_em_fs_matches_duckdb_bit_exact(spark):
    import duckdb

    from nexus_forge_spark.operators.er import em_fs_train, sql_em_fs_train

    # deterministic pseudo-random gammas incl. NULLs (treated as 0)
    rows = []
    for i in range(200):
        f0 = None if i % 17 == 0 else (i * 7 % 13 < 5)
        f1 = (i * 11 % 19) < 9
        rows.append((i, i + 10000, f0, f1))
    out, params = em_fs_train(_em_pairs(spark, rows), ["f0", "f1"], rounds=3)
    got = sorted((r.a, r.b, r.w_ppm, r.matched) for r in out.collect())
    vals = ", ".join(
        f"({a}, {b}, {'NULL' if f0 is None else f0}, {f1})" for a, b, f0, f1 in rows
    )
    sql = sql_em_fs_train(
        f"SELECT * FROM (VALUES {vals}) AS t(a, b, f0, f1)",
        ["f0", "f1"],
        rounds=3,
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_em_fs_empty_and_bad_rounds(spark):
    from nexus_forge_spark.operators.er import em_fs_train

    import pytest as _pytest

    with _pytest.raises(ValueError):
        em_fs_train(_em_pairs(spark, [(1, 2, True, True)]), ["f0", "f1"], rounds=0)
    out, params = em_fs_train(
        _em_pairs(spark, []).limit(0), ["f0", "f1"], rounds=2
    )
    assert out.count() == 0
    # params stay at (clamped) inits when there is nothing to learn
    assert params["lambda_ppm"] == 500000


# ------------------------------------------------ local-max 1-1 matching


def test_one_to_one_locks_mutual_best(spark):
    from nexus_forge_spark.operators.er import one_to_one_matching

    edges = spark.createDataFrame(
        [
            ("a1", "b1", 90), ("a1", "b2", 80),
            ("a2", "b1", 70), ("a2", "b2", 60),
        ],
        "a string, b string, score long",
    )
    got = sorted((r.a, r.b, r.score, r.round) for r in one_to_one_matching(edges).collect())
    # round 1: (a1,b1) mutual best; round 2: (a2,b2) is all that's left
    assert got == [("a1", "b1", 90, 1), ("a2", "b2", 60, 2)]


def test_one_to_one_never_conflicts_and_ties_deterministic(spark):
    from nexus_forge_spark.operators.er import one_to_one_matching

    edges = spark.createDataFrame(
        [("a1", "b1", 50), ("a1", "b2", 50), ("a2", "b1", 50)],
        "a string, b string, score long",
    )
    rows = one_to_one_matching(edges).collect()
    a_side = [r.a for r in rows]
    b_side = [r.b for r in rows]
    assert len(set(a_side)) == len(a_side) and len(set(b_side)) == len(b_side)
    # min-partner tie-break: a1 pairs with b1
    assert ("a1", "b1") in {(r.a, r.b) for r in rows}


def test_one_to_one_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.er import (
        one_to_one_matching,
        sql_one_to_one_matching,
    )

    rows = [
        (f"a{i % 13}", f"b{(i * 7) % 11}", (i * 37) % 100) for i in range(120)
    ]
    rows = list({(a, b): (a, b, s) for a, b, s in rows}.values())
    edges = spark.createDataFrame(rows, "a string, b string, score long")
    got = sorted(tuple(r) for r in one_to_one_matching(edges, rounds=4).collect())
    vals = ", ".join(f"('{a}', '{b}', {s})" for a, b, s in rows)
    sql = sql_one_to_one_matching(
        f"SELECT * FROM (VALUES {vals}) AS t(a, b, score)", rounds=4
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


# ------------------------------------------------------------- B-cubed


def test_bcubed_hand_example(spark):
    """Classic example: truth {1,2,3},{4,5}; prediction merges all into
    one cluster -> recall 1.0, precision = (3*3/5 + 2*2/5)/5 = 13/25."""
    from nexus_forge_spark.operators.er import bcubed_metrics

    rows = [(i, "P", "T1") for i in (1, 2, 3)] + [(i, "P", "T2") for i in (4, 5)]
    df = spark.createDataFrame(rows, "item long, pred_cluster string, true_cluster string")
    r = bcubed_metrics(df).collect()[0]
    assert r.n_items == 5
    assert r.recall_ppm == 1000000
    assert abs(r.precision_ppm - 520000) <= 1  # 13/25 with truncating div


def test_bcubed_perfect_and_shattered(spark):
    from nexus_forge_spark.operators.er import bcubed_metrics

    perfect = spark.createDataFrame(
        [(i, f"c{i % 3}", f"c{i % 3}") for i in range(30)],
        "item long, pred_cluster string, true_cluster string",
    )
    r = bcubed_metrics(perfect).collect()[0]
    assert (r.precision_ppm, r.recall_ppm, r.f1_ppm) == (1000000, 1000000, 1000000)
    shattered = spark.createDataFrame(
        [(i, f"s{i}", "T") for i in range(10)],
        "item long, pred_cluster string, true_cluster string",
    )
    r2 = bcubed_metrics(shattered).collect()[0]
    assert r2.precision_ppm == 1000000 and r2.recall_ppm == 100000


def test_bcubed_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.er import bcubed_metrics, sql_bcubed_metrics

    rows = [(i, f"p{(i * 7) % 6}", f"t{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "item long, pred_cluster string, true_cluster string")
    got = [tuple(r) for r in bcubed_metrics(df).collect()]
    vals = ", ".join(f"({i}, '{p}', '{t}')" for i, p, t in rows)
    sql = sql_bcubed_metrics(
        f"SELECT * FROM (VALUES {vals}) AS t(item, pred_cluster, true_cluster)"
    )
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == want


def test_muc_hand_example(spark):
    """Vilain's canonical case: truth {1,2,3,4}; prediction {1,2},{3,4}:
    recall = (4-2)/(4-1) = 2/3, precision = (2-1)+(2-1) / (1+1) = 1."""
    from nexus_forge_spark.operators.er import muc_metrics

    rows = [(1, "p1", "T"), (2, "p1", "T"), (3, "p2", "T"), (4, "p2", "T")]
    df = spark.createDataFrame(rows, "item long, pred_cluster string, true_cluster string")
    r = muc_metrics(df).collect()[0]
    assert r.precision_ppm == 1000000
    assert r.recall_ppm == 666666
    # singletons are invisible to MUC: adding matched singletons changes nothing
    rows2 = rows + [(5, "p5", "S5"), (6, "p6", "S6")]
    df2 = spark.createDataFrame(rows2, "item long, pred_cluster string, true_cluster string")
    r2 = muc_metrics(df2).collect()[0]
    assert (r2.precision_ppm, r2.recall_ppm) == (r.precision_ppm, r.recall_ppm)


def test_muc_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.er import muc_metrics, sql_muc_metrics

    rows = [(i, f"p{(i * 3) % 5}", f"t{i % 4}") for i in range(120)]
    df = spark.createDataFrame(rows, "item long, pred_cluster string, true_cluster string")
    got = [tuple(r) for r in muc_metrics(df).collect()]
    vals = ", ".join(f"({i}, '{p}', '{t}')" for i, p, t in rows)
    sql = sql_muc_metrics(
        f"SELECT * FROM (VALUES {vals}) AS t(item, pred_cluster, true_cluster)"
    )
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == want


def test_calibration_bins_exact(spark):
    from nexus_forge_spark.operators.er import calibration_bins

    scored = spark.createDataFrame(
        [(1, 2, 950000), (3, 4, 980000), (5, 6, 50000), (7, 8, 40000),
         (2, 1, 900000)],  # reversed duplicate of (1,2): max wins
        "a long, b long, w_ppm long",
    )
    truth = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    out = {r.bin: r for r in calibration_bins(scored, truth, bins=10).collect()}
    # top bucket: pairs (1,2)->950000 and (3,4)->980000, both true
    assert out[9].n_pairs == 2 and out[9].observed_ppm == 1000000
    assert out[9].mean_pred_ppm == (950000 + 980000) // 2
    # bottom bucket: two false pairs
    assert out[0].n_pairs == 2 and out[0].observed_ppm == 0
