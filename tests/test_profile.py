"""Table profiling: one-pass per-column stats + integer-exact equi-width
histograms (profile_customers / histogram_acctbal contract queries)."""

from nexus_forge_spark.operators.profile import numeric_histogram, profile_table


def test_profile_table_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "b")],
        "k long, s string",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s"}
    assert out["k"].n_rows == 4 and out["s"].n_rows == 4
    assert out["k"].n_null == 0 and out["s"].n_null == 1
    assert out["k"].n_distinct == 3 and out["s"].n_distinct == 2
    assert (out["k"].min_value, out["k"].max_value) == ("1", "3")
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")


def test_profile_table_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "k long, s string")
    rows = profile_table(df, ["s"]).collect()
    assert [r.column for r in rows] == ["s"]


def test_numeric_histogram_hand_computed(spark):
    # values 0.00..0.09 in cents -> v in 0..9, lo=0, span=10, 5 bins:
    # bin = v * 5 div 10 -> exactly 2 values per bin
    df = spark.createDataFrame([(i / 100.0,) for i in range(10)], "x double")
    rows = numeric_histogram(df, "x", bins=5).collect()
    assert [r.bin for r in rows] == [0, 1, 2, 3, 4]
    assert all(r.n == 2 for r in rows)
    assert rows[0].lo_scaled == 0 and rows[-1].hi_scaled == 10
    # closed-open bounds tile the range with no gaps
    for a, b in zip(rows, rows[1:]):
        assert a.hi_scaled == b.lo_scaled


def test_numeric_histogram_negative_and_empty_bins(spark):
    df = spark.createDataFrame([(-1.0,), (1.0,), (None,)], "x double")
    rows = numeric_histogram(df, "x", bins=4).collect()
    assert len(rows) == 4
    assert sum(r.n for r in rows) == 2  # null excluded
    assert rows[0].n == 1 and rows[-1].n == 1  # extremes in end bins
    assert any(r.n == 0 for r in rows)  # interior bins emitted empty


def test_numeric_histogram_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    rows = numeric_histogram(df, "x", bins=3).collect()
    assert len(rows) == 3 and all(r.n == 0 for r in rows)


def test_key_skew_profile_hand_computed(spark):
    from nexus_forge_spark.operators.profile import key_skew_profile

    # 6 a, 3 b, 1 c, 1 null (excluded): total 10 rows, 3 keys
    data = [("a",)] * 6 + [("b",)] * 3 + [("c",)] + [(None,)]
    df = spark.createDataFrame(data, "k string")
    rows = key_skew_profile(df, "k", top_k=2).collect()
    assert [(r.rank, r.key, r.n) for r in rows] == [(1, "a", 6), (2, "b", 3)]
    assert rows[0].share_ppm == 600_000 and rows[0].cum_share_ppm == 600_000
    assert rows[1].share_ppm == 300_000 and rows[1].cum_share_ppm == 900_000
    assert rows[0].n_rows_total == 10 and rows[0].n_keys_total == 3


def test_key_skew_profile_tie_break_key_asc(spark):
    from nexus_forge_spark.operators.profile import key_skew_profile

    df = spark.createDataFrame([("z",), ("y",), ("y",), ("z",)], "k string")
    rows = key_skew_profile(df, "k", top_k=2).collect()
    assert [(r.rank, r.key) for r in rows] == [(1, "y"), (2, "z")]


def test_token_divergence_hand_computed(spark):
    from nexus_forge_spark.operators.profile import token_divergence

    rows = [
        ("a", "x x y"),   # left:  x:2 y:1  (n_left=3)
        ("b", "x z"),     # right: x:1 z:1  (n_right=2)
    ]
    df = spark.createDataFrame(rows, "side string, text string")
    out = {r.token: r.asDict() for r in token_divergence(df, "side", "a", "b").collect()}
    # p_left: x=666666 y=333333; p_right: x=500000 z=500000
    assert out["x"]["drift_ppm"] == 666666 - 500000
    assert out["y"]["drift_ppm"] == 333333
    assert out["z"]["drift_ppm"] == -500000
    assert out["x"]["c_left"] == 2 and out["x"]["c_right"] == 1


def test_token_divergence_topk_order_deterministic(spark):
    from nexus_forge_spark.operators.profile import token_divergence

    # two tokens with equal |drift|: tie broken by token ascending
    rows = [("a", "p"), ("b", "q")]
    df = spark.createDataFrame(rows, "side string, text string")
    got = [r.token for r in token_divergence(df, "side", "a", "b", top_k=1).collect()]
    assert got == ["p"]


def test_token_divergence_ignores_other_sides(spark):
    from nexus_forge_spark.operators.profile import token_divergence

    rows = [("a", "x"), ("b", "x"), ("c", "noise noise noise")]
    df = spark.createDataFrame(rows, "side string, text string")
    out = {r.token for r in token_divergence(df, "side", "a", "b").collect()}
    assert out == {"x"}


def test_fd_profile_exact_and_violated(spark):
    from nexus_forge_spark.operators.profile import fd_profile

    rows = [
        (1, "a", "x"),
        (1, "a", "x"),
        (1, "b", "x"),  # k->v violated once for k=1 (keep 'a' x2, drop 'b')
        (2, "c", "y"),
        (2, "c", "z"),  # k->w violated once for k=2
    ]
    df = spark.createDataFrame(rows, "k long, v string, w string")
    got = {
        r["fd"]: (r["lhs_groups"], r["n_rows"], r["violations"], r["g3_ppm"])
        for r in fd_profile(df, [(["k"], "v"), (["k", "v"], "w")], "t").collect()
    }
    assert got["t: k -> v"] == (2, 5, 1, 200000)
    # (k,v) -> w: group (2,c) has {y,z} -> 1 violation
    assert got["t: k,v -> w"] == (3, 5, 1, 200000)


def test_domain_quantile_calibration(spark):
    from nexus_forge_spark.operators.profile import domain_quantile_calibration

    rows = [
        # domain A scores low overall; domain B high — a global cutoff
        # would nuke all of A, calibration treats both fairly
        (1, "A", 10), (2, "A", 20), (3, "A", 20), (4, "A", 30), (5, "A", 40),
        (6, "B", 100), (7, "B", 200),
        (8, "C", 7),  # singleton domain: pct 0, den clamps to 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = {
        r.doc_id: r.pct_ppm
        for r in domain_quantile_calibration(df, "score", "source").collect()
    }
    # A: ranks 1,2,2,4,5 over n-1=4 -> 0, 250000, 250000, 750000, 1000000
    assert out[1] == 0 and out[2] == 250_000 and out[3] == 250_000
    assert out[4] == 750_000 and out[5] == 1_000_000
    assert out[6] == 0 and out[7] == 1_000_000
    assert out[8] == 0
    # domain-fair cutoff: keep top half -> survivors from BOTH domains
    keep = {d for d, p in out.items() if p >= 500_000}
    assert 4 in keep and 5 in keep and 7 in keep and 1 not in keep


def test_benford_audit(spark):
    import math

    from nexus_forge_spark.operators.profile import BENFORD_PPM, benford_audit

    # Benford-ish sample: powers-of-ish spread across magnitudes
    vals = [1.2, 13.0, 1.9, 175.0, 2.4, 31.0, 4.5, 1.07, 95.0, 2.22]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    # hand check digit 1: values 1.2, 13.0, 1.9, 175.0, 1.07 -> 5 of 10
    assert out[1].n == 5 and out[1].observed_ppm == 500_000
    assert out[1].benford_ppm == round(math.log10(2) * 1_000_000)
    assert out[1].abs_dev_ppm == 500_000 - 301_030
    assert out[3].n == 1 and out[7].n == 0
    assert sum(BENFORD_PPM) == 1_000_000


def test_group_gini(spark):
    from nexus_forge_spark.operators.profile import group_gini

    rows = (
        [("uniform", 5.0)] * 6
        + [("hot", 0.0)] * 5 + [("hot", 100.0)]
        + [("mid", 1.0), ("mid", 2.0), ("mid", 3.0), ("mid", 4.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.grp: r.gini_ppm for r in group_gini(df, "v", "g").collect()}
    assert out["uniform"] == 0
    # one key holds all mass in a group of 6: G = (n-1)/n = 5/6
    assert out["hot"] == 5 * 1_000_000 // 6
    # 1,2,3,4: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    assert out["mid"] == 250_000


def test_group_weighted_median(spark):
    from nexus_forge_spark.operators.profile import group_weighted_median

    rows = [
        # group A: value 1 carries most of the weight
        ("A", 1.0, 7), ("A", 100.0, 2), ("A", 200.0, 2),
        # group B: exact half boundary -> smallest v with 2*cum >= tot
        ("B", 1.0, 1), ("B", 2.0, 1), ("B", 3.0, 1), ("B", 4.0, 1),
        # group C: single row
        ("C", 9.5, 3),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = {
        r.grp: (r.wmedian_scaled, r.total_weight)
        for r in group_weighted_median(df, "v", "w", "g").collect()
    }
    # A: cum weight at v=1.0 is 7 and 2*7 >= 11, so the smallest value
    # already carries the median -> 1.0 = 100 scaled units
    assert out["A"] == (100, 11)
    # B: cum at 1.0 is 1 (2 < 4, not yet); at 2.0 it is 2 (4 >= 4) -> 200
    assert out["B"] == (200, 4)
    assert out["C"] == (950, 3)


def test_poisson_bootstrap_ci(spark):
    import hashlib

    from nexus_forge_spark.operators.profile import (
        POISSON1_CDF_PPM,
        poisson_bootstrap_ci,
    )

    vals = [(i, 100 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(vals, "doc_id long, x long")
    B = 16
    r = poisson_bootstrap_ci(df, "x", n_resamples=B).collect()[0]

    # pure-python replay
    def h60(s, salt="boot"):
        return int(hashlib.md5(f"{s}:{salt}".encode()).hexdigest()[:15], 16)

    def weight(doc_id, b):
        u = h60(f"{doc_id}#{b}") % 1_000_000
        for k, c in enumerate(POISSON1_CDF_PPM):
            if u < c:
                return k
        return 9

    means = []
    for b in range(B):
        swx = sum(weight(i, b) * x for i, x in vals)
        sw = sum(weight(i, b) for i, _ in vals)
        means.append(swx * 1_000_000 // sw)
    means.sort()
    assert r.n_rows == 200
    assert r.mean_micro == sum(x for _, x in vals) * 1_000_000 // 200
    assert r.lo_micro == means[0]          # element_at idx 1 (B//50 = 0 -> 1)
    assert r.med_micro == means[B // 2 - 1]
    assert r.hi_micro == means[B - 1]
    # the interval brackets the point estimate on this near-constant data
    assert r.lo_micro <= r.mean_micro <= r.hi_micro


# ------------------------------------------------------ mutual information


def test_mutual_information_independent_and_dependent(spark):
    import math

    from nexus_forge_spark.operators.profile import mutual_information

    # perfectly dependent: b == a -> MI == H(a) == ln 2, NMI == 1
    dep = spark.createDataFrame(
        [("x", "x")] * 4 + [("y", "y")] * 4, "u string, v string"
    )
    r = mutual_information(dep, "u", "v").collect()[0]
    assert abs(r.mi_micro - 1_000_000 * math.log(2)) <= 5
    assert r.h_a_micro == r.h_b_micro == r.mi_micro
    assert r.nmi_ppm == 1_000_000
    # independent uniform 2x2 -> MI ~ 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(3)],
        "u string, v string",
    )
    r2 = mutual_information(ind, "u", "v").collect()[0]
    assert abs(r2.mi_micro) <= 5
    assert abs(r2.h_a_micro - 1_000_000 * math.log(2)) <= 5


def test_mutual_information_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.profile import (
        mutual_information,
        sql_mutual_information,
    )

    rows = [(f"a{i % 3}", f"b{(i * 2 + i // 5) % 4}") for i in range(60)]
    df = spark.createDataFrame(rows, "u string, v string")
    got = [tuple(r) for r in mutual_information(df, "u", "v").collect()]
    ev = ", ".join(f"('{a}', '{b}')" for a, b in rows)
    sql = sql_mutual_information(
        f"SELECT * FROM (VALUES {ev}) AS t(u, v)", "u", "v"
    )
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == want


# ----------------------------------------------------------------- PSI


def test_psi_identical_is_zero_and_shift_is_positive(spark):
    from nexus_forge_spark.operators.profile import psi_report

    a = spark.createDataFrame([(i * 100,) for i in range(100)], "cents long")
    out = psi_report(a, a, "cents", 0, 10_000, bins=10).collect()
    assert sum(r.term_micro for r in out) == 0
    b = spark.createDataFrame([(i * 100 + 5_000,) for i in range(100)], "cents long")
    out2 = psi_report(a, b, "cents", 0, 10_000, bins=10).collect()
    assert sum(r.term_micro for r in out2) > 250_000  # > 0.25 = drifted


def test_psi_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.profile import psi_report, sql_psi_report

    ra = [((i * 37) % 1000,) for i in range(200)]
    rb = [((i * 53 + 100) % 1000,) for i in range(150)]
    a = spark.createDataFrame(ra, "cents long")
    b = spark.createDataFrame(rb, "cents long")
    got = sorted(tuple(r) for r in psi_report(a, b, "cents", 0, 1000, 8).collect())
    eva = ", ".join(f"({v})" for (v,) in ra)
    evb = ", ".join(f"({v})" for (v,) in rb)
    sql = sql_psi_report(
        f"SELECT * FROM (VALUES {eva}) AS t(cents)",
        f"SELECT * FROM (VALUES {evb}) AS t(cents)",
        "cents", 0, 1000, 8,
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
