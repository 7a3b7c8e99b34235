"""Mergeable-sketch operators: HLL / KMV / CountMin unit + property tests.

The estimator parity vs DuckDB is covered by the contract queries
(hll_distinct_bigrams / kmv_corpus_jaccard / cms_heavy_hitters); these
tests pin the sketch ALGEBRA — merge associativity, one-sided error,
exactness regimes — on hand-built inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_forge_spark.operators import sketches as SK


def _values(spark, vals, col="v"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} string")


# ------------------------------------------------------------------- HLL

def test_hll_merge_equals_sketch_of_union(spark):
    a = _values(spark, [f"a{i}" for i in range(500)])
    b = _values(spark, [f"b{i}" for i in range(300)] + [f"a{i}" for i in range(100)])
    sa = SK.hll_sketch(a, "v", precision=7)
    sb = SK.hll_sketch(b, "v", precision=7)
    merged = SK.hll_merge(sa.unionByName(sb))
    direct = SK.hll_sketch(a.unionByName(b), "v", precision=7)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_estimate_within_error_bound(spark):
    n = 2000
    df = _values(spark, [f"item-{i}" for i in range(n)])
    est = SK.hll_estimate(SK.hll_sketch(df, "v", precision=7), precision=7).collect()[0]
    # RSE for m=128 is ~1.04/sqrt(128) ~ 9.2%; allow 4 sigma
    assert abs(est["est_distinct"] - n) / n < 0.37


def test_hll_estimate_deterministic_and_grouped(spark):
    df = spark.createDataFrame(
        [("g1", f"x{i}") for i in range(400)] + [("g2", f"x{i}") for i in range(50)],
        "g string, v string",
    )
    regs = SK.hll_sketch(df, "v", ["g"], precision=7)
    out = {r["g"]: r["est_distinct"] for r in SK.hll_estimate(regs, ["g"], precision=7).collect()}
    out2 = {r["g"]: r["est_distinct"] for r in SK.hll_estimate(regs, ["g"], precision=7).collect()}
    assert out == out2
    assert out["g1"] > out["g2"] > 0


# ------------------------------------------------------------------- KMV

def test_kmv_exact_below_k(spark):
    df = _values(spark, [f"v{i}" for i in range(40)] * 3)  # 40 distinct, dup rows
    sig = SK.kmv_signature(df, "v", k=64)
    assert sig.count() == 40
    est = SK.kmv_distinct_estimate(sig, k=64).collect()[0]["est_distinct"]
    assert est == 40


def test_kmv_estimate_above_k(spark):
    n = 3000
    df = _values(spark, [f"v{i}" for i in range(n)])
    sig = SK.kmv_signature(df, "v", k=128)
    assert sig.count() == 128
    est = SK.kmv_distinct_estimate(sig, k=128).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 0.35  # RSE ~ 1/sqrt(k-2) ~ 9%, 4 sigma


def test_kmv_jaccard_identical_and_disjoint(spark):
    a = _values(spark, [f"v{i}" for i in range(200)])
    sig_a = SK.kmv_signature(a, "v", k=64)
    same = SK.kmv_jaccard(sig_a, sig_a, k=64).collect()[0]
    assert same["jaccard_ppm"] == 1_000_000
    b = _values(spark, [f"w{i}" for i in range(200)])
    sig_b = SK.kmv_signature(b, "v", k=64)
    disj = SK.kmv_jaccard(sig_a, sig_b, k=64).collect()[0]
    assert disj["n_both"] == 0 and disj["jaccard_ppm"] == 0


def test_kmv_jaccard_half_overlap(spark):
    a = _values(spark, [f"v{i}" for i in range(600)])
    b = _values(spark, [f"v{i}" for i in range(300, 900)])  # true J = 300/900 = 1/3
    ja = SK.kmv_jaccard(
        SK.kmv_signature(a, "v", k=128), SK.kmv_signature(b, "v", k=128), k=128
    ).collect()[0]
    assert 0.33 - 0.18 < ja["jaccard_ppm"] / 1e6 < 0.33 + 0.18


# -------------------------------------------------------------- CountMin

def test_cms_one_sided_error_and_row_sums(spark):
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    sketch = SK.countmin_sketch(df, "v", depth=4, width=64)
    # every row of the sketch preserves total mass
    per_row = {r["row"]: r["s"] for r in sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: 700, 1: 700, 2: 700, 3: 700}
    cand = spark.createDataFrame([("hot",), ("cold0",), ("absent",)], "v string")
    est = {r["v"]: r["cms_est"] for r in SK.countmin_lookup(sketch, cand, "v", depth=4, width=64).collect()}
    assert est["hot"] >= 500  # one-sided: never underestimates
    assert est["cold0"] >= 1
    # the absent key may collide but is bounded by eps * N (here generous)
    assert est["absent"] <= 700


def test_cms_merge_is_sum(spark):
    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 5, "v string")
    b = spark.createDataFrame([("x",)] * 7 + [("z",)] * 3, "v string")
    sa = SK.countmin_sketch(a, "v", depth=2, width=32)
    sb = SK.countmin_sketch(b, "v", depth=2, width=32)
    merged = (
        sa.unionByName(sb).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    direct = SK.countmin_sketch(a.unionByName(b), "v", depth=2, width=32)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 2)], "v string, w int")
    sketch = SK.countmin_sketch(df, "v", weight_col="w", depth=3, width=32)
    cand = spark.createDataFrame([("x",), ("y",)], "v string")
    est = {r["v"]: r["cms_est"] for r in SK.countmin_lookup(sketch, cand, "v", depth=3, width=32).collect()}
    assert est["x"] >= 12 and est["y"] >= 2


# ----------------------------------------------------------------- Bloom

def test_bloom_no_false_negatives_and_merge(spark):
    a = _values(spark, [f"a{i}" for i in range(300)])
    b = _values(spark, [f"b{i}" for i in range(200)])
    sa = SK.bloom_sketch(a, "v")
    sb = SK.bloom_sketch(b, "v")
    merged = SK.bloom_merge(sa.unionByName(sb))
    direct = SK.bloom_sketch(a.unionByName(b), "v")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # every inserted value must probe true (one-sided error)
    hits = SK.bloom_probe(merged, a.unionByName(b), "v").collect()
    assert all(r.maybe_present for r in hits)


def test_bloom_absent_values_mostly_rejected(spark):
    built = _values(spark, [f"in{i}" for i in range(200)])
    sketch = SK.bloom_sketch(built, "v")
    absent = _values(spark, [f"out{i}" for i in range(200)])
    res = SK.bloom_probe(sketch, absent, "v").collect()
    fp = sum(1 for r in res if r.maybe_present)
    # 200 keys * 4 hashes in 4096 bits -> load ~0.18, fp ~ (1-e^-0.2)^4 << 1%
    assert fp <= 5
    # determinism: same probe twice gives the identical verdict set
    res2 = SK.bloom_probe(sketch, absent, "v").collect()
    assert {(r.v, r.maybe_present) for r in res} == {
        (r.v, r.maybe_present) for r in res2
    }


def test_bloom_duckdb_parity(spark):
    import duckdb

    built = _values(spark, [f"tok{i}" for i in range(150)])
    probes = _values(spark, [f"tok{i}" for i in range(0, 300, 7)])
    mine = {
        r.v: r.maybe_present
        for r in SK.bloom_probe(SK.bloom_sketch(built, "v"), probes, "v").collect()
    }
    sql = SK.sql_bloom_probe(
        "SELECT 'tok' || CAST(i AS VARCHAR) AS v FROM generate_series(0,149) t(i)",
        "SELECT 'tok' || CAST(i AS VARCHAR) AS v "
        "FROM generate_series(0,299) t(i) WHERE i % 7 = 0",
        "v",
    )
    oracle = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert mine == oracle


def test_hdr_bin_python_spark_duck_agree(spark):
    import random

    import duckdb

    from nexus_forge_spark.operators import sketches as S

    rng = random.Random(5)
    vals = [0, 1, 15, 16, 17, 255, 256, 2**40, 2**62 - 1] + [
        rng.randint(0, 2**62 - 1) for _ in range(150)
    ]
    # python reference: exact small bins, monotone, bounded relative width
    for v in vals:
        b = S.hdr_bin_py(v)
        lb = S.hdr_lb_py(b)
        assert lb <= v
        if v >= 16:
            assert v - lb <= lb / 16 + 1  # one sub-bucket width
        else:
            assert lb == v
    assert all(
        S.hdr_bin_py(a) <= S.hdr_bin_py(b)
        for a, b in zip(sorted(vals), sorted(vals)[1:])
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    from pyspark.sql import functions as F

    got = df.select("v", F.expr(S.sql_hdr_bin("v", "spark")).alias("b")).collect()
    for r in got:
        assert r.b == S.hdr_bin_py(r.v), r.v
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    for v, b in con.execute(
        f"SELECT v, {S.sql_hdr_bin('v', 'duck')} FROM t"
    ).fetchall():
        assert b == S.hdr_bin_py(v), v


def test_hdr_merge_equals_direct_and_estimates_bounded(spark):
    import random

    from nexus_forge_spark.operators import sketches as S

    rng = random.Random(9)
    vals = [int(rng.lognormvariate(6, 1.5)) for _ in range(4000)]
    rows = [(i % 8, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "shard long, v long")
    direct = S.hdr_sketch(df, "v")
    sharded = S.hdr_merge(S.hdr_sketch(df, "v", ["shard"]).drop("shard"))
    a = sorted((r.qbin, r.cnt) for r in direct.collect())
    b = sorted((r.qbin, r.cnt) for r in sharded.collect())
    assert a == b
    qs = [500_000, 900_000, 990_000]
    est = {r.q_ppm: r.est for r in S.hdr_quantiles(direct, qs).collect()}
    sv = sorted(vals)
    for q in qs:
        exact = sv[max(0, -(-q * len(sv) // 1_000_000) - 1)]
        assert est[q] <= exact  # lower bound by construction
        assert exact - est[q] <= exact / 16 + 1  # within one sub-bucket


# ---------------------------------------------------------------- AMS F2


def test_ams_f2_tracks_true_self_join_size(spark):
    from nexus_forge_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    # skewed key set: one value 40x, twenty values 1x -> F2 = 1620
    rows = [("hot",)] * 40 + [(f"v{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "v string")
    est = ams_f2_estimate(ams_f2_sketch(df, "v", estimators=9)).collect()[0]
    true_f2 = 40 * 40 + 20
    assert est.n_estimators == 9
    # unbiased estimator, median of 9: within a factor ~2 on this skew
    assert true_f2 / 2 <= est.f2_est <= true_f2 * 2
    # uniform set of the same size: F2 = 60, far below the skewed F2
    uni = spark.createDataFrame([(f"u{i}",) for i in range(60)], "v string")
    est_u = ams_f2_estimate(ams_f2_sketch(uni, "v", estimators=9)).collect()[0]
    assert est_u.f2_est < est.f2_est


def test_ams_f2_matches_duckdb_and_merges(spark):
    import duckdb

    from nexus_forge_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
        sql_ams_f2,
    )

    rows = [(f"g{i % 2}", f"k{(i * 7) % 13}") for i in range(80)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = sorted(tuple(r) for r in ams_f2_estimate(
        ams_f2_sketch(df, "v", ["g"]), ["g"]).collect())
    ev = ", ".join(f"('{g}', '{v}')" for g, v in rows)
    sql = sql_ams_f2(f"SELECT * FROM (VALUES {ev}) AS t(g, v)", "v", ["g"])
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
    # mergeability: sketch(shard1) + sketch(shard2) summed == sketch(all)
    h1 = spark.createDataFrame(rows[:40], "g string, v string")
    h2 = spark.createDataFrame(rows[40:], "g string, v string")
    merged = (
        ams_f2_sketch(h1, "v", ["g"]).unionByName(ams_f2_sketch(h2, "v", ["g"]))
        .groupBy("g", "estimator").sum("z").withColumnRenamed("sum(z)", "z")
    )
    got_m = sorted(tuple(r) for r in ams_f2_estimate(merged, ["g"]).collect())
    assert got_m == got
