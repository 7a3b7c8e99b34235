"""SCD2 history construction and robust median/MAD outlier semantics
(engine parity is covered by the scd2_order_priority / outliers_acctbal
contract queries)."""

from datetime import datetime

from pyspark.sql import functions as F

from nexus_forge_spark.operators.history import scd2_history
from nexus_forge_spark.operators.profile import robust_outliers

SCHEMA = "k long, ts timestamp_ntz, v string, tb long"


def _d(day):
    return datetime(2024, 1, day)


def test_scd2_collapses_repeats(spark):
    rows = [
        (1, _d(1), "a", 10),
        (1, _d(2), "a", 11),  # repeat -> absorbed
        (1, _d(3), "b", 12),  # change -> version 2
        (1, _d(4), "b", 13),  # repeat -> absorbed
        (1, _d(5), "a", 14),  # back to a -> version 3 (runs, not values)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = scd2_history(df, ["k"], "ts", ["v"], tiebreak_cols=["tb"]).collect()
    got = sorted((r.version, r.v, r.valid_from, r.valid_to, r.is_current) for r in out)
    assert got == [
        (1, "a", _d(1), _d(3), False),
        (2, "b", _d(3), _d(5), False),
        (3, "a", _d(5), None, True),
    ]


def test_scd2_keys_independent_and_null_attr(spark):
    rows = [
        (1, _d(1), None, 1),
        (1, _d(2), None, 2),  # null == null (null-safe) -> absorbed
        (1, _d(3), "x", 3),
        (2, _d(1), "x", 4),  # other key independent
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = scd2_history(df, ["k"], "ts", ["v"], tiebreak_cols=["tb"])
    rows_out = {(r.k, r.version): (r.v, r.is_current) for r in out.collect()}
    assert rows_out == {
        (1, 1): (None, False),
        (1, 2): ("x", True),
        (2, 1): ("x", True),
    }


def test_scd2_same_ts_tiebreak(spark):
    # two changes at the identical timestamp order by the tiebreak column
    rows = [(1, _d(1), "a", 1), (1, _d(1), "b", 2), (1, _d(2), "b", 3)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = scd2_history(df, ["k"], "ts", ["v"], tiebreak_cols=["tb"]).collect()
    by_ver = {r.version: r.v for r in out}
    assert by_ver == {1: "a", 2: "b"}


def test_robust_outliers_flags_exact(spark):
    # group 7: values 1..9 plus 100 -> median 5.5 (even count),
    # med2 = 11; devs2 = |2v-11| = 9,7,5,3,1,1,3,5,7,189 -> sorted
    # [1,1,3,3,5,5,7,7,9,189], mad2' = 5, mad4 = 10.
    # outlier iff 2*|2v-11| > 3*10=30 <=> |2v-11| > 15 <=> v=100 only.
    rows = [(7, float(v)) for v in range(1, 10)] + [(7, 100.0)]
    df = spark.createDataFrame(rows, "g int, x double")
    out = robust_outliers(df, "x", ["g"], scale=1, k=3).collect()
    flagged = sorted(r.x for r in out if r.is_outlier)
    assert flagged == [100.0]
    one = out[0]
    assert one.med2 == 11 and one.mad4 == 10


def test_robust_outliers_groups_isolated(spark):
    # a value ordinary in one group is an outlier in another
    rows = [(1, float(v)) for v in [10, 11, 12, 13, 50]] + [
        (2, float(v)) for v in [40, 45, 50, 55, 60]
    ]
    df = spark.createDataFrame(rows, "g int, x double")
    out = robust_outliers(df, "x", ["g"], scale=1, k=3).collect()
    flagged = sorted((r.g, r.x) for r in out if r.is_outlier)
    assert flagged == [(1, 50.0)]


def test_robust_outliers_keeps_all_rows(spark):
    df = spark.createDataFrame([(1, 2.5), (1, 3.5), (2, 9.0)], "g int, x double")
    out = robust_outliers(df, "x", ["g"], scale=100)
    assert out.count() == 3
    assert {r.value_units for r in out.collect()} == {250, 350, 900}


def test_scd2_merge_appendonly_equals_full(spark):
    # base events before t=5, delta after; merge == full recompute
    from nexus_forge_spark.operators.history import scd2_merge

    events = [
        (1, _d(1), "a", 0), (1, _d(2), "a", 0), (1, _d(3), "b", 0),
        (1, _d(6), "b", 0), (1, _d(7), "c", 0),
        (2, _d(2), "x", 0), (2, _d(8), "y", 0),
        (3, _d(1), "q", 0),  # untouched by the delta
    ]
    df = spark.createDataFrame(events, SCHEMA).select("k", "ts", "v")
    base = scd2_history(df.where(F.col("ts") < _d(5)), ["k"], "ts", ["v"])
    delta = df.where(F.col("ts") >= _d(5))
    merged = scd2_merge(base, delta, ["k"], "ts", ["v"])
    full = scd2_history(df, ["k"], "ts", ["v"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_scd2_merge_untouched_rows_pass_through(spark):
    from nexus_forge_spark.operators.history import scd2_merge

    df = spark.createDataFrame(
        [(1, _d(1), "a", 0), (2, _d(1), "x", 0)], SCHEMA
    ).select("k", "ts", "v")
    base = scd2_history(df, ["k"], "ts", ["v"])
    delta = spark.createDataFrame([(2, _d(3), "y", 0)], SCHEMA).select(
        "k", "ts", "v"
    )
    merged = {(r.k, r.version): (r.v, r.is_current)
              for r in scd2_merge(base, delta, ["k"], "ts", ["v"]).collect()}
    assert merged == {
        (1, 1): ("a", True),
        (2, 1): ("x", False),
        (2, 2): ("y", True),
    }


def test_equidepth_histogram_exact_buckets(spark):
    from nexus_forge_spark.operators.profile import equidepth_histogram

    # 10 values, 4 buckets; (rn-1)*4 div 10 -> sizes 3,2,3,2
    rows = [(float(v),) for v in [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]]
    df = spark.createDataFrame(rows, "x double")
    out = {r.bucket: (r.n, r.lo_scaled, r.hi_scaled)
           for r in equidepth_histogram(df, "x", buckets=4, scale=1).collect()}
    assert out == {
        0: (3, 1, 3),
        1: (2, 4, 5),
        2: (3, 6, 8),
        3: (2, 9, 10),
    }


def test_equidepth_histogram_tie_straddle_deterministic(spark):
    from nexus_forge_spark.operators.profile import equidepth_histogram

    # four equal values over two buckets: min/max of both buckets pinned
    df = spark.createDataFrame([(2.0,)] * 4, "x double")
    out = {r.bucket: (r.n, r.lo_scaled, r.hi_scaled)
           for r in equidepth_histogram(df, "x", buckets=2, scale=1).collect()}
    assert out == {0: (2, 2, 2), 1: (2, 2, 2)}


def test_fold_scd2_batch_retry_reads_earlier_snapshot(spark, tmp_path):
    """A retry of SCD2 batch N must fold from snap_{N-1}, never its own
    snap_N, and must reproduce the identical dimension (exactly-once in
    effect)."""
    import os

    from nexus_forge_spark.streaming.stream_pipeline import fold_scd2_batch

    dim_dir = str(tmp_path / "dim")
    b0 = spark.createDataFrame(
        [(1, _d(1), "a", 0), (1, _d(2), "b", 0)], SCHEMA
    ).select("k", "ts", "v")
    b1 = spark.createDataFrame([(1, _d(3), "c", 0)], SCHEMA).select(
        "k", "ts", "v"
    )
    fold_scd2_batch(b0, 0, dim_dir, ["k"], "ts", ["v"])
    fold_scd2_batch(b1, 1, dim_dir, ["k"], "ts", ["v"])
    path = os.path.join(dim_dir, "snap_0000000001")
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    fold_scd2_batch(b1, 1, dim_dir, ["k"], "ts", ["v"])  # retry
    again = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == again
    vers = {r.version: (r.v, r.is_current)
            for r in spark.read.parquet(path).collect()}
    assert vers == {1: ("a", False), 2: ("b", False), 3: ("c", True)}


# ------------------------------------------------------ interval coalesce


def test_interval_coalesce_merges_touching_keeps_gaps(spark):
    from nexus_forge_spark.operators.history import interval_coalesce

    rows = [
        ("s1", 0, 10), ("s1", 10, 20),   # touching -> one run [0,20)
        ("s1", 5, 12),                   # contained/overlap -> same run
        ("s1", 30, 40),                  # gap -> second run
        ("s2", 0, 100), ("s2", 50, 60),  # contained -> one run
    ]
    df = spark.createDataFrame(rows, "k string, start_us long, end_us long")
    out = sorted(
        (r.k, r.start_us, r.end_us, r.n_merged)
        for r in interval_coalesce(df, ["k"]).collect()
    )
    assert out == [
        ("s1", 0, 20, 3),
        ("s1", 30, 40, 1),
        ("s2", 0, 100, 2),
    ]


def test_interval_coalesce_matches_duckdb(spark):
    import duckdb

    from nexus_forge_spark.operators.history import (
        interval_coalesce,
        sql_interval_coalesce,
    )

    rows = [
        (f"k{i % 4}", (i * 13) % 50, (i * 13) % 50 + 3 + (i % 5))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k string, start_us long, end_us long")
    got = sorted(tuple(r) for r in interval_coalesce(df, ["k"]).collect())
    ev = ", ".join(f"('{k}', {s}, {e})" for k, s, e in rows)
    sql = sql_interval_coalesce(
        f"SELECT * FROM (VALUES {ev}) AS t(k, start_us, end_us)", ["k"]
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_psi_empty_side_degenerates_identically(spark):
    """Round-3 ADVICE: with one side empty, both engines must agree
    (epsilon-floor ppm) instead of Spark yielding null-skipped values
    while DuckDB raises division-by-zero."""
    import duckdb

    from nexus_forge_spark.operators.profile import psi_report, sql_psi_report

    a = spark.createDataFrame([(100,), (250,), (900,)], "cents long")
    b = a.where(F.lit(False))
    got = sorted(
        tuple(r) for r in psi_report(a, b, "cents", 0, 1000, bins=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE ta(cents BIGINT)")
    con.executemany("INSERT INTO ta VALUES (?)", [(100,), (250,), (900,)])
    con.execute("CREATE TABLE tb(cents BIGINT)")
    want = sorted(
        con.execute(
            sql_psi_report(
                "SELECT cents FROM ta", "SELECT cents FROM tb", "cents", 0, 1000, 4
            )
        ).fetchall()
    )
    assert got == want
    assert all(r[4] == 1 for r in got)  # empty side floors at 1 ppm


def test_winsorized_group_stats_hand_case(spark):
    from nexus_forge_spark.operators.profile import winsorized_group_stats

    # one group, values 1..20 plus an extreme outlier 1000
    rows = [("g", float(v)) for v in list(range(1, 21)) + [1000]]
    df = spark.createDataFrame(rows, "g string, x double")
    out = winsorized_group_stats(df, "g", "x", lo_pct=5, hi_pct=95, scale=1).collect()[0]
    # n=21: p5 at rank ceil(21*0.05)=2 -> 2; p95 at rank ceil(19.95)=20 -> 20
    assert out.n == 21
    assert out.p_lo_scaled == 2 and out.p_hi_scaled == 20
    # winsorized: 1->2 and 1000->20; sum = (2..20 summed) + 2 + 20
    wins = (sum(range(2, 21)) + 2 + 20) // 21
    assert out.winsorized_mean_scaled == wins
    # trimmed: values in [2, 20] -> 2..20
    assert out.n_trimmed == 19
    assert out.trimmed_mean_scaled == sum(range(2, 21)) // 19


def test_embedding_drift_zero_on_identical_releases(spark):
    from nexus_forge_spark.operators.profile import embedding_drift

    emb = spark.createDataFrame(
        [(i, [0.1 * i, -0.2, 0.5]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_drift(emb, emb).collect()
    assert len(out) == 3
    assert all(r.shift_micro == 0 and r.drift_ppm == 0 for r in out)
    assert all(r.n_a == 10 and r.n_b == 10 for r in out)
