"""global_row_numbers: exact global ranks with no SinglePartition exchange."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nexus_forge_spark.operators.ranking import global_row_numbers


def test_matches_sorted_enumeration(spark):
    rng = random.Random(11)
    data = [(i, rng.randint(0, 10_000)) for i in range(500)]
    df = spark.createDataFrame(data, "id long, v long")
    got = {
        r["id"]: r["rn"]
        for r in global_row_numbers(df, ["v", "id"], num_partitions=7).collect()
    }
    want = {
        id_: i + 1
        for i, (id_, _v) in enumerate(sorted(data, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_descending_and_ties(spark):
    data = [(1, 5), (2, 5), (3, 9), (4, 1)]
    df = spark.createDataFrame(data, "id long, v long")
    out = global_row_numbers(
        df, [F.col("v").desc(), F.col("id")], num_partitions=3
    )
    got = {r["id"]: r["rn"] for r in out.collect()}
    assert got == {3: 1, 1: 2, 2: 3, 4: 4}


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert global_row_numbers(df, ["v"]).collect() == []


def test_single_partition_exchange_absent(spark):
    df = spark.range(1000).withColumn("v", F.pmod(F.col("id") * 37, F.lit(997)))
    out = global_row_numbers(df, ["v", "id"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale trap this operator replaces would show Exchange SinglePartition
    assert "SinglePartition" not in plan
    assert out.count() == 1000


def test_exact_percentiles_match_sorted_reference(spark):
    import math
    import random

    rng = random.Random(3)
    vals = [rng.randint(0, 1000) for _ in range(777)] + [5, 5, 5, 5]  # ties
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ps = [1, 25, 50, 75, 90, 99, 100]
    from nexus_forge_spark.operators.ranking import exact_percentiles

    got = {r["p"]: r["value"] for r in exact_percentiles(df, "v", ps).collect()}
    s = sorted(vals)
    n = len(s)
    want = {p: s[max(1, (p * n + 99) // 100) - 1] for p in ps}
    assert got == want
    # integer rank arithmetic: float ceil(0.7 * n) would mis-round here
    assert (70 * 10 + 99) // 100 == 7 and math.ceil(0.7 * 10) == 7


def test_exact_percentiles_empty(spark):
    from nexus_forge_spark.operators.ranking import exact_percentiles

    df = spark.createDataFrame([], "v long")
    assert exact_percentiles(df, "v", [50]).collect() == []


def _brute_frontier(points):
    out = set()
    for i, (pid, mn, mx) in enumerate(points):
        dominated = any(
            qmn <= mn and qmx >= mx and (qmn < mn or qmx > mx)
            for j, (_q, qmn, qmx) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.add(pid)
    return out


def test_pareto_audit_matches_bruteforce(spark):
    import random

    from nexus_forge_spark.operators.ranking import pareto_audit_2d

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 40), rng.randint(0, 40)) for i in range(300)]
    # duplicates + same-minimize ties must be exercised
    pts += [(1000, pts[0][1], pts[0][2]), (1001, pts[1][1], pts[1][2] + 1)]
    df = spark.createDataFrame(pts, "id long, mn long, mx long")
    got = {
        r["id"]
        for r in pareto_audit_2d(df, "mn", "mx", num_partitions=5)
        .filter("on_frontier")
        .collect()
    }
    assert got == _brute_frontier(pts)


def test_pareto_audit_ties_and_nulls(spark):
    from nexus_forge_spark.operators.ranking import pareto_audit_2d

    rows = [(1, 10, 5), (2, 10, 5), (3, 10, 4), (4, 9, 5), (5, None, 7)]
    df = spark.createDataFrame(rows, "id long, mn long, mx long")
    out = {r["id"]: r["on_frontier"] for r in pareto_audit_2d(df, "mn", "mx").collect()}
    # duplicates (1,2) don't dominate each other but 4 dominates both;
    # null axis rows are excluded entirely
    assert out == {1: False, 2: False, 3: False, 4: True}


def test_pareto_audit_no_single_partition_exchange(spark):
    from nexus_forge_spark.operators.ranking import pareto_audit_2d

    df = spark.range(2000).select(
        F.col("id"),
        F.pmod(F.col("id") * 13, F.lit(211)).alias("mn"),
        F.pmod(F.col("id") * 29, F.lit(193)).alias("mx"),
    )
    out = pareto_audit_2d(df, "mn", "mx", num_partitions=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the naive skyline window would be Window(ORDER BY) = SinglePartition
    assert "SinglePartition" not in plan
    assert out.count() == 2000
