from __future__ import annotations

import duckdb

from nexus_forge_spark.operators.kge import ranking_eval, sql_ranking_eval


def _sql_rows(rows, cols):
    return " UNION ALL ".join(
        "SELECT "
        + ", ".join(
            (f"'{v}' AS {c}" if isinstance(v, str) else f"{v} AS {c}")
            for v, c in zip(r, cols)
        )
        for r in rows
    )


SCORED = [
    ("q1", "a", 50), ("q1", "b", 40), ("q1", "c", 30), ("q1", "t", 35),
    ("q2", "x", 10), ("q2", "t", 90),
    ("q3", "m", 5),  # q3's true candidate is unscored
]
TEST = [("q1", "t"), ("q2", "t"), ("q3", "t")]
TRAIN = [("q1", "a")]  # a known positive: must not count as beating t


def test_filtered_ranks(spark):
    scored = spark.createDataFrame(SCORED, "q string, cand string, score long")
    test = spark.createDataFrame(TEST, "q string, true_cand string")
    train = spark.createDataFrame(TRAIN, "q string, cand string")
    r = ranking_eval(scored, test, train).collect()[0]
    # q1: beaten by b(40) only — a(50) filtered, c(30) below -> rank 2
    # q2: rank 1; q3: unscored true -> beaten by m(5) -> rank 2
    assert r.n_test == 3
    assert r.hits1_ppm == 1_000_000 // 3
    assert r.hits3_ppm == 1_000_000
    # mrr: (1/2 + 1 + 1/2)/3 = 2/3
    assert abs(r.mrr_ppm - 666_666) <= 1


def test_unfiltered_counts_known_positives(spark):
    scored = spark.createDataFrame(SCORED, "q string, cand string, score long")
    test = spark.createDataFrame(TEST, "q string, true_cand string")
    r = ranking_eval(scored, test, None).collect()[0]
    # q1 now also beaten by a -> rank 3
    assert r.hits1_ppm == 1_000_000 // 3
    # mrr: (1/3 + 1 + 1/2)/3
    assert abs(r.mrr_ppm - 611_111) <= 1


def test_tiebreak_is_pessimistic_lexicographic(spark):
    scored = spark.createDataFrame(
        [("q", "aa", 7), ("q", "zz", 7), ("q", "t", 7)],
        "q string, cand string, score long",
    )
    test = spark.createDataFrame([("q", "t")], "q string, true_cand string")
    r = ranking_eval(scored, test).collect()[0]
    # 'aa' < 't' beats on tie; 'zz' does not -> rank 2
    assert r.hits1_ppm == 0 and r.hits3_ppm == 1_000_000


def test_ranking_eval_oracle(spark):
    scored = spark.createDataFrame(SCORED, "q string, cand string, score long")
    test = spark.createDataFrame(TEST, "q string, true_cand string")
    train = spark.createDataFrame(TRAIN, "q string, cand string")
    for with_train in (True, False):
        got = ranking_eval(scored, test, train if with_train else None).collect()[0]
        want = (
            duckdb.connect()
            .execute(
                sql_ranking_eval(
                    _sql_rows(SCORED, ["q", "cand", "score"]),
                    _sql_rows(TEST, ["q", "true_cand"]),
                    _sql_rows(TRAIN, ["q", "cand"]) if with_train else None,
                )
            )
            .fetchall()[0]
        )
        assert tuple(got) == want
