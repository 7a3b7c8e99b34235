"""functions/intlog.py — the engine-exact fixed-point log.

Three-way differential: the Spark rendering, the DuckDB rendering, and the
pure-Python reference must agree BIT-EXACTLY on arbitrary BIGINTs (that is
the whole contract — the round-2 driver red cell `heldout_nll` came from
libm ULP drift in F.log), and the value must track true ln within a couple
of micro-nats.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from nexus_forge_spark.functions import intlog as IL

EDGES = [1, 2, 3, 4, 5, 7, 8, 100, 10**6, 2**30 - 1, 2**30, 2**30 + 1,
         2**31 - 1, 2**31, 2**31 + 1, 2**40, 2**62 - 1, (1 << 62) - 3]


def _pairs(n=120, seed=13):
    rng = random.Random(seed)
    vals = EDGES + [rng.randint(1, 2**62 - 1) for _ in range(n)]
    vals += [rng.randint(1, 10**7) for _ in range(n)]
    return [(a, rng.choice(vals)) for a in vals]


def test_python_reference_tracks_true_ln():
    worst = 0.0
    for a, b in _pairs():
        got = IL.ln_micro_py(a, b)
        worst = max(worst, abs(got - math.log(a / b) * 1e6))
    assert worst <= 2.0


def test_q30_div_reference_tracks_true_quotient():
    # tight accuracy is contracted for a <= b (probability ratios <= 1):
    # the b-downshift fallback then costs < 2^-30 relative
    for a, b in _pairs():
        if a > b:
            a, b = b, a
        got = IL.q30_div_py(a, b) / IL.Q30
        true = a / b
        assert abs(got - true) <= max(2e-9, true * 4e-9)


def test_duckdb_rendering_matches_python():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    pairs = _pairs()
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    sql = (
        f"SELECT x, y, {IL.lnq30_sql('x', 'duck')} AS lx,"
        f" {IL.q30_div_sql('x', 'y', 'duck')} AS qd,"
        f" {IL.ln_micro_sql('x', 'y', 'duck')} AS m FROM t"
    )
    for x, y, lx, qd, m in con.execute(sql).fetchall():
        assert lx == IL.lnq30_py(x), x
        assert qd == IL.q30_div_py(x, y), (x, y)
        assert m == IL.ln_micro_py(x, y), (x, y)


def test_spark_rendering_matches_python(spark):
    pairs = _pairs()
    df = spark.createDataFrame(pairs, "x long, y long")
    out = df.select(
        "x",
        "y",
        IL.lnq30_col("x").alias("lx"),
        IL.q30_div_col("x", "y").alias("qd"),
        IL.ln_micro_col("x", "y").alias("m"),
    ).collect()
    assert len(out) == len(pairs)
    for r in out:
        assert r.lx == IL.lnq30_py(r.x), r.x
        assert r.qd == IL.q30_div_py(r.x, r.y), (r.x, r.y)
        assert r.m == IL.ln_micro_py(r.x, r.y), (r.x, r.y)


def test_micro_from_l2_sign_symmetry():
    for a, b in _pairs(40):
        assert IL.ln_micro_py(a, b) == -IL.ln_micro_py(b, a)


@pytest.mark.parametrize("x,expect", [(1, 0), (2, IL.Q30), (4, 2 * IL.Q30)])
def test_lnq30_exact_powers(x, expect):
    assert IL.lnq30_py(x) == expect
