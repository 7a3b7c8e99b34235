"""Edit-distance similarity join: randomized differential vs brute force.

The PassJoin segment pigeonhole is exactly the kind of off-by-one-rich
arithmetic the round-1 ADVICE flagged in PPJoin — so the ground truth
here is a pure-Python O(n^2) levenshtein sweep over adversarially short
random strings (lengths 0..8 over a 2-3 letter alphabet maximizes
collision density and exercises the zero-length-segment and short-string
branches).
"""

from __future__ import annotations

import random

import pytest

from nexus_forge_spark.operators.editjoin import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ta), (ib, tb) = rows[i], rows[j]
            dist = _lev(ta, tb)
            if dist <= d:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, dist))
    return out


@pytest.mark.parametrize("d,alpha,seed", [(1, "ab", 7), (2, "abc", 13)])
def test_editjoin_differential_random(spark, d, alpha, seed):
    rng = random.Random(seed)
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8))))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, max_dist=d).collect()
    }
    assert got == _brute(rows, d)


def test_editjoin_typo_mutants(spark):
    names = [
        "forest chiffon goldenrod",
        "misty lace thistle drab",
        "linen antique violet",
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    # drop the 5th char -> ed == 1 from the original
    rows += [(100 + i, n[:4] + n[5:]) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, max_dist=1).collect()
    }
    assert got == {(0, 100, 1), (1, 101, 1), (2, 102, 1)}


def test_editjoin_d0_is_exact_match(spark):
    rows = [(1, "aa"), (2, "aa"), (3, "ab"), (4, "")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, max_dist=0).collect()
    }
    assert got == {(1, 2, 0)}
