"""Sorted-neighborhood blocking: randomized differential vs a Python
reference over adversarial keys (heavy ties force the id tiebreak to
decide the order — the case where a nondeterministic ranking would
scramble the pair set)."""

from __future__ import annotations

import random

import pytest

from nexus_forge_spark.operators.blocking import sorted_neighborhood_pairs


def _brute(rows: list[tuple[int, str]], w: int) -> set[tuple[int, int, int, int]]:
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, _) in enumerate(ordered):
        for j in range(i + 1, min(i + w, len(ordered) - 1) + 1):
            out.add((ida, ordered[j][0], i + 1, j + 1))
    return out


@pytest.mark.parametrize("w,seed", [(1, 3), (4, 11), (7, 29)])
def test_snm_differential_random(spark, w, seed):
    rng = random.Random(seed)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 3))))
        for i in range(83)
    ]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        (r.id_a, r.id_b, r.rn_a, r.rn_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=w).collect()
    }
    assert got == _brute(rows, w)


def test_snm_window_larger_than_input(spark):
    rows = [(1, "b"), (2, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=10).collect()
    }
    assert got == {(2, 1), (2, 3), (1, 3)}
