"""Property-based differential test: the Spark resolver joins must agree
with the pure-Python DemoResolver interpreter (nexus_forge_spark.refsem,
modeled on demo_resolver.py:41-110) on randomized dictionaries and mention
sets, across all four strategies."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from nexus_forge_spark.operators import resolve as R
from nexus_forge_spark.refsem import ALL, BEST, EXACT, EXACT_CI, demo_resolve

WORDS = ["alpha", "beta", "gamma", "delta", "sort", "merge", "join", "scan", "Hash"]


def _random_dict(rnd: random.Random, n: int) -> list[dict]:
    rows = []
    for i in range(n):
        label = " ".join(rnd.sample(WORDS, rnd.randint(1, 3)))
        rows.append(
            {
                "id": f"e{i}",
                "type": rnd.choice(["Class", "Other"]),
                "label": label,
                "acronym": (
                    "".join(w[0].upper() for w in label.split()) if rnd.random() < 0.5 else None
                ),
                "deprecated": rnd.random() < 0.15,
            }
        )
    return rows


def _mentions(rnd: random.Random, rows: list[dict]) -> list[str]:
    out = set()
    for r in rows:
        out.add(r["label"])
        out.add(r["label"].upper())
        out.add(r["label"].split()[0])
        if r["acronym"]:
            out.add(r["acronym"].lower())
    out.update(rnd.sample(WORDS, 3))
    out.add("zz-decoy")
    return sorted(out)


def _dim_df(spark, rows):
    schema = T.StructType(
        [
            T.StructField("dict_idx", T.IntegerType()),
            T.StructField("id", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("label", T.StringType()),
            T.StructField("acronym", T.StringType()),
            T.StructField("deprecated", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(
        [
            (i, r["id"], r["type"], r["label"], r["acronym"], r["deprecated"])
            for i, r in enumerate(rows)
        ],
        schema,
    )


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_resolver_matches_interpreter(spark, seed):
    rnd = random.Random(seed)
    rows = _random_dict(rnd, 25)
    mentions = _mentions(rnd, rows)
    mdf = spark.createDataFrame([(m,) for m in mentions], "mention string")
    alias = R.build_alias_table(_dim_df(spark, rows), ["label", "acronym"])

    for strategy in (EXACT, EXACT_CI, BEST, ALL):
        actual = {
            (r.mention, r.rank): (r.entity_id, r.score)
            for r in R.resolve(mdf, alias, strategy, keys=["mention"]).collect()
        }
        expected = {}
        for m in mentions:
            hit = demo_resolve(rows, m, strategy)
            if strategy == ALL:
                for shaped, score, rank in hit:
                    expected[(m, rank)] = (shaped["id"], score)
            elif hit is not None:
                shaped, score, rank = hit
                expected[(m, 1)] = (shaped["id"], score)
        assert actual == expected, (
            f"strategy={strategy}\n"
            f"missing={sorted(set(expected) - set(actual))[:5]}\n"
            f"spurious={sorted(set(actual) - set(expected))[:5]}"
        )
