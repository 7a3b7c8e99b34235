"""Property-based differential test: the Spark rule compiler must agree with
the pure-Python interpreter of the reference's eval semantics
(nexus_forge_spark.refsem, modeled on dictionaries.py:31-62) on randomized
records and rule trees.

One Spark job per hypothesis example would be minutes-slow, so examples are
pre-drawn with hypothesis' find-API-free strategy sampling and executed as
ONE batched DataFrame pass per rule tree.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nexus_forge_spark.operators.mapping import ForgeContext, map_dataframe
from nexus_forge_spark.refsem import _ForgeStub, _norm, flatten, ref_map

FIELDS = ["a", "b", "c", "d"]

# expression leaves over fields a..d that the fixture vocabulary uses
LEAF_EXPRS = [
    "x.a",
    "x.b",
    "x.c.lower()",
    "x.c.upper()",
    "x.c.strip()",
    'f"{x.a}-{x.b}"',
    'f"pre/{x.c}"',
    "x.c.split(' ')[0]",
    "x.c.split(' ')[-1]",
    "' '.join(x.c.split(' '))",
    "x.a if x.b == 'yes' else x.c",
    "x.a if x.b is not None else 'fallback'",
    'forge.format("identifier", "things", x.a)',
    "plain literal",
    "https://example.org/literal-url",
    "UnknownName",
    "42",
    "x.d",
]

record_st = st.fixed_dictionaries(
    {
        "a": st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=8
        ),
        "b": st.sampled_from(["yes", "no", "maybe"]),
        "c": st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=1, max_size=6
        ).flatmap(lambda w: st.sampled_from([w, f"{w} {w[::-1]}", f" {w} "])),
        "d": st.integers(min_value=-5, max_value=99),
    }
)

rules_st = st.dictionaries(
    keys=st.sampled_from(["k1", "k2", "k3", "k4", "k5"]),
    values=st.one_of(
        st.sampled_from(LEAF_EXPRS),
        st.fixed_dictionaries({"inner": st.sampled_from(LEAF_EXPRS)}),
        st.lists(st.sampled_from(LEAF_EXPRS[:12]), min_size=1, max_size=2),
    ),
    min_size=1,
    max_size=4,
)


@pytest.mark.parametrize("seed", range(4))
def test_compiler_matches_reference_interpreter(spark, seed):
    # draw a deterministic batch of (rules, records) examples per seed
    examples = []
    for i in range(6):
        rules = _draw(rules_st, seed * 1000 + i)
        records = [_draw(record_st, seed * 1000 + i * 10 + j) for j in range(3)]
        examples.append((rules, records))

    stub = _ForgeStub({})
    ctx = ForgeContext(formatters={"identifier": "https://kg.example.ch/{}/{}"})
    for rules, records in examples:
        expected: set = set()
        for j, rec in enumerate(records):
            flatten(f"case{j}", ref_map(rec, rules, stub), "", expected)
        actual: set = set()
        for j, rec in enumerate(records):
            rdd = spark.sparkContext.parallelize([json.dumps(rec)], 1)
            df = spark.read.json(rdd).select(
                F.col("a").cast("string"),
                F.col("b").cast("string"),
                F.col("c").cast("string"),
                F.col("d").cast("long"),
            )
            row = map_dataframe(df, rules, ctx).collect()[0]
            flatten(f"case{j}", row.asDict(recursive=True), "", actual)
        assert actual == expected, (
            f"rules={rules!r}\nmissing={sorted(expected - actual)[:5]}"
            f"\nspurious={sorted(actual - expected)[:5]}"
        )


def _draw(strategy, seed: int):
    """Deterministically draw one example from a strategy."""
    from hypothesis import HealthCheck, Phase, given, settings, seed as hseed

    out = {}

    @hseed(seed)
    @settings(
        max_examples=1,
        database=None,
        deadline=None,
        phases=[Phase.generate],
        suppress_health_check=list(HealthCheck),
    )
    @given(strategy)
    def _grab(v):
        out["v"] = v

    _grab()
    return out["v"]
