"""KG-embedding negative sampling (operators/kge.py).

Differential oracle: a pure-Python re-derivation of the hash-indexed draw
(same md5/60-bit construction as sketches.hash60) over the same positives,
entity vocabulary, and filtering discipline.
"""

import hashlib

from pyspark.sql import functions as F

from nexus_forge_spark.operators.kge import negative_samples


def py_hash60(s: str, salt: str) -> int:
    return int(hashlib.md5(f"{s}:{salt}".encode()).hexdigest()[:15], 16)


POSITIVES = [
    ("doc:1", "nsg:hasBody", "e:alpha"),
    ("doc:1", "nsg:hasBody", "e:beta"),
    ("doc:2", "nsg:hasBody", "e:alpha"),
    ("doc:3", "nsg:hasBody", "e:gamma"),
    ("doc:3", "nsg:hasBody", "e:delta"),
    ("doc:4", "nsg:hasBody", "e:epsilon"),
]


def py_negatives(positives, k, salt, filtered=True):
    ents = sorted({o for _, _, o in positives})
    n = len(ents)
    pos = set(positives)
    out = set()
    for s, p, o in positives:
        for j in range(k):
            draw = py_hash60("\x1f".join([s, p, o, str(j)]), salt) % n
            neg = ents[draw]
            if neg == o:
                continue
            if filtered and (s, p, neg) in pos:
                continue
            out.add((s, p, neg, j))
    return out


def run_spark(spark, k, filtered=True):
    trip = spark.createDataFrame(POSITIVES, ["subj", "pred", "obj"])
    got = negative_samples(trip, k=k, salt="kge", filtered=filtered)
    return {tuple(r) for r in got.collect()}


def test_differential_vs_python(spark):
    assert run_spark(spark, k=3) == py_negatives(POSITIVES, 3, "kge")


def test_unfiltered_keeps_positive_collisions(spark):
    got = run_spark(spark, k=4, filtered=False)
    assert got == py_negatives(POSITIVES, 4, "kge", filtered=False)
    assert got >= py_negatives(POSITIVES, 4, "kge", filtered=True)


def test_deterministic_across_runs(spark):
    assert run_spark(spark, k=3) == run_spark(spark, k=3)


def test_filtered_negatives_never_positive(spark):
    got = run_spark(spark, k=5)
    pos = set(POSITIVES)
    assert got
    for s, p, o, _ in got:
        assert (s, p, o) not in pos


def test_at_most_k_per_positive(spark):
    got = run_spark(spark, k=3)
    from collections import Counter

    per = Counter((s, p) for s, p, _, _ in got)
    # doc:1 has two positives -> up to 6 slots
    for (s, p), c in per.items():
        n_pos = sum(1 for ps, pp, _ in POSITIVES if (ps, pp) == (s, p))
        assert c <= 3 * n_pos


def test_explicit_entity_vocabulary(spark):
    trip = spark.createDataFrame(POSITIVES, ["subj", "pred", "obj"])
    ents = spark.createDataFrame(
        [("e:zeta",), ("e:eta",)], ["entity_id"]
    )
    got = {
        tuple(r)
        for r in negative_samples(trip, k=2, entities=ents, salt="s2").collect()
    }
    assert got
    assert {o for _, _, o, _ in got} <= {"e:zeta", "e:eta"}
