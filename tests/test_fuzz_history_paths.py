"""Randomized differentials for the session-8 stateful operators:
scd2_history / scd2_merge against a pure-Python interval builder, and
sssp against a pure-Python Bellman-Ford — independent reference
implementations, random inputs, exact equality."""

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from nexus_forge_spark.operators.graph import sssp
from nexus_forge_spark.operators.history import scd2_history, scd2_merge


def _py_scd2(events):
    """Reference SCD2: events = [(k, ts, v)]; returns the interval set
    {(k, v, version, valid_from, valid_to, is_current)}."""
    out = set()
    by_key = {}
    for k, ts, v in events:
        by_key.setdefault(k, []).append((ts, v))
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1] if e[1] is not None else ""))
        runs = []
        for ts, v in evs:
            if not runs or runs[-1][1] != v:
                runs.append((ts, v))
        for i, (ts, v) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            out.add((k, v, i + 1, ts, nxt, nxt is None))
    return out


def _rand_events(rng, n_keys=6, n_events=60):
    vals = ["a", "b", "c"]
    t0 = datetime(2024, 1, 1)
    evs = []
    for _ in range(n_events):
        k = rng.randrange(n_keys)
        ts = t0 + timedelta(days=rng.randrange(30))
        evs.append((k, ts, rng.choice(vals)))
    # drop same-(key, ts) collisions with different values: tie order is a
    # declared tiebreak choice, not part of the differential
    seen = {}
    out = []
    for k, ts, v in evs:
        if (k, ts) in seen:
            continue
        seen[(k, ts)] = v
        out.append((k, ts, v))
    return out


def test_fuzz_scd2_history_matches_python(spark):
    rng = random.Random(42)
    for trial in range(3):
        evs = _rand_events(rng)
        df = spark.createDataFrame(evs, "k long, ts timestamp_ntz, v string")
        got = {
            (r.k, r.v, r.version, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(df, ["k"], "ts", ["v"]).collect()
        }
        assert got == _py_scd2(evs), f"trial {trial}"


def test_fuzz_scd2_merge_appendonly_equals_full(spark):
    rng = random.Random(7)
    t0 = datetime(2024, 1, 1)
    for trial in range(3):
        evs = _rand_events(rng)
        cutoff = t0 + timedelta(days=rng.randrange(5, 25))
        df = spark.createDataFrame(evs, "k long, ts timestamp_ntz, v string")
        base = scd2_history(df.where(F.col("ts") < F.lit(cutoff)), ["k"], "ts", ["v"])
        delta = df.where(F.col("ts") >= F.lit(cutoff))
        merged = {
            tuple(r) for r in scd2_merge(base, delta, ["k"], "ts", ["v"]).collect()
        }
        full = {tuple(r) for r in scd2_history(df, ["k"], "ts", ["v"]).collect()}
        assert merged == full, f"trial {trial} cutoff {cutoff}"


def _py_bellman_ford(edges, seeds, rounds):
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < new.get(b, float("inf")):
                new[b] = dist[a] + w
        dist = new
    return dist


def test_fuzz_sssp_matches_python(spark):
    rng = random.Random(99)
    for trial in range(3):
        n = 12
        edges = []
        for _ in range(30):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                w = rng.randrange(1, 10)
                edges.append((a, b, w))
                edges.append((b, a, w))
        seeds = [0, rng.randrange(n)]
        rounds = 5
        e = spark.createDataFrame(edges, "src long, dst long, w long")
        s = spark.createDataFrame([(x,) for x in set(seeds)], "node long")
        got = {r.node: r.dist for r in sssp(e, s, rounds=rounds).collect()}
        assert got == _py_bellman_ford(edges, set(seeds), rounds), f"trial {trial}"
