"""Reshape/collect_values semantics + streaming pipeline end-to-end."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nexus_forge_spark.operators.reshape import collect_values, reshape
from nexus_forge_spark.sources import flat_to_interleaved, load_table


def _nested(spark):
    return spark.createDataFrame(
        [
            (
                "p1",
                "Person",
                ("Jane", ("Org", "o1")),
                [("c1", ["a", "b"]), ("c2", ["c"])],
                2,
            )
        ],
        "id string, type string,"
        "agent struct<name:string, employer:struct<type:string, id:string>>,"
        "contribution array<struct<id:string, tags:array<string>>>, _rev int",
    )


def test_reshape_keeps_nested_paths(spark):
    out = reshape(_nested(spark), ["id", "agent.name", "agent.employer.id"])
    assert out.schema.simpleString() == (
        "struct<id:string,agent:struct<name:string,employer:struct<id:string>>>"
    )
    r = out.collect()[0]
    assert r.id == "p1" and r.agent.name == "Jane" and r.agent.employer.id == "o1"


def test_reshape_versioned(spark):
    out = reshape(_nested(spark), ["id", "type"], versioned=True)
    assert out.collect()[0].id == "p1?_version=2"


def test_collect_values_through_arrays(spark):
    df = _nested(spark)
    assert collect_values(df, "contribution.id").collect()[0].values == ["c1", "c2"]
    assert collect_values(df, "contribution.tags").collect()[0].values == ["a", "b", "c"]
    assert collect_values(df, "agent.employer.id").collect()[0].values == ["o1"]
    with pytest.raises(AttributeError):
        collect_values(df, "agent.missing")


def test_collect_values_constraint(spark):
    df = _nested(spark)
    assert collect_values(df, "id", constraint=("type", "Person")).count() == 1
    assert collect_values(df, "id", constraint=("type", "Nope")).count() == 0


def test_stream_construct_kg_matches_batch(spark, sf_dir):
    from nexus_forge_spark.plans.pipeline import construct_kg
    from nexus_forge_spark.streaming.stream_pipeline import stream_construct_kg

    base = tempfile.mkdtemp()
    try:
        in_path, out_path, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
        docs = flat_to_interleaved(load_table(spark, "documents", sf_dir))
        docs.write.parquet(in_path)

        q = stream_construct_kg(spark, in_path, out_path, ckpt)
        q.awaitTermination(120)

        streamed = {
            (r.subj, r.pred, r.obj)
            for r in spark.read.parquet(out_path).select("subj", "pred", "obj").collect()
        }
        batch = {(r.subj, r.pred, r.obj) for r in construct_kg(docs).collect()}
        assert streamed == batch

        # restart with same checkpoint: no duplicate batches
        q2 = stream_construct_kg(spark, in_path, out_path, ckpt)
        q2.awaitTermination(60)
        assert spark.read.parquet(out_path).count() == len(streamed)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_event_counts_watermark(spark, sf_dir):
    from nexus_forge_spark.streaming.stream_pipeline import streaming_event_counts

    base = tempfile.mkdtemp()
    try:
        load_table(spark, "events", sf_dir).write.parquet(f"{base}/in")
        schema = load_table(spark, "events", sf_dir).schema
        stream = spark.readStream.schema(schema).parquet(f"{base}/in")
        agg = streaming_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("evcounts")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from evcounts").collect()
        # append mode emits only windows finalized by the watermark; compare
        # those against the batch aggregation
        batch = (
            load_table(spark, "events", sf_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .count()
            .collect()
        )
        batch_map = {(r.w.start, r.event_type): r["count"] for r in batch}
        assert got, "no finalized windows emitted"
        for r in got:
            assert batch_map[(r.window_start, r.event_type)] == r.n
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_collect_values_keep_columns(spark):
    from pyspark.sql import functions as F

    from nexus_forge_spark.operators.reshape import collect_values

    df = spark.createDataFrame(
        [("d1", [("a",), ("b",)]), ("d2", [("c",)])],
        "doc_id string, items array<struct<v:string>>",
    )
    out = collect_values(df, "items.v", keep=["doc_id"])
    assert out.columns == ["doc_id", "values"]
    rows = {r["doc_id"]: list(r["values"]) for r in out.collect()}
    assert rows == {"d1": ["a", "b"], "d2": ["c"]}


def test_streaming_first_seen_dedup_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-signature state suppresses duplicates
    re-ingested in LATER micro-batches (not just within one batch)."""
    from nexus_forge_spark.streaming.stream_pipeline import streaming_first_seen_dedup

    inp, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "hello world"), (2, "hello  world"), (3, "unique one")],
        "doc_id long, text string",
    ).write.mode("append").parquet(inp)
    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)

    def run_once():
        q = (
            streaming_first_seen_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3}

    # batch 2: doc 4 duplicates doc 1's signature -> suppressed by state
    spark.createDataFrame(
        [(4, "hello world"), (5, "brand new")], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    run_once()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 5}


def test_streaming_user_sessions_gap_boundary(spark):
    """Session windows merge when they TOUCH: an event exactly gap seconds
    after the previous one stays in the SAME session — identical
    strictly-greater new-session rule as the batch sessionize operator
    (this pins the semantics the stream_sessions oracle encodes)."""
    from datetime import datetime

    from nexus_forge_spark.operators.events import sessionize
    from nexus_forge_spark.streaming.stream_pipeline import streaming_user_sessions

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 10, 0), 7, "view", 2.0, "{}"),  # +600s
        (3, datetime(2024, 1, 1, 0, 10, 30), 7, "view", 4.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    base = tempfile.mkdtemp()
    try:
        df.write.parquet(f"{base}/in")
        stream = spark.readStream.schema(schema).parquet(f"{base}/in")
        agg = streaming_user_sessions(stream, gap="600 seconds")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("usess")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            spark.sql("select * from usess").collect(),
            key=lambda r: r.session_start,
        )
        # event 2 at exactly +gap merges (touching windows) -> ONE session
        assert [r.n for r in got] == [3]
        assert got[0].total_value == 7.0
        assert got[0].session_start == datetime(2024, 1, 1, 0, 0, 0)
        assert got[0].session_end == datetime(2024, 1, 1, 0, 20, 30)
        # batch rule (strictly greater) agrees: one session
        batch = sessionize(df, gap_seconds=600)
        assert {r.session_idx for r in batch.collect()} == {0}
        # and 600.000001s DOES split: shift event 3 out by >gap
        rows2 = [rows[0], rows[1],
                 (3, datetime(2024, 1, 1, 0, 20, 0, 1), 7, "view", 4.0, "{}")]
        df2 = spark.createDataFrame(rows2, schema)
        assert {r.session_idx for r in sessionize(df2).collect()} == {0, 1}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_fold_cusum_batch_retry_and_equivalence(spark):
    import os

    from nexus_forge_spark.operators.events import cusum_changepoints
    from nexus_forge_spark.streaming.stream_pipeline import fold_cusum_batch

    rows = [("k1", i, [50] * 6 + [90] * 6) for i in range(12)]
    data = [(k, i, xs[i]) for k, i, xs in rows]
    data += [("k2", i, 30 + (i % 3)) for i in range(12)]
    df = spark.createDataFrame(data, "k string, i long, x long")
    base = tempfile.mkdtemp(prefix="cusum_fold_")
    ref_path = os.path.join(base, "ref")
    df.groupBy("k").agg(
        F.expr("CAST(sum(x) * 1000000 div count(1) AS BIGINT)").alias("mu_micro")
    ).write.parquet(ref_path)
    state_dir, out_dir = os.path.join(base, "st"), os.path.join(base, "out")

    def fold(b, bid):
        fold_cusum_batch(
            b, bid, state_dir, out_dir, ref_path,
            "k", "i", "x", 1_000_000, 20_000_000,
        )

    b0 = df.where(F.col("i") < 5)
    b1 = df.where(F.col("i") >= 5)
    fold(b0, 0)
    fold(b1, 1)
    fold(b1, 1)  # RETRY: re-fold from snap_0 must be a no-op

    got = {
        (r.k, r.i): (r.cusum_up_micro, r.cusum_dn_micro, r.alarm_up, r.alarm_dn)
        for r in spark.read.parquet(os.path.join(out_dir, "batch_*")).collect()
    }
    expect = {
        (r.k, r.i): (r.cusum_up_micro, r.cusum_dn_micro, r.alarm_up, r.alarm_dn)
        for r in cusum_changepoints(df, "k", "i", "x", 1_000_000, 20_000_000).collect()
    }
    assert got == expect
    # the planted k1 step actually alarms
    assert any(a for (k, _), (_, _, a, _) in got.items() if k == "k1")
    shutil.rmtree(base)


def test_min_watermark_delay_is_minimal_and_within_budget(spark):
    """Property on random batches: for each target, shed(delay) <= budget
    AND (delay > 0 implies shed(delay - 1) > budget) — true minimality
    under the global-watermark rule, checked by brute force."""
    import random

    from pyspark.sql import functions as F

    from nexus_forge_spark.streaming.stream_pipeline import min_watermark_delay

    rng = random.Random(3)
    rows = []
    for b in range(4):
        for _ in range(50):
            rows.append((b, rng.randint(0, 10_000)))
    df = spark.createDataFrame(rows, "b int, us long")
    targets = [0, 50_000, 250_000, 900_000]
    out = {
        r.target_ppm: r
        for r in min_watermark_delay(df, "b", "us", targets).collect()
    }

    # brute-force thresholds
    bmax = {}
    for b, us in rows:
        bmax[b] = max(bmax.get(b, 0), us)
    prior = {b: max((bmax[p] for p in bmax if p < b), default=None) for b in bmax}
    ds = [
        prior[b] - us
        for b, us in rows
        if prior[b] is not None and prior[b] - us > 0
    ]
    n = len(rows)

    def shed(delay):
        return sum(1 for d in ds if d > delay)

    for ppm in targets:
        r = out[ppm]
        budget = n * ppm // 1_000_000
        assert shed(r.delay_us) <= budget
        assert r.shed_events == shed(r.delay_us)
        if r.delay_us > 0:
            assert shed(r.delay_us - 1) > budget  # minimality
        assert r.n_events == n and r.n_candidates == len(ds)
