"""BASELINE.json per-row invariant: span-sequence equality on
(kind, text, media_ref, order) — the interleaved representation must survive
every storage hop byte-identically, per document."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_forge_spark.plans.checkpoint import CheckpointedRun
from nexus_forge_spark.sources import flat_to_interleaved, load_table


def _canon(df):
    """doc_id -> ordered (kind, text, media_ref, offset) tuples."""
    rows = df.select("doc_id", "spans").collect()
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in rows
    }


def test_span_sequence_survives_parquet_roundtrip(spark, tmp_path):
    docs = flat_to_interleaved(load_table(spark, "documents", "/root/testdata/sf0.001"))
    before = _canon(docs)
    out = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(out)
    after = _canon(spark.read.parquet(out))
    assert after == before
    # offsets are the contiguous span order per doc
    for spans in before.values():
        assert [s[3] for s in spans] == list(range(len(spans)))


def test_span_sequence_survives_checkpoint_resume(spark, tmp_path):
    docs = flat_to_interleaved(load_table(spark, "documents", "/root/testdata/sf0.001"))
    before = _canon(docs)
    run = CheckpointedRun(spark, str(tmp_path / "ck"), num_parts=8, batches=4)
    # killed run (2 of 4 batches) then full resume
    run.stage("docs", docs, partition_key="doc_id", max_batches=2)
    resumed = CheckpointedRun(spark, str(tmp_path / "ck"), num_parts=8, batches=4)
    full = resumed.stage("docs", docs, partition_key="doc_id")
    assert _canon(full) == before


def test_span_kinds_partition_text_and_media(spark):
    docs = flat_to_interleaved(load_table(spark, "documents", "/root/testdata/sf0.001"))
    bad = docs.select(F.explode("spans").alias("s")).where(
        ~(
            ((F.col("s.kind") == "text") & F.col("s.text").isNotNull() & F.col("s.media_ref").isNull())
            | ((F.col("s.kind") == "media") & F.col("s.text").isNull() & F.col("s.media_ref").isNotNull())
        )
    )
    assert bad.count() == 0
