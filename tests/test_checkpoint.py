"""Resume-without-recompute semantics of the checkpoint manifest."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from nexus_forge_spark.plans.checkpoint import CheckpointedRun


def _input(spark):
    return spark.range(0, 1000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") * 3 % 97).alias("value"),
    )


def test_full_run_and_metrics(spark):
    d = tempfile.mkdtemp(dir="/root/repo/.data" if False else None)
    try:
        run = CheckpointedRun(spark, d, num_parts=8, batches=4)
        out = run.stage("s1", _input(spark), "doc_id")
        assert out.count() == 1000
        m = run.metrics("s1")
        assert m["partitions_committed"] == 8
        assert m["rows"] == 1000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_killed_run_resumes_without_recompute(spark):
    d = tempfile.mkdtemp()
    try:
        # first run "dies" after 2 of 4 batches
        run1 = CheckpointedRun(spark, d, num_parts=8, batches=4)
        partial = run1.stage("s1", _input(spark), "doc_id", max_batches=2)
        committed_before = run1.committed_parts("s1")
        assert 0 < len(committed_before) < 8
        assert partial.count() < 1000

        # resumed run: commits only the remaining partitions
        run2 = CheckpointedRun(spark, d, num_parts=8, batches=4)
        out = run2.stage("s1", _input(spark), "doc_id")
        assert out.count() == 1000
        after = run2.committed_parts("s1")
        assert len(after) == 8
        # previously committed partitions kept their original commit times
        for p, rec in committed_before.items():
            assert after[p]["committed_at"] == rec["committed_at"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rerun_is_noop(spark):
    d = tempfile.mkdtemp()
    try:
        run = CheckpointedRun(spark, d, num_parts=4, batches=2)
        run.stage("s1", _input(spark), "doc_id")
        t1 = {p: r["committed_at"] for p, r in run.committed_parts("s1").items()}
        out = run.stage("s1", _input(spark), "doc_id")  # all committed -> no writes
        t2 = {p: r["committed_at"] for p, r in run.committed_parts("s1").items()}
        assert t1 == t2
        assert out.count() == 1000
    finally:
        shutil.rmtree(d, ignore_errors=True)
