"""Resumable per-partition checkpointing with lineage + counts.

north_rule requirement: "every stage checkpoints per-partition with lineage +
counts so a killed run resumes without recompute."  Reference analogue: the
store's bulk register batches (batches of 80 with a connection semaphore,
nexus/batch_request_handler.py:26-64) — but those give no resumability; here
every committed batch is durable and skipped on restart.

Design (SURVEY.md §4.4):
* rows are assigned a deterministic partition id `_part = pmod(xxhash64(key),
  num_parts)` — stable across runs and cluster sizes;
* partitions are written in `batches` groups; each batch is one Spark job
  writing `stage=<name>/_part=<p>/` dirs, then appending manifest rows
  (stage, partition_id, row_count, committed_at) under `_manifest/`;
* on restart, batches whose partitions are all in the manifest are skipped
  (the input subtree for them is never recomputed — partition pruning on
  `_part` keeps the skipped work off the cluster);
* the manifest doubles as the lineage/metrics record: per-partition row
  counts and commit times.

On a real deployment the parquet writes become Iceberg appends (atomic
commits give exactly-once per batch); the manifest logic is identical.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedRun:
    def __init__(self, spark: SparkSession, base_dir: str, num_parts: int = 8, batches: int = 4):
        self.spark = spark
        self.base_dir = base_dir
        self.num_parts = num_parts
        self.batches = batches
        os.makedirs(self._manifest_dir, exist_ok=True)
        # partitioning config is part of the checkpoint's identity: resuming
        # with a different num_parts would rehash rows into new partition ids
        # and silently double-write on top of committed data
        cfg_path = os.path.join(self._manifest_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path, encoding="utf-8") as f:
                cfg = json.load(f)
            if cfg["num_parts"] != num_parts:
                raise ValueError(
                    f"checkpoint at {base_dir} was written with num_parts="
                    f"{cfg['num_parts']}; cannot resume with num_parts={num_parts}"
                )
        else:
            with open(cfg_path, "w", encoding="utf-8") as f:
                json.dump({"num_parts": num_parts}, f)

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.base_dir, "_manifest")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._manifest_dir, f"{stage}.jsonl")

    def committed_parts(self, stage: str) -> dict[int, dict]:
        path = self._manifest_path(stage)
        out: dict[int, dict] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for line in f:
                    rec = json.loads(line)
                    out[rec["partition_id"]] = rec
        return out

    @staticmethod
    def _footer_counts(stage_dir: str, parts: list[int]) -> dict[int, int]:
        """Per-partition row counts from parquet footer metadata of the files
        just written — no data pages are read and no Spark job runs."""
        import pyarrow.parquet as pq

        counts: dict[int, int] = {}
        for p in parts:
            n = 0
            for path in glob.glob(os.path.join(stage_dir, f"_part={p}", "*.parquet")):
                n += pq.ParquetFile(path).metadata.num_rows
            counts[p] = n
        return counts

    def _append_manifest(self, stage: str, records: list[dict]) -> None:
        # single append per committed batch; atomic enough for a driver-side
        # manifest (Iceberg snapshot commits subsume this on a cluster)
        with open(self._manifest_path(stage), "a", encoding="utf-8") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")

    def stage(
        self,
        name: str,
        df: DataFrame,
        partition_key: str,
        max_batches: int | None = None,
    ) -> DataFrame:
        """Write ``df`` checkpointed under stage ``name``; return the stage's
        full result read back from disk.  Already-committed partitions are
        never recomputed.  ``max_batches`` (tests) stops after N batches to
        simulate a killed run."""
        stage_dir = os.path.join(self.base_dir, f"stage={name}")
        done = self.committed_parts(name)
        part_col = F.pmod(F.xxhash64(F.col(partition_key)), F.lit(self.num_parts)).cast("int")
        work = df.withColumn("_part", part_col)

        per_batch = max(1, self.num_parts // self.batches)
        ran = 0
        for b in range(self.batches):
            parts = [
                p
                for p in range(b * per_batch, min((b + 1) * per_batch, self.num_parts))
                if p not in done
            ]
            if not parts:
                continue
            if max_batches is not None and ran >= max_batches:
                break
            batch_df = work.where(F.col("_part").isin(parts))
            # a killed run may have written these partition dirs without
            # committing them to the manifest; clear them so the append is
            # exactly-once per partition (Iceberg's atomic snapshot commit
            # subsumes this on a cluster)
            for p in parts:
                pdir = os.path.join(stage_dir, f"_part={p}")
                if os.path.exists(pdir):
                    shutil.rmtree(pdir)
            batch_df.write.mode("append").partitionBy("_part").parquet(stage_dir)
            # lineage counts come from the parquet footers of the files the
            # write job just produced — metadata-only reads, so each batch
            # costs exactly ONE Spark job (the write), not a second count()
            counts = self._footer_counts(stage_dir, parts)
            now = time.time()
            self._append_manifest(
                name,
                [
                    {
                        "stage": name,
                        "partition_id": p,
                        "row_count": int(counts.get(p, 0)),
                        "committed_at": now,
                    }
                    for p in parts
                ],
            )
            ran += 1

        if self.committed_parts(name) and len(self.committed_parts(name)) == self.num_parts:
            return self.spark.read.parquet(stage_dir).drop("_part")
        # partial run (max_batches): return what is committed so far
        if os.path.exists(stage_dir):
            return self.spark.read.parquet(stage_dir).drop("_part")
        return self.spark.createDataFrame([], df.schema)

    def metrics(self, stage: str) -> dict:
        recs = self.committed_parts(stage).values()
        return {
            "stage": stage,
            "partitions_committed": len(recs),
            "rows": sum(r["row_count"] for r in recs),
        }
