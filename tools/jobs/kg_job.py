"""spark-submit entry point: construct_kg over a parquet documents table.

Usage:
  spark-submit --py-files dist/nexus_forge_spark.zip tools/jobs/kg_job.py \
      <input_parquet> <output_dir> [checkpoint_dir]

With a checkpoint_dir the triple write goes through CheckpointedRun
(plans/checkpoint.py): per-partition manifest with lineage + counts, so a
killed run re-submitted with the SAME command skips every committed
partition — no recompute.  On a cluster, pair with --master /
--num-executors; the session factory's local[] defaults only apply when
spark-submit provides no master.
"""
import sys

from pyspark.sql import SparkSession

from nexus_forge_spark.plans import pipeline
from nexus_forge_spark.plans.checkpoint import CheckpointedRun
from nexus_forge_spark.sources import flat_to_interleaved


def main() -> int:
    inp, out = sys.argv[1], sys.argv[2]
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None
    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    docs = spark.read.parquet(inp)
    if "spans" not in docs.columns:
        docs = flat_to_interleaved(docs)
    triples = pipeline.construct_kg(docs)
    if ckpt_dir:
        run = CheckpointedRun(spark, ckpt_dir, num_parts=32, batches=8)
        result = run.stage("triples", triples, partition_key="doc_id")
        result.write.mode("overwrite").partitionBy("stage").parquet(out)
        print(f"KG_JOB_METRICS {run.metrics('triples')}")
    else:
        pipeline.write_triples(triples, out)
    n = spark.read.parquet(out).count()
    print(f"KG_JOB_OK triples={n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
