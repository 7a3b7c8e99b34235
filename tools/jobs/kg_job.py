"""spark-submit entry point: construct_kg over a parquet documents table.

Usage:
  spark-submit --py-files dist/nexus_forge_spark.zip tools/jobs/kg_job.py \
      <input_parquet> <output_dir> [--resume]

On a cluster, pair with --master/--num-executors; the session factory's
local[] defaults only apply when spark-submit provides no master.  Writes
per-partition checkpoint manifests (lineage + counts) so a killed run
resumes without recompute (plans/checkpoint.py).
"""
import sys

from pyspark.sql import SparkSession

from nexus_forge_spark.plans import pipeline
from nexus_forge_spark.sources import flat_to_interleaved


def main() -> int:
    inp, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    docs = spark.read.parquet(inp)
    if "spans" not in docs.columns:
        docs = flat_to_interleaved(docs)
    triples = pipeline.construct_kg(docs)
    pipeline.write_triples(triples, out)
    n = spark.read.parquet(out).count()
    print(f"KG_JOB_OK triples={n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
