"""Headline benchmark: runs the flagship KG pipeline + representative
operator queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Metric: docs/sec through the full construct_kg pipeline (mention extraction
-> exact+fuzzy resolve -> triple materialize -> dedup), plus per-query wall
seconds.  Scaling evidence (local[8] vs local[32]) lives in
tools/scaling_bench.py -> BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from nexus_forge_spark.plans import pipeline
    from nexus_forge_spark.plans.driver_queries import QUERIES
    from nexus_forge_spark.session import get_spark
    from nexus_forge_spark.sources import flat_to_interleaved, load_table

    spark = get_spark("nexus-forge-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # flagship: full KG construction over the interleaved-span table
    docs = flat_to_interleaved(load_table(spark, "documents", SF_DIR))
    n_docs = docs.count()
    t0 = time.time()
    triples = pipeline.construct_kg(docs)
    n_triples = triples.count()
    flagship = time.time() - t0
    timings["kg_pipeline"] = round(flagship, 3)

    for name, (fn, _sql) in QUERIES.items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    docs_per_sec = n_docs / flagship if flagship > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "queries": timings,
                "sf": float(sf),
                "n_docs": n_docs,
                "n_triples": n_triples,
            }
        )
    )


if __name__ == "__main__":
    main()
