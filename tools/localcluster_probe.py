"""local-cluster[N, cores, mem] scaling probe.

`local-cluster` launches REAL separate executor JVMs on this box — the
closest in-sandbox emulation of the north rule's "N vs 4N executors":
executor isolation (heap, GC, task threads) is genuine; only the memory
bus is still shared (unavoidable on one host, and the shared bus makes
this UNDERSTATE true cluster scaling, where 4N executors bring 4N buses).

Usage: python tools/localcluster_probe.py [--docs 1000000] [--execs 1,4]
Each level runs in a fresh driver process: master=local-cluster[k,2,4096]
(k executors x 2 cores), warm-up + 5 measured runs, median reported.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
n_docs, path = int(sys.argv[1]), sys.argv[2]
from nexus_forge_spark.session import get_spark
from nexus_forge_spark.sources import synthesize_documents
spark = get_spark("scaling-gen")
spark.sparkContext.setLogLevel("ERROR")
synthesize_documents(spark, n_docs, num_partitions=256).write.mode("overwrite").parquet(path)
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
k, n_docs, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
cores = int(sys.argv[4]) if len(sys.argv) > 4 else 2
from nexus_forge_spark.session import get_spark
from nexus_forge_spark.plans import pipeline
spark = get_spark(
    "localcluster-probe",
    master=f"local-cluster[{k},{cores},4096]",
    shuffle_partitions=max(cores * k, 8),
    extra_conf={
        "spark.executor.memory": "3g",
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
    },
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
pipeline.construct_kg(docs).count()  # warm-up (executor JVMs + codegen)
times, n_triples = [], 0
for _ in range(5):
    t0 = time.time()
    n_triples = pipeline.construct_kg(docs).count()
    times.append(time.time() - t0)
times.sort()
median = times[len(times) // 2]
print(json.dumps({"executors": k, "cores": cores, "sec": round(median, 3),
                  "docs_per_sec": round(n_docs / median, 1),
                  "times": [round(t, 2) for t in times],
                  "n_triples": n_triples}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--execs", default="1,4")
    ap.add_argument("--cores", type=int, default=2, help="cores per executor")
    args = ap.parse_args()
    levels = [int(x) for x in args.execs.split(",")]
    assert len(levels) == 2 and levels[1] == 4 * levels[0]
    corpus = f"/root/repo/.data/scaling_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        # fresh container: synthesize the deterministic corpus first (the
        # same seeded datagen scaling_bench.py uses — identical at any
        # parallelism)
        gen = subprocess.run(
            [
                sys.executable,
                "-c",
                GEN,
                str(args.docs),
                corpus,
            ],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd="/root/repo",
        )
        if gen.returncode != 0:
            raise RuntimeError(f"corpus gen failed: {gen.stderr[-2000:]}")
    results = []
    for k in levels:
        out = subprocess.run(
            [
                sys.executable, "-c", CHILD,
                str(k), str(args.docs), corpus, str(args.cores),
            ],
            capture_output=True, text=True, timeout=2400, cwd="/root/repo",
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"executors={k} failed: {out.stderr[-3000:]}")
        results.append(json.loads(lines[-1]))
    eff = results[1]["docs_per_sec"] / (4 * results[0]["docs_per_sec"])
    print(json.dumps({
        "metric": "local_cluster_scaling_efficiency_Nto4N",
        "value": round(eff, 3),
        "levels": {str(r["executors"]): r for r in results},
    }))


if __name__ == "__main__":
    main()
