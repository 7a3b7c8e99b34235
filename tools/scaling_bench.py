"""Two-parallelism scaling bench (north_rule evidence).

The rule's N -> 4N executor criterion cannot use a real cluster in this
sandbox; per the driver's instruction it is evidenced by running the SAME
job at two parallelism levels (local[8] vs local[32]) on the SAME input and
reporting throughput at both plus scaling efficiency
  eff = docs_per_sec(4N) / (4 * docs_per_sec(N)).

Each level runs in its own subprocess (fresh JVM), does a warm-up pass to
exclude JIT/codegen warmup, then times the full construct_kg pipeline over a
deterministic synthesized interleaved-span corpus (identical at any
parallelism — seeded xxhash64 datagen).

Usage: python tools/scaling_bench.py [--docs 100000] [--levels 8,32]
Appends results to BENCH.md and prints one JSON line.
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
# 256 files so both parallelism levels get plenty of input splits
synthesize_documents(spark, n_docs, num_partitions=256).write.mode("overwrite").parquet(path)
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
level, n_docs, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 5
from nexus_forge_spark.session import get_spark
from nexus_forge_spark.plans import pipeline
spark = get_spark(
    "scaling-bench",
    master=f"local[{level}]",
    shuffle_partitions=max(level, 8),
    extra_conf={"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024)},
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
# real warm-up: a full-size pass so JIT compilation and heap growth are paid
# before measurement (a fresh JVM's first heavy job runs 2-5x slower)
pipeline.construct_kg(docs).count()
times, n_triples = [], 0
for _ in range(n_runs):  # steady-state runs (noisy sandbox host)
    t0 = time.time()
    n_triples = pipeline.construct_kg(docs).count()
    times.append(time.time() - t0)
times.sort()
best, median = times[0], times[len(times) // 2]
print(json.dumps({"level": level, "sec": round(median, 3), "sec_best": round(best, 3),
                  "docs_per_sec": round(n_docs / median, 1),
                  "docs_per_sec_best": round(n_docs / best, 1),
                  "times": [round(t, 2) for t in times],
                  "n_triples": n_triples}))
"""


def run_level(level: int, n_docs: int, path: str, runs: int = 5) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(level), str(n_docs), path, str(runs)],
        capture_output=True,
        text=True,
        timeout=3000,
        cwd="/root/repo",
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"level {level} failed: {out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    assert len(levels) == 2 and levels[1] == 4 * levels[0], "levels must be N,4N"

    corpus = f"/root/repo/.data/scaling_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen = subprocess.run(
            [sys.executable, "-c", GEN, str(args.docs), corpus],
            capture_output=True, text=True, timeout=1800, cwd="/root/repo",
        )
        if gen.returncode != 0:
            raise RuntimeError(f"corpus gen failed: {gen.stderr[-2000:]}")

    results = [run_level(lv, args.docs, corpus, args.runs) for lv in levels]
    eff = results[1]["docs_per_sec"] / (4 * results[0]["docs_per_sec"])
    summary = {
        "metric": "scaling_efficiency_Nto4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": args.docs,
        "levels": {str(r["level"]): r for r in results},
    }
    print(json.dumps(summary))

    bench_md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md")
    with open(bench_md, "a", encoding="utf-8") as f:
        f.write(
            f"\n## Scaling run ({args.docs} docs, construct_kg pipeline)\n\n"
            f"| parallelism | wall sec | docs/sec | triples |\n|---|---|---|---|\n"
        )
        for r in results:
            f.write(f"| local[{r['level']}] | {r['sec']} | {r['docs_per_sec']} | {r['n_triples']} |\n")
        f.write(
            f"\n**Scaling efficiency N→4N = {eff:.3f}** "
            f"(target ≥ 0.8; eff = docs/sec@4N ÷ (4 × docs/sec@N)).\n"
        )


if __name__ == "__main__":
    main()
