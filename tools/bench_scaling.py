"""Scaling-efficiency bench (north_rule: throughput scaling efficiency
≥ 0.8 from N to 4N executors, evidenced in this sandbox by running the
same job at local[8] and local[32] on the same input).

Each parallelism level runs in its own subprocess (a JVM's master can't
change after startup). Per level: build the interleaved corpus from
$SPARK_GRAFT_SF_DIR documents (replicated REPLICAS× for enough work),
run the full annotate→mention-triples job once to warm codegen + Python
workers, then time MEASURE_RUNS repetitions and report best-of
throughput (docs/sec, triples/sec).

Usage: python tools/bench_scaling.py            # orchestrates 8 then 32
       python tools/bench_scaling.py --worker N # one level (internal)
Writes BENCH_SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = int(os.environ.get("SCALING_REPLICAS", "16"))
MEASURE_RUNS = 3
PARTITIONS = 128           # identical task granularity at every level
LEVEL_PAIRS = ((4, 16), (8, 32))


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from nobletools_spark.model import MatchConfig
    from nobletools_spark.operators.matcher import annotate
    from nobletools_spark.operators.triples import mention_triples
    from nobletools_spark.session import get_spark
    from nobletools_spark.sources.fixtures import builtin_index, interleaved_docs

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cores=cpus, shuffle_partitions=cpus)
    base = interleaved_docs(spark, sf_dir)
    docs = (base
            .withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])))
            .select(F.concat_ws("-", "doc_id", "rep").alias("doc_id"), "spans")
            .repartition(PARTITIONS)
            .cache())
    n_docs = docs.count()

    def job() -> int:
        m = annotate(docs, builtin_index(), MatchConfig(), min_parallelism=1)
        return mention_triples(m).count()

    n_triples = job()  # warm: codegen, python workers, broadcast
    best = float("inf")
    for _ in range(MEASURE_RUNS):
        t0 = time.perf_counter()
        job()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "n_triples": n_triples,
        "wall_s": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "triples_per_sec": round(n_triples / best, 1),
    }))
    spark.stop()


def cpu_ceiling(a: int, b: int, total: int = 64, n: int = 400_000) -> float:
    """Raw-CPU scaling ceiling of this sandbox (md5 burn in a process
    pool) — contextualizes the Spark numbers: shared/SMT vCPUs cap the
    achievable efficiency below 1.0 regardless of framework."""
    import hashlib
    import multiprocessing as mp

    def bench(workers: int) -> float:
        with mp.Pool(workers) as p:
            p.map(_burn, [n] * 8)
            t0 = time.perf_counter()
            p.map(_burn, [n] * total)
            return time.perf_counter() - t0

    return round(bench(a) / bench(b) / (b / a), 3)


def _burn(n: int) -> int:
    import hashlib

    h = b"x"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    levels = sorted({c for pair in LEVEL_PAIRS for c in pair})
    # the sandbox's deliverable CPU varies over time (hypervisor
    # time-sharing) — run two passes in opposite orders and keep the
    # per-level best so a transient throttle doesn't bias one level
    order = list(levels) + list(reversed(levels))
    results = {}
    for cpus in order:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=1800)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if out.returncode != 0 or not lines:
            # surface the worker's real error instead of dying on an
            # unrelated IndexError with stale evidence left on disk
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(
                f"scaling worker (cpus={cpus}) failed "
                f"rc={out.returncode}; stderr above")
        r = json.loads(lines[-1])
        line = lines[-1]
        print(line)
        if cpus not in results or r["docs_per_sec"] > results[cpus]["docs_per_sec"]:
            results[cpus] = r
    report = {
        "levels": results,
        "pairs": {},
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "replicas": REPLICAS,
        "partitions": PARTITIONS,
    }
    for n, m in LEVEL_PAIRS:
        tp_n, tp_m = results[n]["docs_per_sec"], results[m]["docs_per_sec"]
        report["pairs"][f"{n}->{m}"] = {
            "speedup": round(tp_m / tp_n, 3),
            "ideal_speedup": m / n,
            "scaling_efficiency": round(tp_m / (tp_n * (m / n)), 3),
            "cpu_ceiling_efficiency": cpu_ceiling(n, m),
        }
    # headline: the primary N→4N evidence pair
    report["scaling_efficiency"] = report["pairs"]["4->16"]["scaling_efficiency"]
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
