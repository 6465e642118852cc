"""Scaling-efficiency evidence: the same frontier generation job at two
parallelism levels (local[N] vs local[4N]) on identical input.

The sandbox has no multi-executor cluster, so per BASELINE.md the
two-cluster-size criterion is evidenced by core-count scaling: run
frontier_scale_job (canonicalize → hash → dedup → seen anti-join →
window rank → politeness slots) over the same n_urls at local[8] and
local[32], report URLs/sec at both and efficiency =
(throughput_4N / throughput_N) / 4.

Each parallelism level runs in a FRESH SparkSession (new JVM would be
ideal; in-process we at least re-create the session with the new master
— spark.master cannot change within a JVM, so this script execs itself
per level). Usage:
    python tools/scaling_bench.py [n_urls]        # orchestrates both levels
    python tools/scaling_bench.py --one N_CPUS N_URLS   # single level (internal)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

REPS = 1


def run_one(cpus: int, n_urls: int) -> None:
    sys.path.insert(0, ".")
    from thuvienphapluat_crawler_spark.plans.frontier import frontier_scale_job
    from thuvienphapluat_crawler_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    # JIT/codegen warm-up, twice (C2 compilation needs invocations), excluded from timing
    frontier_scale_job(spark, 50_000)
    frontier_scale_job(spark, 500_000)
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        n = frontier_scale_job(spark, n_urls)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"cpus": cpus, "n_urls": n_urls, "ranked": n, "sec": round(best, 3),
                      "urls_per_sec": round(n_urls / best, 1)}))
    spark.stop()


def main() -> None:
    """Interleave the two levels over ROUNDS rounds (fresh subprocess per
    measurement) and take best-of per level: the sandbox VM's host is
    oversubscribed and identical runs vary several-fold, so adjacent
    interleaved rounds + best-of is the least-biased estimator here."""
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    best: dict[int, dict] = {}
    for rnd in range(rounds):
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--one", str(cpus), str(n_urls)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            res = json.loads(line)
            print(json.dumps({"round": rnd, **res}))
            if cpus not in best or res["sec"] < best[cpus]["sec"]:
                best[cpus] = res
    tp8 = best[8]["urls_per_sec"]
    tp32 = best[32]["urls_per_sec"]
    eff = (tp32 / tp8) / 4
    print(json.dumps({
        "metric": "throughput scaling efficiency N→4N (local[8]→local[32])",
        "n_urls": n_urls,
        "rounds": rounds,
        "throughput_local8_urls_per_sec": tp8,
        "throughput_local32_urls_per_sec": tp32,
        "speedup": round(tp32 / tp8, 3),
        "efficiency": round(eff, 3),
        "target": 0.8,
    }))


if __name__ == "__main__":
    main()
