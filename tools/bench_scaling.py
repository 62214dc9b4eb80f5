"""Two-parallelism scaling bench (north_rule: N→4N executors ≥0.8
throughput scaling efficiency; sandbox proxy: local[8] vs local[32] on the
same input — BASELINE.md target row).

Runs the synthetic crawl wave (frontier dedup → seen anti-join → salted
politeness admission) at both parallelism levels in SEPARATE JVMs
(subprocess per level, so executor-thread counts are honest), then writes
BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_urls] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
# size the single local JVM for the box: per-task execution memory is
# heap/threads — at 4N threads a small heap spills where N threads don't,
# which would understate scaling (measured: 16 g heap made local[32]
# SLOWER than local[8] at 16M URLs)
os.environ.setdefault("AXORA_DRIVER_MEM", "80g")
from axora_spark.session import get_spark
from axora_spark import datagen
from axora_spark.operators import politeness
from axora_spark.operators.frontier import anti_join_seen, dedup_within_wave

cores = {cores}
n = {n}
spark = get_spark("scaling-bench", cores=cores)
frontier = datagen.big_frontier(spark, n)
seen = datagen.big_frontier(spark, n // 2).select("url_hash")
# warm-up: materialize inputs once so JVM/codegen startup is excluded
frontier.count(); seen.count()
# best-of-3 inside one JVM: this sandbox has bursty CPU steal (1-60%);
# a single-shot timing can be off by >5x. Best-of measures the job,
# not the neighbor; same-JVM reps also give steady-state JIT.
secs = []
for _ in range(3):
    t0 = time.time()
    candidates = anti_join_seen(dedup_within_wave(frontier), seen).persist()
    admitted, deferred = politeness.admit(candidates, host_budget=10000, salt=16)
    admitted = admitted.persist()
    n_adm = admitted.count()
    n_def = deferred.count()
    secs.append(time.time() - t0)
    candidates.unpersist(); admitted.unpersist()
dt = min(secs)
print(json.dumps({{"cores": cores, "n": n, "sec": dt,
                   "all_secs": [round(x, 2) for x in secs],
                   "urls_per_sec": n / dt, "admitted": n_adm,
                   "deferred": n_def}}))
"""


def run_level(cores: int, n: int) -> dict:
    code = _WORKER.format(repo=REPO, cores=cores, n=n)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    r_lo = run_level(lo, n)
    r_hi = run_level(hi, n)
    speedup = r_hi["urls_per_sec"] / r_lo["urls_per_sec"]
    efficiency = speedup / (hi / lo)

    md = f"""# BENCH/BASELINE — measured numbers (sandbox)

## Two-parallelism scaling (north_rule: N→4N ≥ 0.8 efficiency)

Same job, same input: one synthetic crawl wave — within-wave dedup (U1) →
seen anti-join (J1) over a {n:,}-URL frontier with a {n//2:,}-key seen set
(30% of URLs on one hot host → skew) → salted politeness admission (W1,
budget 10k/host, salt 16). Input materialization excluded (warm-up count
before timing). Separate JVM per level.

| parallelism | wall sec | URLs/sec | admitted | deferred |
|---|---|---|---|---|
| local[{lo}] (N) | {r_lo['sec']:.2f} | {r_lo['urls_per_sec']:,.0f} | {r_lo['admitted']:,} | {r_lo['deferred']:,} |
| local[{hi}] (4N) | {r_hi['sec']:.2f} | {r_hi['urls_per_sec']:,.0f} | {r_hi['admitted']:,} | {r_hi['deferred']:,} |

- speedup {lo}→{hi} cores: **{speedup:.2f}×** (ideal {hi // lo}×)
- **scaling efficiency: {efficiency:.2f}** (target ≥ 0.8)

Caveat: local mode shares one JVM heap and one disk for shuffle, so this
is a lower bound on multi-executor scaling — a real cluster splits shuffle
I/O across machines. The plan contains no driver-side collect and no
per-row Python; skew is handled by the two-phase salted window
(axora_spark/operators/politeness.py) + AQE.

raw (best of 3; all runs in `all_secs`):
    {json.dumps(r_lo)}
    {json.dumps(r_hi)}
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
