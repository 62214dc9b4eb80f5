"""Executor-count scaling bench — the north rule's literal leg.

The north rule asks for "spark-submit --py-files on a multi-executor
cluster at two cluster sizes (N and 4N executors)". `bench_scaling.py`
proxies that with thread counts inside one JVM (local[N] vs local[4N]);
this harness removes the proxy on both axes the sandbox *can* remove:

  * each leg is launched by the real `spark-submit --py-files
    /tmp/..zip` entrypoint (the package reaches the driver AND every
    executor only through the zip — the worker asserts /root/repo is
    absent from sys.path);
  * each leg's master is `local-cluster[n, c, m]`: n SEPARATE executor
    JVMs with c cores each, so every shuffle block crosses a process
    boundary through real serialization + the block-transfer service,
    task binaries are broadcast, and python workers are forked per
    executor — the parts of cluster execution that local[N] elides.

What it still cannot emulate: per-node memory buses and shuffle disks
(all JVMs share this one VM), which is why the thread harness's
same-round CPU-ceiling normalization is reported alongside raw ratios
(legs share total-core widths 8 and 32 with bench_scaling.py precisely
so its ceiling measurements carry over).

Protocol mirrors bench_scaling.py's INTERLEAVED rounds (one persistent
app per leg, reps round-robin across legs so each round's ratio shares
one host-load climate). The handshake is file-based — spark-submit does
not forward stdin to the python app: the parent appends ``go`` lines to
``<dir>/cmd``; the worker polls, runs one rep, appends a JSON line to
``<dir>/out``.

The wave job is bench_scaling.py's exactly: dedup (U1) -> seen
anti-join (J1) -> salted politeness (W1) over a skewed synthetic
frontier (reference semantics: crawler/crawler.go wave loop).

Usage: python tools/bench_executors.py [n_urls] [legs ...]
  each leg is ``execs:cores_per_exec`` (bare ints mean 4 cores each);
  defaults: 8_000_000 URLs, legs ``1:2 4:2 2:4 8:4`` — the 1->4 and
  2->8 executor pairs at total widths 2->8 and 8->32 cores (the same
  widths bench_scaling.py measures, so its host-ceiling reading carries
  over); 5 rounds (AXORA_EXEC_ROUNDS). CPU controls (bench_scaling's
  pure-Python burn pools at each leg's TOTAL width) run inside the same
  rounds; the normalized column divides each round's wave ratio by the
  same round's CPU-control attainable ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r'''
import json, os, sys, time

assert not any(p.rstrip("/") == {repo!r} for p in sys.path), \
    "package must arrive via --py-files, not the checkout: %s" % sys.path

from pyspark.sql import SparkSession
from axora_spark import datagen
from axora_spark.operators import politeness
from axora_spark.operators.frontier import anti_join_seen, dedup_within_wave

workdir, n, total_cores = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

spark = (SparkSession.builder.appName("exec-scaling")
         .config("spark.sql.shuffle.partitions", str(total_cores))
         .config("spark.default.parallelism", str(total_cores))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
         .getOrCreate())
assert spark.sparkContext.master.startswith("local-cluster["), \
    spark.sparkContext.master

import axora_spark
assert ".zip" in axora_spark.__file__, axora_spark.__file__

frontier = datagen.big_frontier(spark, n)
seen = datagen.big_frontier(spark, n // 2).select("url_hash")
frontier.count(); seen.count()   # exclude input materialization


def rep():
    t0 = time.time()
    candidates = anti_join_seen(dedup_within_wave(frontier), seen).persist()
    admitted, deferred = politeness.admit(candidates, host_budget=10000,
                                          salt=16)
    admitted = admitted.persist()
    n_adm = admitted.count()
    n_def = deferred.count()
    dt = time.time() - t0
    candidates.unpersist(); admitted.unpersist()
    return dt, n_adm, n_def


rep()  # untimed JIT/exchange warm-up

cmd_path = os.path.join(workdir, "cmd")
out_path = os.path.join(workdir, "out")
with open(out_path, "a") as f:
    f.write(json.dumps({{"ready": True,
                         "executors": sys.argv[4]}}) + "\n")

consumed = 0
while True:
    try:
        with open(cmd_path) as f:
            lines = [l.strip() for l in f if l.strip()]
    except FileNotFoundError:
        lines = []
    if len(lines) > consumed:
        tok = lines[consumed]
        consumed += 1
        if tok == "quit":
            break
        dt, n_adm, n_def = rep()
        with open(out_path, "a") as f:
            f.write(json.dumps({{"sec": dt, "admitted": n_adm,
                                 "deferred": n_def}}) + "\n")
    else:
        time.sleep(0.05)
spark.stop()
'''


def make_zip() -> str:
    path = os.path.join(tempfile.gettempdir(), "axora_spark_pkg.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "axora_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py") or f.endswith(".json"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


class ExecLeg:
    """One persistent spark-submit local-cluster app; one rep per 'go'."""

    def __init__(self, execs: int, cores: int, n: int, zip_path: str):
        self.execs = execs
        self.total_cores = execs * cores
        self.dir = tempfile.mkdtemp(prefix=f"exec_leg_{execs}_")
        script = os.path.join(self.dir, "worker.py")
        with open(script, "w") as f:
            f.write(_WORKER.format(repo=REPO))
        # worker-JVM memory (MB) in the master string must hold the
        # executor; keep each modest — legs coexist (bench_scaling.py's
        # oversized-heap GC-collapse lesson applies per-JVM here too)
        self.proc = subprocess.Popen(
            ["spark-submit", "--master", f"local-cluster[{execs},{cores},5120]",
             "--conf", "spark.executor.memory=4g",
             "--conf", "spark.driver.memory=8g",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_path,
             script, self.dir, str(n), str(self.total_cores), str(execs)],
            cwd=self.dir, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        self.consumed = 0
        self.secs: list[float] = []
        self.admitted = self.deferred = 0

    def _lines(self) -> list[dict]:
        try:
            with open(os.path.join(self.dir, "out")) as f:
                return [json.loads(l) for l in f if l.strip()]
        except FileNotFoundError:
            return []

    def wait_ready(self, timeout_s: float = 900) -> None:
        t0 = time.time()
        while time.time() - t0 < timeout_s:
            lines = self._lines()
            if lines and lines[0].get("ready"):
                self.consumed = 1
                return
            if self.proc.poll() is not None:
                raise RuntimeError(f"leg {self.execs} died on startup")
            time.sleep(0.2)
        raise RuntimeError(f"leg {self.execs} failed to start")

    def rep(self, timeout_s: float = 600) -> float:
        with open(os.path.join(self.dir, "cmd"), "a") as f:
            f.write("go\n")
        t0 = time.time()
        while time.time() - t0 < timeout_s:
            lines = self._lines()
            if len(lines) > self.consumed:
                out = lines[self.consumed]
                self.consumed += 1
                self.secs.append(out["sec"])
                self.admitted, self.deferred = out["admitted"], out["deferred"]
                return out["sec"]
            time.sleep(0.1)
        raise RuntimeError(f"leg {self.execs} rep timed out")

    def stop(self) -> None:
        try:
            with open(os.path.join(self.dir, "cmd"), "a") as f:
                f.write("quit\n")
            self.proc.wait(timeout=30)
        except Exception:
            self.proc.terminate()
        shutil.rmtree(self.dir, ignore_errors=True)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scaling import ControlLeg, _burn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    toks = sys.argv[2:] or ["1:2", "4:2", "2:4", "8:4"]
    specs = []  # (execs, cores_per_exec)
    for t in toks:
        e, _, c = t.partition(":")
        specs.append((int(e), int(c) if c else 4))
    rounds = int(os.environ.get("AXORA_EXEC_ROUNDS", "5"))

    zip_path = make_zip()
    legs = {s: ExecLeg(s[0], s[1], n, zip_path) for s in specs}
    for s in specs:
        legs[s].wait_ready()
        print(f"# leg {s[0]} executors x {s[1]} cores ready",
              file=sys.stderr)
    cpu = {s: ControlLeg(_burn, s[0] * s[1]) for s in specs}

    for r in range(rounds):
        for s in specs:
            legs[s].rep()
            cpu[s].rep()
        print(f"# round {r} secs: "
              + ", ".join(f"{s[0]}x{s[1]}:{legs[s].secs[-1]:.1f}"
                          for s in specs), file=sys.stderr)

    print(f"\n## Executor scaling (spark-submit --py-files, "
          f"local-cluster[n,c,5120], {n:,} URLs, "
          f"{rounds} interleaved rounds)\n")
    print("| leg | total cores | wave wall s (min) | wave URLs/sec "
          "| CPU control u/s |")
    print("|---|---|---|---|---|")
    for s in specs:
        best = min(legs[s].secs)
        print(f"| {s[0]} executors x {s[1]} cores | {s[0] * s[1]} "
              f"| {best:.2f} | {n / best:,.0f} "
              f"| {cpu[s].throughput():.1f} |")
    print()
    pairs = [(a, b) for a in specs for b in specs
             if b[0] == 4 * a[0] and b[1] == a[1]]
    print("| pair (N->4N executors) | median round eff | min-stat eff "
          "| median eff / same-round CPU ceiling | per-round effs |")
    print("|---|---|---|---|---|")
    for a, b in pairs:
        la, lb = legs[a], legs[b]
        per_round = [(la.secs[i] / lb.secs[i]) / 4.0
                     for i in range(rounds)]
        min_stat = (min(la.secs) / min(lb.secs)) / 4.0
        cpu_attain = [(cpu[a].secs[i] / cpu[b].secs[i]) * 4.0
                      for i in range(rounds)]
        norm = [la.secs[i] / lb.secs[i] / cpu_attain[i]
                for i in range(rounds)]
        print(f"| {a[0]}->{b[0]} (x{a[1]} cores) "
              f"| {statistics.median(per_round):.2f} "
              f"| {min_stat:.2f} | {statistics.median(norm):.2f} | "
              + ", ".join(f"{x:.2f}" for x in per_round) + " |")
    print("\nraw per leg (all interleaved rounds):")
    for s in specs:
        print("    " + json.dumps(
            {"executors": s[0], "cores_per_exec": s[1], "n": n,
             "wave_secs": [round(x, 2) for x in legs[s].secs],
             "cpu_secs": [round(x, 2) for x in cpu[s].secs],
             "admitted": legs[s].admitted,
             "deferred": legs[s].deferred}))
    for s in specs:
        legs[s].stop()
    for c in cpu.values():
        c.stop()


if __name__ == "__main__":
    main()
