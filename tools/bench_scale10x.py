"""VERDICT r3 #3 — the 10× wave: the synthetic crawl wave at an
80,000,000-URL frontier (vs the per-round bench's 8M) on local[32],
using the 128 GiB sandbox.

Reports, per frontier size (8M and 80M, same 30% hot-host skew, seen set
= N/2 keys):
  * wave wall seconds (min of reps after an untimed codegen warm-up) and
    URLs/sec — the wall must grow near-linearly in N (no spill collapse);
  * shuffle write bytes + memory/disk spill bytes for the measured wave,
    from the Spark status REST API (delta of completed-stage totals
    around the timed rep);
  * the shard-local seen-filter path: per-shard blob bytes (max + total)
    at n_shards=64 — the claim under test is that one task's filter
    memory is total/n_shards, i.e. max_blob ≈ total_blob / 64,
    INDEPENDENT of frontier size, and the filter pre-pass wave completes
    with the same near-linear wall growth.

Writes a JSON line; the numbers land in BENCH/BASELINE.md ("10× wave"
section) and SCALE.md (measured per-task filter bound).

Usage: python tools/bench_scale10x.py [--small N] [--big N] [--cores C]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from axora_spark.session import get_spark  # noqa: E402
from axora_spark import datagen  # noqa: E402
from axora_spark.operators import politeness  # noqa: E402
from axora_spark.operators.frontier import (anti_join_seen,  # noqa: E402
                                            build_seen_filters,
                                            dedup_within_wave)


def _stage_totals(spark) -> dict:
    """Sum shuffle/spill metrics over all completed stages via the UI
    REST API (driver-local)."""
    base = spark.sparkContext.uiWebUrl
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"))
    except Exception as e:  # UI disabled → report zeros, keep the bench
        print(f"# stage metrics unavailable: {e}", file=sys.stderr)
        return {"shuffle_write_bytes": 0, "memory_spill_bytes": 0,
                "disk_spill_bytes": 0}
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0)
                                   for s in stages),
        "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0)
                                  for s in stages),
        "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0)
                                for s in stages),
    }


def wave_once(spark, frontier, seen, filters=None) -> tuple[float, int]:
    t0 = time.time()
    candidates = anti_join_seen(dedup_within_wave(frontier), seen,
                                filters=filters).persist()
    admitted, deferred = politeness.admit(candidates, host_budget=10_000,
                                          salt=16)
    admitted = admitted.persist()
    n_adm = admitted.count()
    deferred.count()
    dt = time.time() - t0
    candidates.unpersist()
    admitted.unpersist()
    return dt, n_adm


def measure(spark, n: int, reps: int, n_shards: int) -> dict:
    from pyspark.sql import functions as F
    frontier = datagen.big_frontier(spark, n)
    seen = datagen.big_frontier(spark, n // 2).select("url_hash")

    wave_once(spark, frontier, seen)          # untimed warm-up
    best, metrics = None, None
    for _ in range(reps):
        before = _stage_totals(spark)
        dt, n_adm = wave_once(spark, frontier, seen)
        after = _stage_totals(spark)
        if best is None or dt < best[0]:
            best = (dt, n_adm)
            metrics = {k: after[k] - before[k] for k in after}

    # shard-local filter path: blob sizing + a timed filtered wave
    filters = build_seen_filters(seen, n_shards=n_shards).persist()
    blob = (filters.df
            .select(F.length("filter").alias("b"))
            .agg(F.max("b").alias("mx"), F.sum("b").alias("tot"),
                 F.count("*").alias("shards")).collect()[0])
    fdt, fadm = wave_once(spark, frontier, seen, filters=filters)
    fdt2, _ = wave_once(spark, frontier, seen, filters=filters)
    filters.unpersist()

    return {
        "frontier_urls": n,
        "seen_keys": n // 2,
        "wave_sec": round(best[0], 3),
        "urls_per_sec": round(n / best[0], 1),
        "admitted": best[1],
        **{k: int(v) for k, v in (metrics or {}).items()},
        "filter_path": {
            "n_shards": int(blob.shards),
            "max_blob_bytes": int(blob.mx),
            "total_blob_bytes": int(blob.tot),
            "max_over_mean_blob": round(
                blob.mx / (blob.tot / blob.shards), 3),
            "wave_sec": round(min(fdt, fdt2), 3),
            "urls_per_sec": round(n / min(fdt, fdt2), 1),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=8_000_000)
    ap.add_argument("--big", type=int, default=80_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--shards", type=int, default=64)
    args = ap.parse_args()

    # the UI must be on for the status REST API (stage shuffle/spill
    # metrics); the 80M leg shuffles ~12 GB in one JVM, so size the
    # driver heap for it unless the caller already did
    os.environ.setdefault("AXORA_DRIVER_MEM", "64g")
    spark = get_spark("bench-10x", cores=args.cores,
                      extra_conf={"spark.ui.enabled": "true"})
    out = {"cores": args.cores,
           "legs": [measure(spark, n, args.reps, args.shards)
                    for n in (args.small, args.big)]}
    a, b = out["legs"]
    out["wall_growth"] = round(b["wave_sec"] / a["wave_sec"], 2)
    out["size_growth"] = round(b["frontier_urls"] / a["frontier_urls"], 2)
    out["throughput_ratio_big_over_small"] = round(
        b["urls_per_sec"] / a["urls_per_sec"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
