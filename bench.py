"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus a synthetic
crawl-wave throughput measurement (frontier dedup + seen anti-join +
politeness admission over a generated multi-million-URL frontier), and
prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "crawl": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402  (module scope: pandas_udf type-hint resolution)
from pyspark.sql import functions as F  # noqa: E402

from axora_spark.session import get_spark  # noqa: E402
from axora_spark import datagen  # noqa: E402
from axora_spark.operators import politeness  # noqa: E402
from axora_spark.queries import QUERIES  # noqa: E402

# Every operator family is represented — including the near-dup pair that
# round 1 silently excluded (now blocked, not quadratic) and the raw-HTML
# parse stage. minhash_signature/minhash_near_dup are measured with the
# signature PERSISTED once and reused (the crawl-path shape).
HEADLINE = [
    "frontier_filters", "politeness_rank", "seen_antijoin", "dedup_exact",
    "minhash_signature", "minhash_near_dup", "simhash", "ngram_jaccard",
    "embedding_near_dup", "cosine_topk", "ann_lsh_buckets", "ann_ivf_topk",
    "quality_scores", "token_counts", "wordpiece_tokens", "chunk_pipeline",
    "meta_gate", "media_pipeline", "robots_gate", "serp_collect",
    "text_clean",
    "pii_mask", "doc_fingerprint", "repetition_filters",
    "interleaved_spans", "html_links", "html_main_md", "doc_metadata",
    "tpch_q1", "topk_per_group", "broadcast_join_agg",
    "events_tumbling", "sessionize",
]

CRAWL_FRONTIER_N = int(os.environ.get("AXORA_BENCH_FRONTIER_N", 2_000_000))
CRAWL_SEEN_N = CRAWL_FRONTIER_N // 2


def crawl_wave_bench(spark) -> dict:
    """One synthetic crawl wave at scale: N-URL frontier (30% on one hot
    host), N/2-key seen set → dedup → anti-join → salted politeness
    admission. Reports URLs processed/sec (the BASELINE.json metric shape,
    scaled to sandbox)."""
    frontier = datagen.big_frontier(spark, CRAWL_FRONTIER_N)
    # seen set: every other url_hash from an overlapping id range
    seen = (datagen.big_frontier(spark, CRAWL_SEEN_N)
            .select("url_hash"))
    t0 = time.time()
    from axora_spark.operators.frontier import anti_join_seen, dedup_within_wave
    candidates = anti_join_seen(dedup_within_wave(frontier), seen).persist()
    admitted, deferred = politeness.admit(candidates, host_budget=10_000,
                                          salt=16)
    admitted = admitted.persist()
    n_admitted = admitted.count()
    n_deferred = deferred.count()   # anti-join against cached candidates
    dt = time.time() - t0
    candidates.unpersist()
    admitted.unpersist()
    return {
        "frontier_urls": CRAWL_FRONTIER_N,
        "seen_keys": CRAWL_SEEN_N,
        "admitted": n_admitted,
        "deferred": n_deferred,
        "sec": round(dt, 3),
        "urls_per_sec": round(CRAWL_FRONTIER_N / dt, 1),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = get_spark("axora-bench", cores=int(cpus))

    sf = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}.get(
        os.path.basename(sf_dir.rstrip("/")), None)

    # untimed warmup: spin up the Python UDF workers once (32 cold-start
    # processes otherwise land inside the first UDF query's wall time)
    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def _warm(s: pd.Series) -> pd.Series:
        return s.astype("int32")

    spark.range(10_000).repartition(int(cpus)) \
        .select(_warm(F.col("id").cast("int"))) \
        .write.mode("overwrite").format("noop").save()

    from axora_spark.queries import q_minhash_near_dup, q_minhash_signature

    sig = q_minhash_signature(spark, sf_dir).persist()

    def df_for(name):
        if name == "minhash_signature":
            return sig                      # materializes the persisted sig
        if name == "minhash_near_dup":
            return q_minhash_near_dup(spark, sf_dir, sig=sig)
        return QUERIES[name](spark, sf_dir)

    def materialize(df):
        # noop sink: evaluates EVERY column. count() would let Catalyst
        # prune whole projections (a UDF-only query can "finish" without
        # ever running its UDF), silently under-measuring.
        df.write.mode("overwrite").format("noop").save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        df = df_for(name)
        t0 = time.time()
        materialize(df)
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
    sig.unpersist()

    crawl = crawl_wave_bench(spark)
    total += crawl["sec"]
    per_query["crawl_wave"] = crawl["sec"]

    print(json.dumps({
        "metric": "headline query suite + synthetic crawl wave (dedup+anti-join+politeness)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "crawl": crawl,
        "cpus": int(cpus),
    }))


if __name__ == "__main__":
    main()
