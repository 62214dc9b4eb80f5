"""VERDICT r3 #4 — end-to-end crawl-session bench: the reference's actual
workload shape (crawler/dom_handler.go:62-128) at corpus scale.

A three-level run_crawl (seeds depth 1 + two hops) over a synthetic ~(H + H·K + H·K²)-page raw-HTML
corpus (H hosts × fan-out K per page; K=100, H=100 → 1,010,100 pages):
seeds → politeness admission → fetch (non-broadcast join against a
parquet corpus store) → ONE-PASS HTML parse (X3 links + X4 main content +
X5 spans) → content pipeline (meta gate F5/F6 on ~10% relevant pages →
quality F7 → markdown chunking C1-C4 with REAL wordpiece token counts →
hash-embed stub C5 → keyed vector sink) → frontier extraction
(absolutize X1, canonicalize X2, depth W2, whitelist J2, seen J1, dedup
U1) — every stage the reference runs, end to end, lineage-committed.

The corpus is generated Spark-natively (no driver materialization),
written once to a temp parquet store, and fetched by a NON-broadcast
join (at 1M pages a broadcast corpus is the wrong shape; production
replaces this join with fetch_http). Quality-relevant pages carry ~16
sentences / ~230 words with 0.25-0.6 distinct-word richness so the F7
gate passes and the chunk path does real work.

Prints one JSON line: total wall, end-to-end pages/sec, per-wave
admitted/fetched, docs/chunks/vectors committed. BENCH/BASELINE.md
records the numbers.

Usage: python tools/bench_crawl_e2e.py [--hosts 100] [--fanout 100]
       [--cores 32] [--tokenizer wordpiece]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from axora_spark.session import get_spark  # noqa: E402
from axora_spark.catalog import SnapshotCatalog  # noqa: E402
from axora_spark.config import CrawlConfig  # noqa: E402
from axora_spark.plans import content, crawl  # noqa: E402
from axora_spark.sources.fetch import fetch_from_corpus  # noqa: E402

_POOLS = (
    ("growth", "inflation", "exports", "wages", "credit", "housing",
     "energy", "retail"),
    ("policy", "tariffs", "budgets", "rates", "trade", "supply",
     "labor", "capital"),
    ("steady", "volatile", "improving", "slowing", "mixed", "resilient",
     "uneven", "firm"),
)


def _pick(pool: tuple[str, ...], idx):
    return F.element_at(F.array(*[F.lit(w) for w in pool]),
                        (idx % len(pool) + 1).cast("int"))


def _filler(uid) -> F.Column:
    """~16 sentences × ~14 words, richness in the 0.25-0.6 F7 band:
    three unique serials + three pool picks per sentence."""
    sents = []
    for s in range(16):
        a, b = uid * 48 + 3 * s, uid * 48 + 3 * s + 1
        c = uid * 48 + 3 * s + 2
        sents.append(F.concat(
            F.lit("The economy brief covers "), _pick(_POOLS[0], uid + s),
            F.lit(" and "), _pick(_POOLS[1], uid + 2 * s),
            F.lit(" with a "), _pick(_POOLS[2], uid + 3 * s),
            F.lit(" outlook across item "), a.cast("string"),
            F.lit(" ref "), b.cast("string"),
            F.lit(" code "), c.cast("string"), F.lit(".")))
    return F.concat_ws(" ", *sents)


def _page(uid, anchors) -> F.Column:
    meta = F.when(
        uid % 10 == 0,  # ~10% relevant; 'economy' second (the
        # reference's no-separator blob glues the first keyword onto
        # 'keywords' — make_fixtures.meta_gate_inputs_py notes the same)
        F.lit('<meta name="keywords" content="growth,economy">')
    ).otherwise(F.lit('<meta name="keywords" content="weather notes">'))
    return F.concat(
        F.lit("<html><head><title>Briefing node "), uid.cast("string"),
        F.lit("</title>"), meta, F.lit("</head><body><h1>Node "),
        uid.cast("string"), F.lit("</h1><p>"), _filler(uid),
        F.lit("</p>"), anchors, F.lit("</body></html>"))


def build_corpus(spark, n_hosts: int, fanout: int,
                 dup_frac: float = 0.0) -> DataFrame:
    """roots (link to K children) ∪ children (link to K grandchildren)
    ∪ leaf grandchildren — all Spark-native from spark.range.

    dup_frac > 0 makes the first dup_frac·K children of EVERY host carry
    a host-independent content uid — byte-identical bodies replicated
    across all n_hosts hosts (distinct URLs, so distinct doc_ids): the
    cross-host boilerplate that the near-dup ingest gate exists to
    drop. Whether a duplicated page becomes a document still follows
    the uid%10 relevance rule, exactly like unique pages."""
    K = fanout

    def host_of(hid):
        return F.format_string("h%d.bench.example", hid.cast("int"))

    def anchor_list(href_fn):
        return F.concat_ws("", F.transform(
            F.sequence(F.lit(0), F.lit(K - 1)),
            lambda j: F.concat(F.lit('<a href="'), href_fn(j),
                               F.lit('">next</a>'))))

    r = spark.range(n_hosts)
    hid = F.col("id")
    roots = r.select(
        F.format_string("https://h%d.bench.example/r",
                        hid.cast("int")).alias("url"),
        host_of(hid).alias("host"),
        _page(hid * 7919,
              anchor_list(lambda j: F.format_string(
                  "/c%d", j.cast("int")))).alias("body_html"))

    c = spark.range(n_hosts * K)
    chid, cj = F.col("id") / K, F.col("id") % K
    chid = chid.cast("long")
    child_uid = F.col("id") * 31 + 1
    if dup_frac > 0:
        child_uid = F.when(cj < int(K * dup_frac), cj * 31 + 1) \
            .otherwise(child_uid)
    children = c.select(
        F.format_string("https://h%d.bench.example/c%d", chid.cast("int"),
                        cj.cast("int")).alias("url"),
        host_of(chid).alias("host"),
        _page(child_uid,
              anchor_list(lambda j, _cj=cj: F.concat(
                  F.format_string("/c%d/g", _cj.cast("int")),
                  j.cast("string")))).alias("body_html"))

    g = spark.range(n_hosts * K * K)
    ghid = (F.col("id") / (K * K)).cast("long")
    rem = F.col("id") % (K * K)
    gj, gl = (rem / K).cast("long"), rem % K
    grand = g.select(
        F.format_string("https://h%d.bench.example/c%d/g%d",
                        ghid.cast("int"), gj.cast("int"),
                        gl.cast("int")).alias("url"),
        host_of(ghid).alias("host"),
        _page(F.col("id") * 13 + 2,
              F.lit("")).alias("body_html"))

    return roots.unionByName(children).unionByName(grand)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=100)
    ap.add_argument("--fanout", type=int, default=100)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--tokenizer", default="wordpiece")
    ap.add_argument("--priority", default="none",
                    help="none | url_score | pagerank (per-wave "
                         "link-authority ranking, VERDICT r4 #5)")
    ap.add_argument("--near-dup", action="store_true",
                    help="cfg.near_dup_ingest: per-wave incremental "
                         "near-dup gate in the content sink")
    ap.add_argument("--dup-frac", type=float, default=0.0,
                    help="fraction of each host's children replicated "
                         "byte-identically across ALL hosts")
    ap.add_argument("--max-bucket", type=int, default=None,
                    help="near-dup candidate bucket cap "
                         "(cfg.near_dup_max_bucket)")
    ap.add_argument("--governance", action="store_true",
                    help="full crawl-governance stack on: trap_detect + "
                         "adaptive_politeness (corpus declares "
                         "deterministic 200-599 ms host latencies — "
                         "below the 5 s delay floor so admissions are "
                         "IDENTICAL to the baseline run and the wall "
                         "delta is pure governance overhead) + "
                         "frontier_host_cap=K**2 (never binds on this "
                         "graph, same reasoning)")
    args = ap.parse_args()
    H, K = args.hosts, args.fanout
    n_pages = H * (1 + K + K * K)

    spark = get_spark("bench-e2e", cores=args.cores)
    store = tempfile.mkdtemp(prefix="e2e_corpus_")
    wh = tempfile.mkdtemp(prefix="e2e_wh_")
    try:
        t0 = time.time()
        corpus_df = build_corpus(spark, H, K, args.dup_frac)
        if args.governance:
            from axora_spark import datagen
            corpus_df = corpus_df.withColumn(
                "fetch_ms", datagen.declared_latency_col())
        corpus_df.write.mode("overwrite") \
            .parquet(os.path.join(store, "corpus"))
        corpus = spark.read.parquet(os.path.join(store, "corpus"))
        gen_sec = time.time() - t0
        print(f"# corpus: {n_pages} pages in {gen_sec:.1f}s",
              file=sys.stderr)

        cfg = CrawlConfig(
            seeds=tuple(f"https://h{i}.bench.example/r" for i in range(H)),
            allowed_domains=tuple(
                f"h{i}.bench.example" for i in range(H)),
            max_depth=3,  # colly convention: seeds are depth 1
            wave_seconds=K * K * 5 / 3 * 1.2,  # budget ≥ K² per host/wave
            url_filters=(r"^https://h\d+\.bench\.example/.*$",),
            tokenizer=args.tokenizer,
            priority_mode=args.priority,
            near_dup_ingest=args.near_dup,
            near_dup_max_bucket=args.max_bucket,
            trap_detect=args.governance,
            adaptive_politeness=args.governance,
            frontier_host_cap=(K * K if args.governance else None),
        )
        catalog = SnapshotCatalog(wh)

        def fetcher(admitted, wave):
            return fetch_from_corpus(admitted, corpus, wave,
                                     broadcast_corpus=False)

        t1 = time.time()
        run = crawl.run_crawl(spark, catalog, cfg, corpus=None,
                              fetcher=fetcher,
                              content_sink=content.make_content_sink(cfg))
        wall = time.time() - t1

        fetched = sum(m["admitted"] for m in run.wave_metrics)
        out = {
            "metric": "end-to-end crawl session (fetch+parse+content+frontier)",
            "hosts": H, "fanout": K, "corpus_pages": n_pages,
            "tokenizer": args.tokenizer,
            "priority_mode": args.priority,
            "governance": args.governance,
            "corpus_gen_sec": round(gen_sec, 1),
            "crawl_wall_sec": round(wall, 1),
            "pages_fetched": fetched,
            "pages_per_sec": round(fetched / wall, 1),
            "waves": run.waves_run,
            "wave_metrics": run.wave_metrics,
            "documents": catalog.read(spark, "documents").count(),
            "chunks": catalog.read(spark, "chunks").count(),
            "vectors": catalog.read(spark, "vectors").count(),
            "cores": args.cores,
        }
        if args.near_dup:
            out["near_dup"] = {
                "dup_frac": args.dup_frac,
                "max_bucket": args.max_bucket,
                "dups_logged": catalog.read(spark, "dup_log").count(),
                "sigs_stored": catalog.read(spark, "sigs").count(),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
