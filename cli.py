"""spark-submit entrypoint (north_rule: `spark-submit --py-files` launch).

Package + launch:

    cd /root/repo && zip -qr /tmp/axora_spark.zip axora_spark
    spark-submit --py-files /tmp/axora_spark.zip cli.py \
        --warehouse /tmp/axora_wh --pages 240 --waves 8 [--robots] [--content]

On a real cluster, add `--master yarn|k8s://...` and executor sizing; the
job code is identical (no local-mode assumptions outside session.py, and
session.py honors a spark-submit-provided master). The sandbox's closest
cluster analog is `--master "local-cluster[n,c,m]"` — n separate executor
JVMs; tests/test_submit_launch.py pins that launch path and its
crawl-order equality with local mode, tools/bench_executors.py measures
N->4N executor scaling through it.
The fixture corpus stands in for live fetch (sandbox is network-free).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="axora_spark crawl session")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--pages", type=int, default=240,
                   help="fixture link-graph size")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--waves", type=int, default=16)
    p.add_argument("--wave-seconds", type=float, default=20.0)
    p.add_argument("--robots", action="store_true",
                   help="target mode: robots gating + crawl-delay budgets")
    p.add_argument("--content", action="store_true",
                   help="run the content pipeline branch")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--priority", choices=["none", "url_score", "pagerank"],
                   default="none", help="frontier priority scoring mode "
                   "(pagerank ranks the crawl's own link graph)")
    p.add_argument("--rank-every", type=int, default=1,
                   help="pagerank mode: recompute ranks every N waves")
    p.add_argument("--near-dup", action="store_true",
                   help="content mode: per-wave incremental near-dup "
                        "against the sigs store; dups go to dup_log")
    p.add_argument("--input", choices=["html", "parsed"], default="html",
                   help="corpus shape: raw HTML (engine parses X3/X4/X5 "
                        "itself; default) or pre-parsed link-graph rows")
    p.add_argument("--seen-filter", choices=["bloom", "cuckoo"],
                   default="bloom", help="sharded seen-filter kind")
    p.add_argument("--bloom-threshold", type=int, default=100_000)
    p.add_argument("--compact-every", type=int, default=None,
                   help="compact the seen table every N waves "
                        "(Iceberg rewrite_data_files; catalog.compact)")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--trap-detect", action="store_true",
                   help="statistical crawl-trap gate (incremental "
                        "trap_state table)")
    p.add_argument("--frontier-cap", type=int, default=None,
                   help="bounded frontier state: keep top-N URLs per "
                        "host after each wave")
    p.add_argument("--adaptive", action="store_true",
                   help="latency-adaptive politeness; the fixture "
                        "corpus declares deterministic 200-599 ms "
                        "per-host latencies")
    args = p.parse_args(argv)

    from axora_spark.session import get_spark
    from axora_spark.catalog import SnapshotCatalog
    from axora_spark import datagen, schemas
    from axora_spark.plans import crawl, content

    spark = get_spark("axora-cli", cores=args.cores)
    pages = datagen.link_graph_rows(args.pages, args.seed)
    cfg = datagen.fixture_config(pages, robots_mode=args.robots,
                                 wave_seconds=args.wave_seconds,
                                 max_waves=args.waves,
                                 priority_mode=args.priority,
                                 rank_every=args.rank_every,
                                 near_dup_ingest=args.near_dup,
                                 trap_detect=args.trap_detect,
                                 frontier_host_cap=args.frontier_cap,
                                 adaptive_politeness=args.adaptive)
    catalog = SnapshotCatalog(args.warehouse)
    if args.input == "html":
        corpus = spark.createDataFrame(
            [{"url": r["url"], "host": r["host"],
              "body_html": datagen.render_page_html(r)} for r in pages],
            schemas.HTML_GRAPH)
    else:
        corpus = spark.createDataFrame(pages, schemas.LINK_GRAPH)
    if args.adaptive:
        corpus = corpus.withColumn("fetch_ms",
                                   datagen.declared_latency_col())
    run = crawl.run_crawl(
        spark, catalog, cfg, corpus, resume=args.resume,
        content_sink=content.make_content_sink(cfg) if args.content else None,
        robots_txt=datagen.fixture_robots() if args.robots else None,
        seen_filter_kind=args.seen_filter,
        bloom_threshold=args.bloom_threshold,
        compact_every=args.compact_every)

    summary = {
        "master": spark.sparkContext.master,
        "admitted_table_rows": catalog.read(spark, "admitted").count(),
        "waves": run.waves_run,
        "admitted": run.admitted_count,
        "wave_metrics": run.wave_metrics,
        "tables": {t: catalog.current_snapshot(t)
                   for t in ("frontier", "seen", "admitted", "lineage",
                             "metrics")},
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
