"""The wave-loop crawl driver (SURVEY.md §3.3, §7.1 M2/M4).

One BFS wave = one batch job over the snapshot catalog:

    frontier(w) --J1 anti-join seen (bloom pre-pass)--> candidates
      --W1 politeness admit/defer--> admitted(w) + deferred
      --S3 fetch--> fetched(w)
      --[branch A] X3/X1 extract -> F1-F3 -> candidates(w+1) ∪ deferred
          -> U1 dedup -> frontier(w+1)
      --[branch B] content pipeline -> documents/chunks/vectors
      --A5 metrics + lineage append

Every wave commits its outputs to the catalog (that IS the checkpoint);
`_state.json` records the next wave, so a killed run resumes from the last
complete wave with identical results (north_rule: resumable with
per-partition lineage + metrics). Semantics are defined by and verified
against axora_spark.oracle.simulate.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axora_spark import schemas
from axora_spark.catalog import SnapshotCatalog
from axora_spark.config import CrawlConfig
from axora_spark.operators import politeness
from axora_spark.operators.extract import links_from_fetched
from axora_spark.operators.filters import apply_frontier_filters
from axora_spark.operators.frontier import (anti_join_seen, build_seen_blooms,
                                            dedup_within_wave)
from axora_spark.operators.urls import canonicalize_udf, host_col, url_hash
from axora_spark.sources.fetch import corpus_from_link_graph, fetch_from_corpus


@dataclass
class CrawlRun:
    catalog: SnapshotCatalog
    cfg: CrawlConfig
    waves_run: int = 0
    seen_count: int = 0
    admitted_count: int = 0
    wave_metrics: list[dict] = field(default_factory=list)


def _state_path(catalog: SnapshotCatalog) -> str:
    return os.path.join(catalog.root, "_state.json")


def _save_state(catalog: SnapshotCatalog, state: dict) -> None:
    tmp = _state_path(catalog) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(catalog))


def _load_state(catalog: SnapshotCatalog) -> dict | None:
    p = _state_path(catalog)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def seed_frontier(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    """Wave-0 frontier from the seed list (S1; cmd/main.go:143-146)."""
    seeds = spark.createDataFrame([(s,) for s in cfg.seeds], "raw_url string")
    df = (seeds
          .withColumn("url", canonicalize_udf(F.col("raw_url")))
          .filter(F.col("url") != "")
          .withColumn("host", host_col(F.col("url")))
          .select("url", "host"))
    df = apply_frontier_filters(df, cfg)
    df = df.withColumn("depth", F.lit(1))
    if cfg.priority_mode == "url_score":
        from axora_spark.operators.priority import url_priority_col
        prio = url_priority_col(F.col("url"), F.col("depth"))
    else:
        prio = F.lit(0.0)
    return dedup_within_wave(
        df.withColumn("url_hash", url_hash(F.col("url")))
          .withColumn("priority", prio)
          .withColumn("discovered_wave", F.lit(0)))


def init_tables(catalog: SnapshotCatalog) -> None:
    catalog.create_table("frontier", schemas.FRONTIER)
    catalog.create_table("seen", schemas.SEEN)
    catalog.create_table("admitted", schemas.ADMITTED)
    catalog.create_table("lineage", schemas.LINEAGE)
    catalog.create_table("metrics", schemas.METRICS)


def _record_lineage(spark: SparkSession, catalog: SnapshotCatalog, wave: int,
                    entries: list[tuple[str, int, int, int]]) -> None:
    rows = [(wave, t, int(sid), int(n), int(p)) for t, sid, n, p in entries]
    catalog.append(spark, "lineage",
                   spark.createDataFrame(rows, schemas.LINEAGE))


def run_crawl(spark: SparkSession, catalog: SnapshotCatalog, cfg: CrawlConfig,
              corpus: DataFrame, resume: bool = False,
              stop_after_wave: int | None = None,
              bloom_threshold: int = 100_000,
              content_sink=None,
              robots_txt: dict[str, str] | None = None,
              seen_filter_kind: str = "bloom") -> CrawlRun:
    """Run (or resume) a crawl session to completion.

    corpus: FETCHED-shaped fixture corpus (see sources.fetch). In a live
    deployment this argument is replaced by the HTTP fetch stage.
    stop_after_wave: simulate a crash after wave k (resume testing).
    content_sink: optional callable (spark, catalog, fetched_df, wave) — the
    content pipeline branch (plans.content.process_wave); decoupled so the
    frontier loop is testable alone.
    robots_txt: host → robots.txt body. Only consulted when
    cfg.robots_mode (north_rule target mode): disallowed URLs are dropped
    from the candidate set (never admitted, never marked seen), and a
    host's crawl-delay overrides its politeness budget (SEMANTICS.md).
    """
    robots_rules = None
    budget_overrides: dict[str, int] = {}
    if cfg.robots_mode and robots_txt:
        from axora_spark.operators import robots as robots_op
        robots_rules = {h: robots_op.parse_robots(t)
                        for h, t in robots_txt.items()}
        for h, r in robots_rules.items():
            if r.crawl_delay:
                budget_overrides[h] = robots_op.host_budget_with_robots(
                    cfg.host_budget, cfg.wave_seconds,
                    cfg.per_host_parallelism, r.crawl_delay)
    state = _load_state(catalog) if resume else None
    if state is None:
        init_tables(catalog)
        frontier = seed_frontier(spark, cfg)
        sid = catalog.overwrite(spark, "frontier", frontier)
        state = {"next_wave": 0, "done": False, "seen_count": 0,
                 "admitted_count": 0}
        _save_state(catalog, state)

    run = CrawlRun(catalog=catalog, cfg=cfg,
                   seen_count=state.get("seen_count", 0),
                   admitted_count=state.get("admitted_count", 0))
    corpus = corpus_from_link_graph(corpus) if "body_md" in corpus.columns \
        else corpus

    wave = state["next_wave"]
    while not state["done"] and wave < cfg.max_waves:
        frontier = catalog.read(spark, "frontier")
        seen = catalog.read(spark, "seen")

        # J1 — anti-join seen, sharded-bloom pre-pass once seen is large
        blooms = None
        if run.seen_count >= bloom_threshold:
            from axora_spark.operators.frontier import build_seen_filters
            blooms = build_seen_filters(seen, n_shards=32,
                                        fpp=cfg.seen_bloom_fpp,
                                        kind=seen_filter_kind)
        candidates = anti_join_seen(frontier, seen, blooms, n_shards=32,
                                    filter_kind=seen_filter_kind)

        # robots gate (target mode): disallowed URLs leave the frontier
        if robots_rules:
            from axora_spark.operators.robots import robots_filter
            candidates = robots_filter(candidates, robots_rules)

        # W1 — politeness admission
        admitted, deferred = politeness.admit(
            candidates, cfg.host_budget, salt=cfg.hot_host_salt,
            budget_overrides=budget_overrides or None)
        admitted = admitted.persist()
        n_admitted = admitted.count()

        if n_admitted == 0:
            state["done"] = True
            _save_state(catalog, state)
            admitted.unpersist()
            break

        # commit admission log + seen
        adm_log = admitted.select(
            F.lit(wave).alias("wave"), "host", "rank", "url", "depth")
        sid_adm = catalog.append(spark, "admitted", adm_log)
        sid_seen = catalog.append(
            spark, "seen",
            admitted.select("url_hash", "url", F.lit(wave).alias("wave")))

        # S3 — fetch
        fetched = fetch_from_corpus(admitted, corpus, wave).persist()

        # branch B — content pipeline
        if content_sink is not None:
            content_sink(spark, catalog, fetched, wave)

        # branch A — next frontier
        new_links = links_from_fetched(fetched, cfg, wave)
        union = (new_links
                 .unionByName(deferred.select(*new_links.columns))
                 .persist())
        nxt = dedup_within_wave(union)
        nxt = anti_join_seen(nxt, catalog.read(spark, "seen"), None)
        sid_frontier = catalog.overwrite(spark, "frontier", nxt)

        # A5 — metrics (per wave × host); deduped = rows removed from the
        # discovered∪deferred union by U1 collapse + the seen anti-join
        pre_by_host = union.groupBy("host").agg(
            F.count("*").alias("_pre"))
        post_by_host = (catalog.read(spark, "frontier").groupBy("host")
                        .agg(F.count("*").alias("_post")))
        dedup_by_host = (pre_by_host.join(post_by_host, "host", "left")
                         .na.fill(0, ["_post"])
                         .select("host",
                                 (F.col("_pre") - F.col("_post"))
                                 .alias("deduped")))
        union.unpersist()
        cand_by_host = candidates.groupBy("host").agg(
            F.count("*").alias("candidates"))
        adm_by_host = admitted.groupBy("host").agg(
            F.count("*").alias("admitted"))
        met = (cand_by_host.join(adm_by_host, "host", "left")
               .join(dedup_by_host, "host", "left")
               .na.fill(0, ["admitted", "deduped"])
               .select(F.lit(wave).alias("wave"), "host", "candidates",
                       "admitted",
                       (F.col("candidates") - F.col("admitted")).alias("deferred"),
                       F.col("deduped").cast("long")))
        sid_met = catalog.append(spark, "metrics", met)

        frontier_meta = catalog.snapshots("frontier")[-1]
        _record_lineage(spark, catalog, wave, [
            ("admitted", sid_adm, n_admitted, 0),
            ("seen", sid_seen, n_admitted, 0),
            ("frontier", sid_frontier, frontier_meta["n_rows"],
             frontier_meta["n_partitions"]),
            ("metrics", sid_met, 0, 0),
        ])

        run.seen_count += n_admitted
        run.admitted_count += n_admitted
        run.wave_metrics.append({"wave": wave, "admitted": n_admitted,
                                 "frontier_next": frontier_meta["n_rows"]})
        fetched.unpersist()
        admitted.unpersist()

        wave += 1
        state.update({"next_wave": wave, "seen_count": run.seen_count,
                      "admitted_count": run.admitted_count,
                      "done": frontier_meta["n_rows"] == 0})
        _save_state(catalog, state)
        run.waves_run = wave

        if stop_after_wave is not None and wave > stop_after_wave:
            break

    run.waves_run = wave
    return run
