"""Bounded frontier state (operators/frontier.cap_frontier_per_host):
operator-level top-k semantics + WindowGroupLimit plan shape, and a full
crawl session with the cap on — engine byte-identical to the oracle."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle, schemas
from axora_spark.operators.frontier import cap_frontier_per_host
from axora_spark.plans import crawl
from pyspark.sql import functions as F


def test_cap_keeps_top_priority_per_host(spark):
    rows = [("h1", f"https://h1/{i}", float(i % 5), 100 + i)
            for i in range(20)]
    rows += [("h2", "https://h2/only", 0.0, 7)]
    df = spark.createDataFrame(
        rows, "host string, url string, priority double, url_hash long")
    got = cap_frontier_per_host(df, cap=3, salt=4).collect()
    # pure-python mirror: top-3 by (priority DESC, url ASC)
    prio = {u: p for _, u, p, _ in rows}
    h1 = sorted((u for h, u, _, _ in rows if h == "h1"),
                key=lambda u: (-prio[u], u))[:3]
    assert {r.url for r in got if r.host == "h1"} == set(h1)
    assert {r.url for r in got if r.host == "h2"} == {"https://h2/only"}
    assert len(got) == 4


def test_cap_plan_uses_window_group_limit(spark):
    df = spark.createDataFrame(
        [("h", "u", 0.0, 1)],
        "host string, url string, priority double, url_hash long")
    plan = cap_frontier_per_host(df, cap=5)._jdf.queryExecution() \
        .executedPlan().toString()
    # literal cap -> per-partition top-k pruning BEFORE both sorts
    assert plan.count("WindowGroupLimit") >= 2


def test_capped_crawl_identical_to_oracle(spark, catalog):
    pages = datagen.link_graph_rows(n_pages=120, seed=42)
    cfg = datagen.fixture_config(pages, frontier_host_cap=4)
    want = oracle.simulate(pages, cfg)

    # the cap must actually bite vs the uncapped session
    base = oracle.simulate(pages, datagen.fixture_config(pages))
    assert want.admitted != base.admitted
    assert len(want.seen) < len(base.seen)

    corpus = spark.createDataFrame(pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    assert {r.url for r in catalog.read(spark, "seen").collect()} \
        == want.seen

    # every persisted frontier snapshot is bounded per host: the FINAL
    # table is the last wave's write; check it directly
    per_host = (catalog.read(spark, "frontier").groupBy("host")
                .agg(F.count("*").alias("n")).collect())
    assert all(r.n <= 4 for r in per_host)
