"""Target-mode variants: cuckoo seen-filter path and url_score priorities —
engine must stay byte-identical to the oracle in every mode."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle, schemas
from axora_spark.plans import crawl


@pytest.fixture(scope="module")
def fixture_pages():
    return datagen.link_graph_rows(n_pages=120, seed=42)


def _compare(spark, catalog, want):
    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen


def test_cuckoo_filter_path_identical(spark, catalog, fixture_pages):
    cfg = datagen.fixture_config(fixture_pages)
    want = oracle.simulate(fixture_pages, cfg)
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus, bloom_threshold=1,
                    seen_filter_kind="cuckoo")
    _compare(spark, catalog, want)


def test_priority_mode_url_score(spark, catalog, fixture_pages):
    cfg = datagen.fixture_config(fixture_pages, priority_mode="url_score")
    want = oracle.simulate(fixture_pages, cfg)

    # priorities must actually change the admission order vs compat mode
    base = oracle.simulate(fixture_pages,
                           datagen.fixture_config(fixture_pages))
    assert [t[3] for t in want.admitted] != [t[3] for t in base.admitted]

    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus)
    _compare(spark, catalog, want)


def test_priority_mode_pagerank(spark, catalog, fixture_pages):
    # VERDICT r4 #5: ranks over the crawl's OWN extracted link graph
    # feed W1 admission — engine must match the pure-Python pagerank
    # twin exactly, and admission order must provably follow rank.
    cfg = datagen.fixture_config(fixture_pages, priority_mode="pagerank")
    want = oracle.simulate(fixture_pages, cfg)

    # authority ordering must actually differ from FIFO-compat mode
    base = oracle.simulate(fixture_pages,
                           datagen.fixture_config(fixture_pages))
    assert [t[3] for t in want.admitted] != [t[3] for t in base.admitted]

    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus)
    _compare(spark, catalog, want)

    # admission provably follows rank: for every wave>0 host group, the
    # admitted sequence is ordered by (priority DESC, url ASC) where
    # priority IS the 6dp pagerank of the frontier that wave — check
    # against an independently recomputed rank map from the links table
    from decimal import ROUND_HALF_UP, Decimal

    from axora_spark.operators.pagerank import pagerank as pr_op
    from pyspark.sql import functions as F
    links = catalog.read(spark, "links")
    assert links.count() > 0
    fr = catalog.read(spark, "frontier")  # final wave's scored frontier
    # recompute ranks over edges up to the LAST wave that admitted
    last_wave = max(t[0] for t in want.admitted)
    edges = (links.filter(F.col("wave") < last_wave)
             .select("src", "dst").distinct())
    nodes = (edges.select(F.col("src").alias("doc_id"))
             .unionByName(edges.select(F.col("dst").alias("doc_id")))
             .distinct())
    ranks = {r.doc_id: r.r for r in pr_op(edges, nodes).collect()}

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               ROUND_HALF_UP))

    from axora_spark.operators.urls import url_hash
    admitted_last = [t for t in want.admitted if t[0] == last_wave]
    hashes = {r.url: r.h for r in spark.createDataFrame(
        [(t[3],) for t in admitted_last], "url string")
        .select("url", url_hash(F.col("url")).alias("h")).collect()}
    by_host = {}
    for _w, host, rank, url, _d in sorted(admitted_last,
                                          key=lambda t: (t[1], t[2])):
        by_host.setdefault(host, []).append(url)
    for host, urls in by_host.items():
        scored = [(-round6(ranks.get(hashes[u], 0.0)), u) for u in urls]
        assert scored == sorted(scored), (host, scored)
    # and at least one host's order is genuinely rank-driven (non-equal
    # priorities), not all ties
    assert any(len({s for s, _ in
                    [(-round6(ranks.get(hashes[u], 0.0)), u)
                     for u in urls]}) > 1
               for urls in by_host.values())


def test_pagerank_rank_every_cadence(spark, catalog, fixture_pages):
    # rank_every=2: the power iteration runs on waves 0,2,4...; off
    # waves reuse the committed rank table (stale-but-cheap) — oracle
    # twin mirrors the cadence exactly, and the ranks table shows
    # fewer overwrites than waves run
    cfg = datagen.fixture_config(fixture_pages, priority_mode="pagerank",
                                 rank_every=2)
    want = oracle.simulate(fixture_pages, cfg)
    # cadence is semantic: every-wave ranking must differ somewhere
    w1 = oracle.simulate(fixture_pages, datagen.fixture_config(
        fixture_pages, priority_mode="pagerank"))
    assert want.admitted != w1.admitted
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    run = crawl.run_crawl(spark, catalog, cfg, corpus)
    _compare(spark, catalog, want)
    n_rank_commits = len([s for s in catalog.snapshots("ranks")])
    assert n_rank_commits == (run.waves_run + 1) // 2


def test_pagerank_operator_vs_twin_self_loops(spark):
    # code-review r5: the engine derives the node universe from the
    # links table BEFORE the operator drops self-loops, so a page whose
    # only link is itself is still a node; the oracle twin must agree
    from pyspark.sql import functions as F

    from axora_spark.operators.pagerank import pagerank
    from axora_spark.oracle import _pagerank_py, _round6
    edge_set = {(1, 2), (2, 1), (3, 3), (2, 4)}
    edges = spark.createDataFrame(sorted(edge_set), "src long, dst long")
    nodes = (edges.select(F.col("src").alias("doc_id"))
             .unionByName(edges.select(F.col("dst").alias("doc_id")))
             .distinct())
    got = {r.doc_id: _round6(r.r)
           for r in pagerank(edges, nodes).collect()}
    want = {k: _round6(v) for k, v in _pagerank_py(edge_set).items()}
    assert got == want
    assert 3 in got  # the self-loop-only node IS ranked (dangling)


def test_domain_quota_engine_equals_oracle(spark, catalog, fixture_pages):
    # cumulative per-host budget (IRLbot-style domain quotas): engine
    # admission log must stay byte-identical to the oracle, every host
    # must respect the cap, and the quota must actually bind vs the
    # unquotaed session
    cfg = datagen.fixture_config(fixture_pages, domain_quota=9)
    want = oracle.simulate(fixture_pages, cfg)
    base = oracle.simulate(fixture_pages,
                           datagen.fixture_config(fixture_pages))
    per_host: dict[str, int] = {}
    for _, h, _, _, _ in want.admitted:
        per_host[h] = per_host.get(h, 0) + 1
    assert max(per_host.values()) <= 9
    assert len(want.admitted) < len(base.admitted)  # the cap bound
    # the hot host hits the quota exactly (it admits 6 in wave 0 alone)
    assert max(per_host.values()) == 9

    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus)
    _compare(spark, catalog, want)


def test_domain_quota_binds_on_first_wave(spark, catalog, fixture_pages):
    # ADVICE r5 (high): quota_caps derives from the admitted table, so a
    # zero-history host is ABSENT from the caps frame and the engine
    # coalesced its cap to INT_MAX — a host first seen with more
    # candidates than the whole quota admitted them all (engine 6 vs
    # oracle 2). The cap_default plumbing must make the quota bind from
    # a host's very first admitting wave.
    cfg = datagen.fixture_config(fixture_pages, domain_quota=2)
    want = oracle.simulate(fixture_pages, cfg)
    per_host: dict[str, int] = {}
    for _, h, _, _, _ in want.admitted:
        per_host[h] = per_host.get(h, 0) + 1
    # the quota must bind below any host's wave-0 candidate count
    assert max(per_host.values()) <= 2

    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus)
    _compare(spark, catalog, want)
