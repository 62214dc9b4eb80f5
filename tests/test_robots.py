"""Robots gating (north_rule target mode): parser, longest-match decision,
crawl-delay budget override, and engine≡oracle with robots_mode on."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle, schemas
from axora_spark.operators.robots import (HostRules, host_budget_with_robots,
                                          is_allowed, parse_robots)
from axora_spark.plans import crawl


def test_parse_robots_groups():
    r = parse_robots("User-agent: googlebot\nDisallow: /\n"
                     "User-agent: *\nDisallow: /private\nCrawl-delay: 7\n")
    assert r.disallows == ["/private"]
    assert r.crawl_delay == 7.0


def test_parse_comments_and_blank():
    r = parse_robots("# hi\nUser-agent: *\n\nDisallow: /a  # tail\n")
    assert r.disallows == ["/a"]


def test_longest_match_allow_wins():
    r = HostRules(allows=["/page/2"], disallows=["/page"])
    assert not is_allowed(r, "/page/1")
    assert is_allowed(r, "/page/2")
    assert is_allowed(r, "/page/21")   # prefix semantics
    assert is_allowed(r, "/other")


def test_no_rules_allows():
    assert is_allowed(None, "/x")
    assert is_allowed(HostRules(), "/x")


def test_disallow_all():
    r = parse_robots("User-agent: *\nDisallow: /\n")
    assert not is_allowed(r, "/")
    assert not is_allowed(r, "/any/page")


def test_budget_override():
    # base delay 5s, parallelism 3, wave 20s → 12; crawl-delay 10 → 6
    assert host_budget_with_robots(12, 20.0, 3, 10.0) == 6
    assert host_budget_with_robots(12, 20.0, 3, None) == 12
    assert host_budget_with_robots(12, 20.0, 3, 1000.0) == 1  # floor 1


@pytest.fixture(scope="module")
def fixture_pages():
    return datagen.link_graph_rows(n_pages=120, seed=42)


def test_robots_crawl_matches_oracle(spark, catalog, fixture_pages):
    cfg = datagen.fixture_config(fixture_pages, robots_mode=True)
    robots = datagen.fixture_robots()
    want = oracle.simulate(fixture_pages, cfg, robots_txt=robots)

    # robots must actually bite: gamma fully blocked, hot host throttled
    hosts_admitted = {h for _, h, _, _, _ in want.admitted}
    assert datagen.HOSTS[3] not in hosts_admitted
    base = oracle.simulate(fixture_pages, cfg)
    assert len(want.admitted) < len(base.admitted)

    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus, robots_txt=robots)
    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen
