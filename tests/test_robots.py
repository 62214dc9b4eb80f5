"""Robots gating (north_rule target mode): parser, longest-match decision,
crawl-delay budget override, and engine≡oracle with robots_mode on."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle, schemas
from axora_spark.operators import robots
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


# ---------------- RFC 9309 wildcards + vectorized ≡ scalar ----------------

def test_wildcard_star_and_dollar():
    r = robots.parse_robots(
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /private*/x\n"
        "Allow: /private-ok/x\n")
    assert not robots.is_allowed(r, "/docs/report.pdf")
    assert robots.is_allowed(r, "/docs/report.pdf?dl=1")   # $ anchors end
    assert robots.is_allowed(r, "/docs/report.pdfx")
    assert not robots.is_allowed(r, "/private123/x")       # * mid-rule
    # allow rule (len 13) beats disallow /private*/x (len 11)
    assert robots.is_allowed(r, "/private-ok/x")
    assert robots.is_allowed(r, "/open/page")


def test_wildcard_literal_chars_escaped():
    r = robots.parse_robots("User-agent: *\nDisallow: /a.b\n")
    assert not robots.is_allowed(r, "/a.b/c")
    assert robots.is_allowed(r, "/aXb/c")  # '.' must be literal, not regex


def test_vectorized_filter_equals_scalar(spark):
    """robots_filter's per-host vectorized path must decide identically to
    the shared pure-Python is_allowed for every row, wildcards included."""
    rules = {
        "a.ex": robots.parse_robots(
            "User-agent: *\nDisallow: /*.pdf$\nDisallow: /priv\n"
            "Allow: /priv/ok*\n"),
        "b.ex": robots.parse_robots("User-agent: *\nDisallow: /\n"),
    }
    paths = ["/x.pdf", "/x.pdf?y", "/priv/a", "/priv/okz", "/p", "/", ""]
    rows = [(f"https://{h}{p}", h) for h in ("a.ex", "b.ex", "c.ex")
            for p in paths]
    df = spark.createDataFrame(rows, "url string, host string")
    got = {r.url for r in robots.robots_filter(df, rules).collect()}
    from axora_spark.functions import urlnorm
    want = {u for u, h in rows
            if robots.is_allowed(rules.get(h), urlnorm.path_of(u) or "/")}
    assert got == want
    assert 0 < len(want) < len(rows)
