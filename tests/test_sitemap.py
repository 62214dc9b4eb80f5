"""Sitemap source (sources/sitemap.py): protocol parsing, distributed
index expansion through the injectable transport, frontier adaptation,
and a sitemap-seeded crawl session whose admission order follows the
site's own declared priorities."""

from __future__ import annotations

import tempfile

from axora_spark.sources.sitemap import (expand_sitemaps, parse_sitemap,
                                         sitemap_seed_frontier)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries, ns=True):
    items = "".join(
        "<url>" + "".join(f"<{k}>{v}</{k}>" for k, v in e.items())
        + "</url>" for e in entries)
    return f'<?xml version="1.0"?><urlset {_NS if ns else ""}>{items}</urlset>'


def test_parse_urlset_truth_table():
    xml = _urlset([
        {"loc": "https://s.example.com/a", "lastmod": "2026-08-01",
         "changefreq": "daily", "priority": "0.9"},
        {"loc": "https://s.example.com/b"},
        {"loc": "  https://s.example.com/c  ", "priority": "high"},
        {"lastmod": "2026-01-01"},  # no loc → dropped
    ])
    got = parse_sitemap(xml)
    assert got["kind"] == "urlset"
    assert got["entries"] == [
        {"loc": "https://s.example.com/a", "lastmod": "2026-08-01",
         "changefreq": "daily", "priority": 0.9},
        {"loc": "https://s.example.com/b", "lastmod": None,
         "changefreq": None, "priority": None},
        {"loc": "https://s.example.com/c", "lastmod": None,
         "changefreq": None, "priority": None},  # bad priority → None
    ]


def test_parse_bare_namespace_and_index_and_errors():
    bare = _urlset([{"loc": "https://s.example.com/x"}], ns=False)
    assert parse_sitemap(bare)["entries"][0]["loc"] == \
        "https://s.example.com/x"
    idx = (f'<sitemapindex {_NS}><sitemap>'
           '<loc>https://s.example.com/sm1.xml</loc>'
           '<lastmod>2026-08-01</lastmod></sitemap></sitemapindex>')
    got = parse_sitemap(idx)
    assert got["kind"] == "sitemapindex"
    assert got["entries"][0]["loc"] == "https://s.example.com/sm1.xml"
    assert parse_sitemap("not xml <")["kind"] == "error"
    assert parse_sitemap("<html></html>")["kind"] == "error"


def _transport(files):
    from axora_spark.sources.fetch import dict_transport
    return dict_transport(files)


def test_expand_sitemaps_two_levels(spark):
    files = {
        "https://s.example.com/sitemap.xml":
            (f'<sitemapindex {_NS}>'
             '<sitemap><loc>https://s.example.com/sm1.xml</loc></sitemap>'
             '<sitemap><loc>https://s.example.com/sm2.xml</loc></sitemap>'
             '<sitemap><loc>https://s.example.com/dead.xml</loc></sitemap>'
             '</sitemapindex>'),
        "https://s.example.com/sm1.xml": _urlset(
            [{"loc": f"https://s.example.com/p/{i}", "priority": "0.8"}
             for i in range(3)]),
        "https://s.example.com/sm2.xml": _urlset(
            [{"loc": "https://s.example.com/q"}]),
        "https://other.example.com/plain.xml": _urlset(
            [{"loc": "https://other.example.com/r",
              "lastmod": "2026-02-03"}]),
    }
    got = expand_sitemaps(spark, ["https://s.example.com/sitemap.xml",
                                  "https://other.example.com/plain.xml"],
                          _transport(files))
    rows = {r["loc"]: r for r in got.collect()}
    assert set(rows) == ({f"https://s.example.com/p/{i}" for i in range(3)}
                         | {"https://s.example.com/q",
                            "https://other.example.com/r"})
    assert rows["https://s.example.com/p/0"]["priority"] == 0.8
    assert rows["https://other.example.com/r"]["lastmod"] == "2026-02-03"
    assert rows["https://s.example.com/q"]["sitemap_url"] == \
        "https://s.example.com/sm2.xml"


def test_seed_frontier_filters_dedup_and_priority(spark):
    from axora_spark.config import CrawlConfig
    from axora_spark.sources.sitemap import ENTRY
    from pyspark.sql import types as T
    cfg = CrawlConfig(seeds=(), allowed_domains=("s.example.com",))
    schema = T.StructType([T.StructField("sitemap_url", T.StringType())]
                          + list(ENTRY.fields))
    entries = spark.createDataFrame([
        ("sm", "https://s.example.com/a", None, None, 0.3),
        ("sm", "https://s.example.com/a", None, None, 0.9),  # dup: max wins
        ("sm", "https://s.example.com/b", None, None, None),  # default 0.5
        ("sm", "https://evil.example.net/x", None, None, 1.0),  # off-domain
    ], schema)
    got = {r["url"]: r for r in
           sitemap_seed_frontier(spark, cfg, entries).collect()}
    assert set(got) == {"https://s.example.com/a",
                        "https://s.example.com/b"}
    assert got["https://s.example.com/a"]["priority"] == 0.9
    assert got["https://s.example.com/b"]["priority"] == 0.5
    assert all(r["depth"] == 1 and r["status"] == "pending"
               for r in got.values())


def test_sitemap_seeded_crawl_admits_by_declared_priority(spark):
    from axora_spark import schemas
    from axora_spark.catalog import SnapshotCatalog
    from axora_spark.config import CrawlConfig
    from axora_spark.plans import crawl

    urls = [f"https://s.example.com/p/{i}" for i in range(6)]
    prios = [0.1, 0.9, 0.5, 0.8, 0.3, 0.7]
    files = {"https://s.example.com/sitemap.xml": _urlset(
        [{"loc": u, "priority": str(p)} for u, p in zip(urls, prios)])}
    entries = expand_sitemaps(spark, ["https://s.example.com/sitemap.xml"],
                              _transport(files))
    cfg = CrawlConfig(seeds=(), allowed_domains=("s.example.com",),
                      max_waves=2,
                      per_host_parallelism=3, per_host_delay_s=5.0,
                      wave_seconds=5.0)  # budget 3/host/wave
    fr = sitemap_seed_frontier(spark, cfg, entries)
    corpus = spark.createDataFrame(
        [{"url": u, "host": "s.example.com", "title": None, "metas": None,
          "body_md": "x", "out_links": []} for u in urls],
        schemas.LINK_GRAPH)
    cat = SnapshotCatalog(tempfile.mkdtemp())
    crawl.run_crawl(spark, cat, cfg, corpus, initial_frontier=fr)
    adm = [(r["wave"], r["rank"], r["url"]) for r in
           cat.read(spark, "admitted").orderBy("wave", "rank").collect()]
    # wave 0 admits the 3 highest sitemap priorities, in priority order
    assert [u for _, _, u in adm[:3]] == [urls[1], urls[3], urls[5]]
    # the rest defer to wave 1, still priority-ordered
    assert [u for _, _, u in adm[3:]] == [urls[2], urls[4], urls[0]]


def test_robots_sitemap_autodiscovery(spark):
    # Sitemap: is group-independent (sitemaps.org autodiscovery) — it
    # must be collected outside User-agent:* groups and feed the same
    # expansion path as explicit sitemap URLs
    from axora_spark.operators.robots import parse_robots
    robots = ("User-agent: googlebot\nDisallow: /private\n\n"
              "Sitemap: https://s.example.com/sm_a.xml\n"
              "User-agent: *\nDisallow: /tmp\n"
              "Sitemap: https://s.example.com/sm_b.xml\n")
    rules = parse_robots(robots)
    assert rules.sitemaps == ["https://s.example.com/sm_a.xml",
                              "https://s.example.com/sm_b.xml"]
    assert rules.disallows == ["/tmp"]  # group scoping unchanged
    files = {u: _urlset([{"loc": f"https://s.example.com/{n}"}])
             for u, n in [("https://s.example.com/sm_a.xml", "a"),
                          ("https://s.example.com/sm_b.xml", "b")]}
    got = expand_sitemaps(spark, rules.sitemaps, _transport(files))
    assert {r["loc"] for r in got.collect()} == \
        {"https://s.example.com/a", "https://s.example.com/b"}


def test_sitemap_revisit_lastmod_bridge(spark):
    # declared-freshness revisit: NEW and lastmod-newer entries re-enter
    # the frontier; unchanged, older, and undeclared-on-stored entries
    # don't (re-fetching the whole inventory is the failure mode)
    from axora_spark.config import CrawlConfig
    from axora_spark.sources.sitemap import ENTRY, sitemap_revisit
    from pyspark.sql import types as T
    cfg = CrawlConfig(seeds=(), allowed_domains=("s.example.com",))
    schema = T.StructType([T.StructField("sitemap_url", T.StringType())]
                          + list(ENTRY.fields))
    entries = spark.createDataFrame([
        ("sm", "https://s.example.com/new", "2026-08-01", None, 0.9),
        ("sm", "https://s.example.com/changed", "2026-08-10", None, None),
        ("sm", "https://s.example.com/same", "2026-07-01", None, 0.8),
        ("sm", "https://s.example.com/older", "2026-06-01", None, 0.8),
        ("sm", "https://s.example.com/nodate", None, None, 0.8),
        ("sm", "https://s.example.com/nodate_new", None, None, 0.7),
    ], schema)
    stored = spark.createDataFrame([
        ("https://s.example.com/changed", "2026-08-01"),
        ("https://s.example.com/same", "2026-07-01"),
        ("https://s.example.com/older", "2026-07-01"),
        ("https://s.example.com/nodate", None),
    ], "url string, fetched_lastmod string")
    got = {r["url"]: r["priority"] for r in
           sitemap_revisit(cfg, entries, stored).collect()}
    assert got == {"https://s.example.com/new": 0.9,
                   "https://s.example.com/changed": 0.5,
                   "https://s.example.com/nodate_new": 0.7}
