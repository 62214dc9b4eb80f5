"""S3 — the real fetch stage shape (sources/fetch.fetch_http): mapInPandas
with an injectable transport; error rows follow the reference's
OnError-only-logs semantics (URL stays seen, yields no links/content)."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle
from axora_spark.plans import crawl
from axora_spark.sources import fetch


def test_fetch_http_stage(spark):
    pages = datagen.link_graph_rows(8, 3)
    html = {p["url"]: datagen.render_page_html(p) for p in pages}
    tp = fetch.dict_transport(html)
    admitted = spark.createDataFrame(
        [(p["url"], p["host"], 1) for p in pages]
        + [("https://hot.example.org/missing", "hot.example.org", 1)],
        "url string, host string, depth int")
    got = {r.url: r for r in fetch.fetch_http(admitted, 0, tp).collect()}
    assert len(got) == 9
    for p in pages:
        r = got[p["url"]]
        assert r.http_status == 200 and r.body_html == html[p["url"]]
        assert r.wave == 0 and r.depth == 1
    miss = got["https://hot.example.org/missing"]
    assert miss.http_status == 404 and miss.body_html is None


def test_transport_errors_map_to_status(spark):
    def flaky(url):
        if url.endswith("/1"):
            return 0, None          # network error / timeout
        if url.endswith("/2"):
            return 503, "ignored"   # non-200: body discarded
        return 200, "<html><body><p>ok</p></body></html>"
    admitted = spark.createDataFrame(
        [(f"https://h.example.org/{i}", "h.example.org", 1)
         for i in range(4)], "url string, host string, depth int")
    got = {r.url[-1]: r for r in
           fetch.fetch_http(admitted, 2, flaky).collect()}
    assert got["1"].http_status == 0 and got["1"].body_html is None
    assert got["2"].http_status == 503 and got["2"].body_html is None
    assert got["0"].http_status == 200 and "ok" in got["0"].body_html


def test_crawl_through_fetch_http_matches_oracle(spark, catalog):
    """The crawl-order gate with the REAL fetch stage in the loop, plus
    fetch errors: pages dropped from the transport are fetch failures —
    their URLs stay seen but contribute no links (crawler.go OnError)."""
    pages = datagen.link_graph_rows(n_pages=60, seed=42)
    cfg = datagen.fixture_config(pages)

    # two pages become permanent fetch errors
    dead = {pages[5]["url"], pages[11]["url"]}
    html = {p["url"]: datagen.render_page_html(p) for p in pages
            if p["url"] not in dead}
    live_pages = [p for p in pages if p["url"] not in dead]
    want = oracle.simulate(live_pages, cfg)

    def fetcher(admitted, wave):
        return fetch.fetch_http(admitted, wave,
                                fetch.dict_transport(html), n_threads=4)

    crawl.run_crawl(spark, catalog, cfg, corpus=None, fetcher=fetcher)
    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen
    # the dead URLs were admitted (seen) in some wave iff discovered —
    # and produced nothing; either way the final states match the oracle
    assert want.admitted  # non-vacuous
