"""S7 — per-URL cookie persistence (crawler/boltdb.go:85-113): latest-wins
jar table, presented on the next request to the SAME url, updated from
responses, idempotent under crash-resume replays, composing with run_crawl
through the fetcher seam."""

from __future__ import annotations

from pyspark.sql import functions as F

from axora_spark import datagen, oracle
from axora_spark.plans import crawl
from axora_spark.sources import cookies as ck


def _admitted(spark, urls, depth=1):
    return spark.createDataFrame(
        [(u, u.split("/")[2], depth) for u in urls],
        "url string, host string, depth int")


def test_jar_roundtrip_latest_wins(spark, catalog):
    """Wave 1 sets cookies; wave 2 must present exactly the stored value
    per url (echo transport writes the wire value into the body) and its
    new Set-Cookie must overwrite the old one."""
    urls = [f"https://h{i}.example.org/p" for i in range(4)]
    pages = {u: "<html><body>x</body></html>" for u in urls}

    tp1 = ck.dict_cookie_transport(
        pages, {u: f"sid={i}" for i, u in enumerate(urls[:3])}, echo=True)
    f1 = ck.fetch_http_cookies(
        ck.attach_cookies(_admitted(spark, urls),
                          spark.createDataFrame([], ck.COOKIES_SCHEMA)),
        wave=1, transport=tp1)
    # wave 1: empty jar → nothing presented
    assert all("<!--cookie:-->" in r.body_html for r in f1.collect())
    ck.update_cookie_jar(catalog, spark, f1, wave=1)

    jar = catalog.read(spark, "cookies")
    assert {(r.url, r.cookies) for r in jar.collect()} == \
        {(u, f"sid={i}") for i, u in enumerate(urls[:3])}

    # wave 2: stored cookies ride the request; url 0 gets a NEW cookie
    tp2 = ck.dict_cookie_transport(pages, {urls[0]: "sid=fresh"}, echo=True)
    f2 = ck.fetch_http_cookies(
        ck.attach_cookies(_admitted(spark, urls), jar), wave=2,
        transport=tp2)
    got = {r.url: r for r in f2.collect()}
    for i, u in enumerate(urls[:3]):
        assert f"<!--cookie:sid={i}-->" in got[u].body_html
    assert "<!--cookie:-->" in got[urls[3]].body_html  # never had one

    ck.update_cookie_jar(catalog, spark, f2, wave=2)
    after = {r.url: (r.cookies, r.updated_wave)
             for r in catalog.read(spark, "cookies").collect()}
    assert after[urls[0]] == ("sid=fresh", 2)    # overwritten
    assert after[urls[1]] == ("sid=1", 1)        # untouched
    assert urls[3] not in after


def test_upsert_replay_idempotent(spark, catalog):
    """A crash-resumed wave re-upserts identical rows — the jar must not
    change (same snapshot contents, deterministic collapse)."""
    urls = [f"https://h.example.org/{i}" for i in range(3)]
    pages = {u: "<p>x</p>" for u in urls}
    tp = ck.dict_cookie_transport(pages, {u: "a=1" for u in urls})
    fetched = ck.fetch_http_cookies(_admitted(spark, urls), 1, tp)
    ck.update_cookie_jar(catalog, spark, fetched, wave=1)
    before = sorted((r.url, r.cookies, r.updated_wave)
                    for r in catalog.read(spark, "cookies").collect())
    ck.update_cookie_jar(catalog, spark, fetched, wave=1)  # replay
    after = sorted((r.url, r.cookies, r.updated_wave)
                   for r in catalog.read(spark, "cookies").collect())
    assert before == after


def test_error_rows_set_nothing(spark, catalog):
    """404/network-error rows carry no Set-Cookie and must not enter the
    jar (the reference's jar is only written from real responses)."""
    urls = ["https://h.example.org/ok", "https://h.example.org/missing"]
    tp = ck.dict_cookie_transport({urls[0]: "<p>x</p>"},
                                  {urls[0]: "k=v", urls[1]: "never"})
    fetched = ck.fetch_http_cookies(_admitted(spark, urls), 1, tp)
    got = {r.url: r for r in fetched.collect()}
    assert got[urls[1]].http_status == 404
    assert got[urls[1]].set_cookie is None
    ck.update_cookie_jar(catalog, spark, fetched, wave=1)
    assert [r.url for r in catalog.read(spark, "cookies").collect()] == \
        [urls[0]]


def test_cookie_fetcher_through_run_crawl(spark, catalog):
    """make_cookie_fetcher plugs into run_crawl's fetcher seam: the crawl
    order still matches the oracle exactly AND every page fetched in wave
    w>0 whose url was cookied in an earlier wave presented that cookie
    (echo transport; multi-wave fixture graph)."""
    pages = datagen.link_graph_rows(n_pages=40, seed=7)
    cfg = datagen.fixture_config(pages)
    html = {p["url"]: datagen.render_page_html(p) for p in pages}
    set_cookies = {p["url"]: f"sid={p['url'].rsplit('/', 1)[-1]}"
                   for p in pages}
    want = oracle.simulate(pages, cfg)

    tp = ck.dict_cookie_transport(html, set_cookies, echo=True)
    fetcher = ck.make_cookie_fetcher(catalog, tp, n_threads=4)
    crawl.run_crawl(spark, catalog, cfg, corpus=None, fetcher=fetcher)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted

    # every admitted url that answered got its cookie stored
    jar = {r.url: r.cookies for r in
           catalog.read(spark, "cookies").collect()}
    seen_urls = {r.url for r in catalog.read(spark, "seen").collect()}
    fetched_ok = seen_urls & set(html)
    assert jar == {u: set_cookies[u] for u in fetched_ok}
    assert len(jar) > 1  # non-vacuous: multiple waves ran

    # re-crawling the same seeds with the warm jar presents cookies on
    # wave-0 seeds too (persistence across RUNS, the BoltDB property)
    docs_cols = ["url", "host", "depth"]
    seeds = catalog.read(spark, "seen").filter(F.col("wave") == 0)
    refetch = ck.fetch_http_cookies(
        ck.attach_cookies(
            seeds.select("url",
                         F.split("url", "/").getItem(2).alias("host"),
                         F.lit(1).alias("depth")).select(*docs_cols),
            catalog.read(spark, "cookies")),
        wave=99, transport=tp)
    for r in refetch.collect():
        if r.url in set_cookies and r.http_status == 200:
            assert f"<!--cookie:{set_cookies[r.url]}-->" in r.body_html
