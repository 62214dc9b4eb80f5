"""Freshness-driven recrawl scheduling (operators/recrawl.py): the
engine's change-rate estimator must equal the pure-Python Cho &
Garcia-Molina model bit-for-bit, its staleness output must drive the
politeness scheduler's admission order, and the whole job must plan a
single keyed exchange."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from axora_spark.operators.recrawl import (change_observations,
                                           estimate_change_rate,
                                           revisit_frontier)


def _model(rows, now):
    """Pure-Python twin of estimate_change_rate."""
    by = {}
    for u, w, h in rows:
        by.setdefault(u, []).append((w, h))
    out = {}
    for u, obs in by.items():
        obs.sort()
        n = len(obs)
        x = sum(1 for a, b in zip(obs, obs[1:]) if a[1] != b[1])
        if n > 1:
            ival = (obs[-1][0] - obs[0][0]) / (n - 1)
            lam = -math.log((n - 1 - x + 0.5) / (n - 1 + 0.5)) / ival
            st = 1.0 - math.exp(-lam * (now - obs[-1][0]))
        else:
            lam, st = None, 1.0
        out[u] = (n, x, lam, st)
    return out


_LOG = [
    # steady-change page: every revisit sees new content
    ("https://a.example.com/news", 0, "n0"),
    ("https://a.example.com/news", 2, "n1"),
    ("https://a.example.com/news", 4, "n2"),
    ("https://a.example.com/news", 6, "n3"),
    # static page: never changes
    ("https://a.example.com/about", 0, "s"),
    ("https://a.example.com/about", 3, "s"),
    ("https://a.example.com/about", 6, "s"),
    # mixed cadence, irregular intervals
    ("https://b.example.com/blog", 0, "b0"),
    ("https://b.example.com/blog", 1, "b0"),
    ("https://b.example.com/blog", 5, "b1"),
    # observed once — maximal uncertainty
    ("https://c.example.com/new", 6, "x"),
]


def test_estimator_matches_python_model(spark):
    obs = spark.createDataFrame(_LOG, "url string, wave int, "
                                      "content_hash string")
    got = {r["url"]: r for r in
           estimate_change_rate(obs, now_wave=8).collect()}
    want = _model(_LOG, 8)
    assert set(got) == set(want)
    for u, (n, x, lam, st) in want.items():
        r = got[u]
        assert r["n_obs"] == n and r["n_changes"] == x, u
        # JVM Math.log/exp and CPython libm may differ in the last ulp —
        # the driver compare rounds to 6dp, so pin at 1e-12 relative here
        if lam is None:
            assert r["change_rate"] is None
        else:
            assert math.isclose(r["change_rate"], lam, rel_tol=1e-12), u
        assert math.isclose(r["staleness"], st, rel_tol=1e-12), u
    # sanity on the model itself: the all-change page outranks the
    # static page, and the once-seen page is maximally stale
    assert want["https://a.example.com/news"][3] > \
        want["https://a.example.com/about"][3]
    assert want["https://c.example.com/new"][3] == 1.0


def test_change_observations_counts_intervals_not_versions(spark):
    # v0→v1→v0 is TWO changes (three versions seen, hash flips twice)
    rows = [("u", 0, "v0"), ("u", 1, "v1"), ("u", 2, "v0")]
    obs = spark.createDataFrame(rows, "url string, wave int, "
                                      "content_hash string")
    r = change_observations(obs).collect()[0]
    assert r["n_obs"] == 3 and r["n_changes"] == 2


def test_revisit_priority_drives_admission_order(spark):
    # one host, budget 2: the politeness scheduler must admit the two
    # stalest URLs and defer the fresh one — freshness model → W1 seam
    from axora_spark.operators.politeness import admit
    log = [
        ("https://h.example.com/hot", 0, "h0"),
        ("https://h.example.com/hot", 4, "h1"),   # changed, stale for 4
        ("https://h.example.com/cold", 0, "c"),
        ("https://h.example.com/cold", 4, "c"),   # unchanged
        ("https://h.example.com/unseen", 8, "u"),  # once → staleness 1.0
    ]
    obs = spark.createDataFrame(log, "url string, wave int, "
                                     "content_hash string")
    rates = estimate_change_rate(obs, now_wave=8)
    frontier = revisit_frontier(rates, min_staleness=0.0)
    admitted, deferred = admit(frontier, host_budget=2)
    adm = {r["url"]: r["rank"] for r in admitted.collect()}
    assert set(adm) == {"https://h.example.com/unseen",
                       "https://h.example.com/hot"}
    assert adm["https://h.example.com/unseen"] == 1  # staleness 1.0 first
    assert [r["url"] for r in deferred.collect()] == \
        ["https://h.example.com/cold"]


def test_min_staleness_gate(spark):
    log = [("https://h.example.com/cold", 0, "c"),
           ("https://h.example.com/cold", 4, "c")]
    obs = spark.createDataFrame(log, "url string, wave int, "
                                     "content_hash string")
    out = revisit_frontier(estimate_change_rate(obs, 8),
                           min_staleness=0.5).collect()
    assert out == []  # an unchanged page never re-enters the frontier


def test_recrawl_plan_single_keyed_exchange(spark):
    # the lag-window and the per-URL aggregate share
    # hashpartitioning(doc_id): ONE keyed exchange for the whole job
    # (the only other exchange is the scan-spread round-robin)
    from axora_spark.queries import q_recrawl_schedule
    plan = (q_recrawl_schedule(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" not in final


def test_revisit_session_through_run_crawl(spark):
    # full loop: estimate staleness from an observation log, build the
    # revisit frontier, and run it as a crawl session via the
    # initial_frontier seam — the politeness scheduler must admit the
    # stale set (and only it) in staleness order, through the catalog
    import tempfile
    from axora_spark import schemas
    from axora_spark.catalog import SnapshotCatalog
    from axora_spark.config import CrawlConfig
    from axora_spark.plans import crawl

    urls = [f"https://r.example.com/p/{i}" for i in range(6)]
    # p0,p1 changed on every revisit; p2,p3 never changed; p4 observed
    # once (staleness 1.0); p5 unchanged
    log = []
    for w in (0, 2, 4, 6):
        for i in (0, 1):
            log.append((urls[i], w, f"v{i}.{w}"))
        for i in (2, 3, 5):
            log.append((urls[i], w, f"s{i}"))
    log.append((urls[4], 6, "x"))
    obs = spark.createDataFrame(log, "url string, wave int, "
                                     "content_hash string")
    fr = revisit_frontier(estimate_change_rate(obs, now_wave=8),
                          min_staleness=0.5)
    fr = fr.withColumn("depth", F.lit(1)) \
           .withColumn("discovered_wave", F.lit(0)) \
           .withColumn("status", F.lit("pending"))
    cfg = CrawlConfig(seeds=(), allowed_domains=("r.example.com",),
                      max_depth=1, max_waves=2,
                      per_host_parallelism=3, per_host_delay_s=5.0,
                      wave_seconds=5.0)  # budget 3/host/wave
    corpus = spark.createDataFrame(
        [{"url": u, "host": "r.example.com", "title": None,
          "metas": None, "body_md": "x", "out_links": []}
         for u in urls], schemas.LINK_GRAPH)
    cat = SnapshotCatalog(tempfile.mkdtemp())
    crawl.run_crawl(spark, cat, cfg, corpus, initial_frontier=fr)
    adm = [(r["wave"], r["rank"], r["url"]) for r in
           cat.read(spark, "admitted").orderBy("wave", "rank").collect()]
    # stale set = p4 (1.0) then p0/p1 (equal staleness, url tie-break);
    # budget 3 admits all three in wave 0; fresh pages never crawled
    assert adm == [(0, 1, urls[4]), (0, 2, urls[0]), (0, 3, urls[1])]
