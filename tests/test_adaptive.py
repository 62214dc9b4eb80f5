"""Latency-adaptive politeness (operators/adaptive.py): the budget
operator against its pure-Python twin, and a full crawl session where a
slow host provably throttles — engine byte-identical to the oracle."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle, schemas
from axora_spark.operators import adaptive
from axora_spark.plans import crawl
from pyspark.sql import functions as F

SLOW_HOST = "hot.example.org"
SLOW_MS = 9000          # EWMA -> delay 2x9000=18s -> budget 30000/18000=1
FAST_MS = 400           # below the 5s floor -> static budget stays


@pytest.fixture(scope="module")
def fixture_pages():
    rows = datagen.link_graph_rows(n_pages=120, seed=42)
    for r in rows:
        r["fetch_ms"] = SLOW_MS if r["host"] == SLOW_HOST else FAST_MS
    return rows


def test_latency_budgets_matches_py_twin(spark):
    # varied per-wave means, incl. a host seen in only one wave
    rows = [("a", 0, 1000, 2), ("a", 1, 9000, 3), ("a", 2, 4000, 1),
            ("b", 0, 100, 1), ("b", 2, 300, 3),
            ("c", 1, 50_000, 4)]
    obs = spark.createDataFrame(rows, schemas.FETCH_OBS)
    num_ms, prior = 30_000.0, 2500.0
    got = {r.host: (r.n_waves, r.est_ms, r._budget)
           for r in adaptive.latency_budgets(
               obs, num_ms=num_ms, prior_ms=prior,
               min_delay_ms=5000.0, max_budget=6).collect()}
    by_host: dict[str, list[tuple[int, float]]] = {}
    for h, w, s, n in rows:
        by_host.setdefault(h, []).append((w, s / n))
    for h, means in by_host.items():
        want_b = adaptive.latency_budget_py(
            means, num_ms=num_ms, prior_ms=prior,
            min_delay_ms=5000.0, max_budget=6)
        assert got[h][0] == len(means)
        assert got[h][2] == want_b, h
    # semantics: c's single 12.5s-mean wave EWMAs with the 2.5s prior
    # to est 7.5s -> delay 15s -> budget 30s/15s = 2 (throttled);
    # b stays at the 5s-floor budget (30s/5s = 6)
    assert got["c"][2] == 2
    assert got["b"][2] == 6


def test_observe_fetches_grain(spark):
    fetched = spark.createDataFrame(
        [("h1", "u1", 100), ("h1", "u2", 300), ("h2", "u3", 50),
         ("h2", "u4", None)],
        "host string, url string, fetch_ms long")
    got = {r.host: (r.sum_ms, r.n)
           for r in adaptive.observe_fetches(fetched, 3).collect()}
    assert got == {"h1": (400, 2), "h2": (50, 1)}  # null row excluded


def test_adaptive_crawl_identical_to_oracle(spark, catalog, fixture_pages):
    cfg = datagen.fixture_config(fixture_pages, adaptive_politeness=True)
    want = oracle.simulate(fixture_pages, cfg)

    # adaptivity must actually change the session vs the static config
    base = oracle.simulate(fixture_pages,
                           datagen.fixture_config(fixture_pages))
    assert want.admitted != base.admitted

    # StructType.add MUTATES in place — build a copy, never extend the
    # shared module-level schema (code-review r5)
    from pyspark.sql import types as T
    schema = T.StructType(list(schemas.LINK_GRAPH.fields)
                          + [T.StructField("fetch_ms", T.LongType())])
    corpus = spark.createDataFrame(fixture_pages, schema)
    crawl.run_crawl(spark, catalog, cfg, corpus)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen

    # the slow host throttles to 1 URL/wave once observed (wave >= 1),
    # while wave 0 (no observations) used the static budget
    per_wave = {
        (r.wave, r.host): r.admitted
        for r in catalog.read(spark, "metrics").collect()}
    slow_waves = sorted(w for (w, h) in per_wave if h == SLOW_HOST)
    assert any(per_wave[(w, SLOW_HOST)] == 1 for w in slow_waves[1:])
    static_budget = cfg.host_budget
    fast = [(w, h) for (w, h) in per_wave
            if h != SLOW_HOST and per_wave[(w, h)] == static_budget]
    assert fast, "no fast host ever used the full static budget"

    # folded EWMA state is O(hosts): exactly one row per observed host,
    # however many waves ran (the trap_state lesson)
    st = catalog.read(spark, "fetch_state")
    assert st.groupBy("host").count() \
             .filter(F.col("count") > 1).count() == 0
    assert st.filter(F.col("n_waves") > 1).count() > 0  # folding happened


def test_adaptive_resume_identical(spark, catalog, fixture_pages):
    """A crash+resume mid-session must reproduce the adaptive session
    exactly: budgets derive from the fetch_state EWMA table, which is
    lineage-managed — a rolled-back wave's observations must not leak
    into the resumed budgets."""
    cfg = datagen.fixture_config(fixture_pages, adaptive_politeness=True)
    want = oracle.simulate(fixture_pages, cfg)

    from pyspark.sql import types as T
    schema = T.StructType(list(schemas.LINK_GRAPH.fields)
                          + [T.StructField("fetch_ms", T.LongType())])
    corpus = spark.createDataFrame(fixture_pages, schema)

    crawl.run_crawl(spark, catalog, cfg, corpus, stop_after_wave=1)
    # mid-wave-2 crash: the wave's fetch_state OVERWRITE committed,
    # state file not saved — resume must roll back to the wave-1
    # snapshot or the replayed wave would fold its mean twice
    poisoned = spark.createDataFrame(
        [("hot.example.org", 999_999.0, 99)], schemas.FETCH_STATE)
    catalog.overwrite(spark, "fetch_state", poisoned)

    crawl.run_crawl(spark, catalog, cfg, corpus, resume=True)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    # the poisoned state is gone from the final table
    assert catalog.read(spark, "fetch_state") \
        .filter("est_ms = 999999.0 OR n_waves = 99").count() == 0


def test_robots_and_adaptive_compose_most_polite(spark, catalog,
                                                 fixture_pages):
    """Robots crawl-delay and adaptive budgets compose by MIN: the hot
    fixture host has robots crawl-delay 10 (budget 3) AND 9s observed
    latency (adaptive budget 1 once observed) — waves >= 1 must use 1.
    Engine byte-identical to the oracle with both modes on."""
    cfg = datagen.fixture_config(fixture_pages, adaptive_politeness=True,
                                 robots_mode=True)
    robots = datagen.fixture_robots()
    want = oracle.simulate(fixture_pages, cfg, robots_txt=robots)

    # composition must differ from robots-only (the adaptive min bites)
    ro = oracle.simulate(
        fixture_pages,
        datagen.fixture_config(fixture_pages, robots_mode=True),
        robots_txt=robots)
    assert want.admitted != ro.admitted

    from pyspark.sql import types as T
    schema = T.StructType(list(schemas.LINK_GRAPH.fields)
                          + [T.StructField("fetch_ms", T.LongType())])
    corpus = spark.createDataFrame(fixture_pages, schema)
    crawl.run_crawl(spark, catalog, cfg, corpus, robots_txt=robots)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted

    # the hot host's admitted-per-wave after first observation is the
    # ADAPTIVE budget (1), tighter than the robots budget (3)
    per_wave = {(r.wave, r.host): r.admitted
                for r in catalog.read(spark, "metrics").collect()}
    slow = sorted(w for (w, h) in per_wave if h == SLOW_HOST)
    assert any(per_wave[(w, SLOW_HOST)] == 1 for w in slow[1:])


def test_state_fold_equals_log_closed_form(spark):
    """The incremental fold over per-wave obs must equal the log-based
    closed form bit-for-bit (integer-ms means) — the contract that lets
    the crawl swap the growing log for O(hosts) state."""
    rows = [("a", 0, 1000, 2), ("a", 1, 9000, 3), ("a", 2, 4000, 1),
            ("b", 0, 100, 1), ("b", 2, 300, 3),
            ("c", 1, 50_000, 4)]
    num_ms, prior = 30_000.0, 2500.0
    obs = spark.createDataFrame(rows, schemas.FETCH_OBS)
    log_b = {r.host: r._budget
             for r in adaptive.latency_budgets(
                 obs, num_ms=num_ms, prior_ms=prior,
                 min_delay_ms=5000.0, max_budget=6).collect()}
    # replay wave by wave through the state fold
    state = spark.createDataFrame([], schemas.FETCH_STATE)
    for w in (0, 1, 2):
        wave_obs = obs.filter(F.col("wave") == w)
        state = spark.createDataFrame(
            adaptive.merge_latency_state(state, wave_obs,
                                         prior_ms=prior).collect(),
            schemas.FETCH_STATE)
    st_b = {r.host: r._budget
            for r in adaptive.budgets_from_state(
                state, num_ms=num_ms, min_delay_ms=5000.0,
                max_budget=6).collect()}
    assert st_b == log_b
    n_waves = {r.host: r.n_waves for r in state.collect()}
    assert n_waves == {"a": 3, "b": 2, "c": 1}


def test_robots_fast_host_keeps_raised_budget(spark, catalog,
                                              fixture_pages):
    """A robots crawl-delay SHORTER than the static delay raises the
    host's budget; adaptivity must not silently demote it back once the
    host is observed fast — the adaptive delay floor is the host's OWN
    robots delay (code-review r5). Hot host: delay 2s -> budget 15,
    observed 400 ms -> adaptive floor(30000/max(800, 2000)) = 15."""
    pages = [dict(r) for r in fixture_pages]
    for r in pages:
        r["fetch_ms"] = FAST_MS  # every host fast, incl. the hot one
    robots = {SLOW_HOST: "User-agent: *\nCrawl-delay: 2\n"}
    cfg = datagen.fixture_config(pages, adaptive_politeness=True,
                                 robots_mode=True)
    want = oracle.simulate(pages, cfg, robots_txt=robots)

    from pyspark.sql import types as T
    schema = T.StructType(list(schemas.LINK_GRAPH.fields)
                          + [T.StructField("fetch_ms", T.LongType())])
    corpus = spark.createDataFrame(pages, schema)
    crawl.run_crawl(spark, catalog, cfg, corpus, robots_txt=robots)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    # the raised budget survives observation: some post-observation
    # wave admits MORE than the static budget (6) on the hot host
    per_wave = {(r.wave, r.host): r.admitted
                for r in catalog.read(spark, "metrics").collect()}
    slow = sorted(w for (w, h) in per_wave if h == SLOW_HOST)
    assert any(per_wave[(w, SLOW_HOST)] > cfg.host_budget
               for w in slow[1:]), per_wave


def test_resume_pre_fetch_state_warehouse(spark, catalog, fixture_pages):
    """A warehouse created before the fetch_state table existed must
    stay resumable when adaptivity is turned on at resume time
    (code-review r5: the resume branch skips init_tables, so the read
    raised). Faithful simulation: the interrupted session ran WITHOUT
    adaptivity (so no fetch_state lineage exists — an old warehouse has
    none) and the table directory is absent."""
    import shutil
    from pyspark.sql import types as T
    schema = T.StructType(list(schemas.LINK_GRAPH.fields)
                          + [T.StructField("fetch_ms", T.LongType())])
    corpus = spark.createDataFrame(fixture_pages, schema)

    cfg_off = datagen.fixture_config(fixture_pages)
    crawl.run_crawl(spark, catalog, cfg_off, corpus, stop_after_wave=1)
    # simulate the old-warehouse layout: no fetch_state table at all
    shutil.rmtree(catalog._table_dir("fetch_state"))
    assert not catalog.table_exists("fetch_state")

    cfg_on = datagen.fixture_config(fixture_pages,
                                    adaptive_politeness=True)
    run = crawl.run_crawl(spark, catalog, cfg_on, corpus, resume=True)
    assert run.waves_run >= 2                      # completed, no raise
    assert catalog.table_exists("fetch_state")     # recreated, refilled
    assert catalog.read(spark, "fetch_state").count() > 0
