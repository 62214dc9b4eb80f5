"""Crawl-trap detection (operators/traps.py): signature extraction
truth table, family profiling rules, the frontier gate, and the
run_crawl integration — a calendar that mints unbounded distinct URLs
must stop being scheduled once its family crosses the volume
threshold, while innocent hosts crawl on unaffected."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from axora_spark.operators.traps import (detect_traps, trap_filter,
                                         with_url_signature)


def test_url_signature_truth_table(spark):
    cases = [
        ("https://a.example.com/cal/2025/08/17",
         ("a.example.com", "/cal/N/N/N", 4, 0)),
        ("https://a.example.com/p?session=9&sort=1&ref=2",
         ("a.example.com", "/p", 1, 3)),
        ("https://b.example.com/about",
         ("b.example.com", "/about", 1, 0)),
        ("https://b.example.com/",
         ("b.example.com", "/", 0, 0)),
        ("https://b.example.com/article/12345",
         ("b.example.com", "/article/N", 2, 0)),
        # digit RUN collapses to one N; fragment is not a query
        ("https://c.example.com/y2025m08#frag",
         ("c.example.com", "/yNmN", 1, 0)),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: (r["host"], r["template"], r["depth"], r["n_params"])
           for r in with_url_signature(df).collect()}
    for u, want in cases:
        assert got[u] == want, u


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_detect_traps_rules(spark):
    urls = (
        # calendar family: 8 distinct, 3 numeric segments
        [f"https://t.example.com/cal/2025/{m}/{d}"
         for m in range(1, 3) for d in range(1, 5)]
        # high-volume article family: 8 distinct but structurally benign
        + [f"https://t.example.com/article/{i}" for i in range(8)]
        # param family: 8 distinct with 3 params each
        + [f"https://t.example.com/p?session={i}&sort=0&ref=1"
           for i in range(8)]
        # deep family below the volume bar: must NOT flag
        + ["https://t.example.com/a/1/b/2/c/3/d/4/e/5"]
    )
    traps = {(r["host"], r["template"]): r["reasons"] for r in
             detect_traps(_urls(spark, urls), min_urls=8,
                          max_depth=8, max_params=3).collect()}
    assert ("t.example.com", "/cal/N/N/N") in traps
    assert traps[("t.example.com", "/cal/N/N/N")] == "volume,calendar"
    assert ("t.example.com", "/p") in traps
    assert traps[("t.example.com", "/p")] == "volume,params"
    assert ("t.example.com", "/article/N") not in traps  # benign volume
    assert len(traps) == 2  # the deep singleton stayed below the bar


def test_trap_filter_prunes_only_trap_family(spark):
    urls = ([f"https://t.example.com/cal/2025/1/{d}" for d in range(20)]
            + ["https://t.example.com/article/7",
               "https://ok.example.com/cal/2025/1/1"])
    frontier = (_urls(spark, urls)
                .withColumn("host", F.regexp_extract(
                    "url", r"^[a-z]+://([^/?#]+)", 1)))
    traps = detect_traps(frontier, min_urls=10, max_depth=8)
    kept = {r["url"] for r in trap_filter(frontier, traps).collect()}
    # same template on ANOTHER host survives — signatures are per host
    assert kept == {"https://t.example.com/article/7",
                    "https://ok.example.com/cal/2025/1/1"}


def _trap_corpus():
    """Pre-parsed link-graph corpus: trap.example.com's calendar walks
    forward forever (each day links the next 12 days); ok.example.com
    is a clean 3-page chain."""
    rows = []
    cal = [f"https://trap.example.com/cal/2025/1/{i}" for i in range(120)]
    rows.append({"url": "https://trap.example.com/start",
                 "host": "trap.example.com", "title": None, "metas": None,
                 "body_md": "start",
                 "out_links": cal[:12] + ["https://ok.example.com/a"]})
    for i in range(120):
        rows.append({"url": cal[i], "host": "trap.example.com",
                     "title": None, "metas": None, "body_md": "day",
                     "out_links": cal[i + 12:i + 24]})
    chain = ["https://ok.example.com/a", "https://ok.example.com/b",
             "https://ok.example.com/c"]
    for i, u in enumerate(chain):
        rows.append({"url": u, "host": "ok.example.com", "title": None,
                     "metas": None, "body_md": "ok",
                     "out_links": chain[i + 1:i + 2]})
    return rows


@pytest.mark.parametrize("gate", [False, True])
def test_crawl_trap_gate(spark, gate):
    from axora_spark import schemas
    from axora_spark.catalog import SnapshotCatalog
    from axora_spark.config import CrawlConfig
    from axora_spark.plans import crawl

    rows = _trap_corpus()
    corpus = spark.createDataFrame(rows, schemas.LINK_GRAPH)
    cfg = CrawlConfig(
        seeds=("https://trap.example.com/start",),
        allowed_domains=("trap.example.com", "ok.example.com"),
        max_depth=8, max_waves=5,
        per_host_parallelism=3, per_host_delay_s=5.0, wave_seconds=25.0,
        trap_detect=gate, trap_min_urls=13)
    cat = SnapshotCatalog(tempfile.mkdtemp())
    crawl.run_crawl(spark, cat, cfg, corpus)
    adm = [r["url"] for r in cat.read(spark, "admitted").collect()]
    n_cal = sum("/cal/" in u for u in adm)
    if gate:
        # wave 1 admits the first 12 calendar pages (family still under
        # the volume bar when wave 0 built its frontier); by the end of
        # wave 1 the family has 24 distinct members ≥ 13 → every later
        # calendar URL is pruned before it reaches the scheduler
        assert n_cal == 12
    else:
        assert n_cal >= 24  # ungated: the walk keeps going
    # the innocent host is untouched either way
    for u in ("https://ok.example.com/a", "https://ok.example.com/b",
              "https://ok.example.com/c"):
        assert u in adm


def test_trap_volume_modes_plan_shapes(spark):
    # exact mode: the distinct-agg expansion — two keyed exchanges, the
    # first carrying (host, template, url). approx mode (the crawl
    # loop's form): ONE exchange of pre-aggregated HLL sketch rows.
    urls = _urls(spark, [f"https://t.example.com/cal/2025/1/{d}"
                         for d in range(30)])
    def _plan(df):
        return (df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0])
    exact = _plan(detect_traps(urls, min_urls=10))
    approx = _plan(detect_traps(urls, min_urls=10, exact=False))
    assert exact.count("Exchange hashpartitioning") == 2
    assert approx.count("Exchange hashpartitioning") == 1
    assert "approx_count_distinct" in approx


def test_trap_approx_agrees_with_exact_on_families(spark):
    urls = ([f"https://t.example.com/cal/2025/{m}/{d}"
             for m in range(1, 4) for d in range(1, 10)]
            + [f"https://t.example.com/p?session={i}&sort=0&ref=1"
               for i in range(20)])
    kw = dict(min_urls=15, max_depth=8, max_params=3)
    exact = {(r["host"], r["template"]): r["reasons"]
             for r in detect_traps(_urls(spark, urls), **kw).collect()}
    approx = {(r["host"], r["template"]): r["reasons"]
              for r in detect_traps(_urls(spark, urls), exact=False,
                                    **kw).collect()}
    assert set(exact) == set(approx)  # same families flagged
    assert exact == approx            # same reasons at these margins


def test_streaming_trap_state_matches_batch(spark, tmp_path):
    # the profile state is all max-aggregates — streamed in single-file
    # micro-batches + finalize must equal the one-shot batch profile
    # BIT FOR BIT, and agree with exact detection on flagged families
    from pyspark.sql import types as T
    from axora_spark.operators.traps import (detect_traps,
                                             detect_traps_from_state,
                                             trap_profile_state)
    from axora_spark.streaming.traps import trap_state_stream

    urls = ([f"https://t.example.com/cal/2025/{m}/{d}"
             for m in range(1, 13) for d in range(1, 8)]
            + [f"https://t.example.com/article/{i}" for i in range(80)]
            + [f"https://t.example.com/p?session={i}&sort=0&ref=1"
               for i in range(70)])
    batch = _urls(spark, urls)
    src = str(tmp_path / "urls")
    batch.repartition(8).write.parquet(src)

    stream = (spark.readStream.format("parquet")
              .schema(T.StructType([T.StructField("url", T.StringType())]))
              .option("maxFilesPerTrigger", 1).load(src))
    q = (trap_state_stream(stream).writeStream
         .outputMode("complete").format("memory")
         .queryName("trap_state").start())
    q.processAllAvailable()
    q.stop()
    kw = dict(min_urls=60, max_depth=8, max_params=3)
    streamed = {(r["host"], r["template"]): (r["n_urls"], r["reasons"])
                for r in detect_traps_from_state(
                    spark.sql("select * from trap_state"), **kw).collect()}
    want = {(r["host"], r["template"]): (r["n_urls"], r["reasons"])
            for r in detect_traps_from_state(
                trap_profile_state(batch), **kw).collect()}
    assert streamed == want  # micro-batch-slicing invariant
    exact = {(r["host"], r["template"]) for r in
             detect_traps(batch, **kw).collect()}
    assert set(streamed) == exact  # sketch volume agrees at this margin
    assert ("t.example.com", "/cal/N/N/N") in streamed


def test_trap_state_merge_idempotent(spark):
    # crash-replay safety: re-merging a wave's profile into a state that
    # already contains it must be a no-op (every column is a max)
    from pyspark.sql import functions as F
    from axora_spark.operators.traps import trap_profile_state
    urls = _urls(spark, [f"https://t.example.com/cal/2025/1/{d}"
                         for d in range(25)])
    state = trap_profile_state(urls)
    def merge(a, b):
        return (a.unionByName(b).groupBy("host", "template", "bucket")
                .agg(F.max("m_reg").alias("m_reg"),
                     F.max("max_depth").alias("max_depth"),
                     F.max("max_params").alias("max_params")))
    once = {tuple(r) for r in state.collect()}
    twice = {tuple(r) for r in merge(state, state).collect()}
    assert once == twice
