"""M4 — checkpoint/resume: kill after wave k, resume, final state identical
(SURVEY.md §5.2 item 5; north_rule 'resumable from checkpoint')."""

from __future__ import annotations

import pytest

from axora_spark import datagen, oracle, schemas
from axora_spark.plans import crawl


@pytest.fixture(scope="module")
def fixture_pages():
    return datagen.link_graph_rows(n_pages=120, seed=42)


@pytest.fixture(scope="module")
def cfg(fixture_pages):
    return datagen.fixture_config(fixture_pages)


def test_resume_identical(spark, catalog, cfg, fixture_pages):
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    want = oracle.simulate(fixture_pages, cfg)

    # "crash" after wave 1 (two waves run: 0 and 1)
    run1 = crawl.run_crawl(spark, catalog, cfg, corpus, stop_after_wave=1)
    assert run1.waves_run == 2
    n_admitted_partial = catalog.read(spark, "admitted").count()
    assert 0 < n_admitted_partial < len(want.admitted)

    # resume from the checkpoint; must complete to the same final state
    run2 = crawl.run_crawl(spark, catalog, cfg, corpus, resume=True)
    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen

    # lineage recorded one frontier snapshot per wave (+ the wave -1 row
    # pinning the seeded frontier for mid-wave-0 crash recovery)
    lineage = catalog.read(spark, "lineage") \
        .filter("table = 'frontier' AND wave >= 0")
    assert lineage.count() == want.waves_run
    assert catalog.read(spark, "lineage") \
        .filter("table = 'frontier' AND wave = -1").count() == 1


def test_resume_mid_wave_crash(spark, catalog, cfg, fixture_pages):
    """A kill BETWEEN a wave's first append and its state save must not
    duplicate rows on resume: partial commits of the crashed wave are
    rolled back to the last lineage snapshot (ADVICE r1 #1)."""
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    want = oracle.simulate(fixture_pages, cfg)

    crawl.run_crawl(spark, catalog, cfg, corpus, stop_after_wave=1)

    # simulate the mid-wave-2 crash: admitted/seen appends committed,
    # _state.json still says next_wave=2
    partial_adm = spark.createDataFrame(
        [(2, "hot.example.org", 1, "https://hot.example.org/partial", 2)],
        schemas.ADMITTED)
    catalog.append(spark, "admitted", partial_adm)
    partial_seen = spark.createDataFrame(
        [(123456789, "https://hot.example.org/partial", 2)], schemas.SEEN)
    catalog.append(spark, "seen", partial_seen)

    crawl.run_crawl(spark, catalog, cfg, corpus, resume=True)

    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen
    assert not any("partial" in u for u in seen)


def test_compact_every_preserves_crawl(spark, catalog, cfg, fixture_pages):
    """Per-wave seen-table compaction must not change crawl results, and
    the final seen snapshot must be a single consolidated dir."""
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    want = oracle.simulate(fixture_pages, cfg)
    crawl.run_crawl(spark, catalog, cfg, corpus, compact_every=1)
    got = sorted(r.url for r in catalog.read(spark, "seen").collect())
    assert got == sorted(want.seen)
    assert len(catalog.snapshots("seen")[-1]["dirs"]) == 1
    # and a post-hoc expiry keeps only live data on disk
    removed = catalog.expire_snapshots("seen", keep_last=1)
    assert removed > 0
    assert sorted(r.url for r in
                  catalog.read(spark, "seen").collect()) == got


def test_expire_in_crashed_state_keeps_rollback_target(
        spark, catalog, cfg, fixture_pages):
    """Crash BETWEEN _record_lineage and _save_state (lineage already
    holds the crashed wave's rows; _state.json still points at the
    previous wave), THEN expire_history(keep_last=1), THEN resume. The
    protect set must include the rollback target — the newest lineage
    snapshot for waves < the saved next_wave — not just the global max,
    which in this state is the doomed partial append (code-review r4)."""
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    want = oracle.simulate(fixture_pages, cfg)
    crawl.run_crawl(spark, catalog, cfg, corpus, stop_after_wave=1)

    # simulate wave 2 crashing after its seen append + lineage record
    partial = spark.createDataFrame(
        [(987654321, "https://hot.example.org/crashpartial", 2)],
        schemas.SEEN)
    sid = catalog.append(spark, "seen", partial)
    crawl._record_lineage(spark, catalog, 2, [("seen", sid, 1, 1)])

    crawl.expire_history(spark, catalog, "seen", keep_last=1)
    crawl.run_crawl(spark, catalog, cfg, corpus, resume=True)
    seen = {r.url for r in catalog.read(spark, "seen").collect()}
    assert seen == want.seen
    assert not any("crashpartial" in u for u in seen)


def test_resume_after_compact_and_expiry(spark, catalog, cfg, fixture_pages):
    """Crash → compact + resume-safe expiry → resume must still work and
    finish with the uninterrupted run's final state (the raw
    catalog.expire_snapshots would delete lineage rollback targets;
    crawl.expire_history protects them)."""
    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    want = oracle.simulate(fixture_pages, cfg)
    crawl.run_crawl(spark, catalog, cfg, corpus, stop_after_wave=1,
                    compact_every=1)
    removed = crawl.expire_history(spark, catalog, "seen", keep_last=1)
    # expiry must actually reclaim (protecting every historical lineage
    # id would keep every dir alive — code-review r3)
    assert removed > 0
    crawl.run_crawl(spark, catalog, cfg, corpus, resume=True,
                    compact_every=1)
    got = sorted(r.url for r in catalog.read(spark, "seen").collect())
    assert got == sorted(want.seen)


def test_resume_pre_existing_warehouse_missing_new_tables(
        spark, catalog, cfg, fixture_pages):
    # forward-compat (ADVICE r5 low): resuming a warehouse created before
    # trap_state / fetch_state existed must not raise at the first
    # catalog.read of a missing managed table — the resume branch runs
    # the whole idempotent init_tables, not a per-table patch. Simulate
    # the old warehouse by deleting both tables' metadata after a
    # partial run, then resume with the features ON.
    import os

    corpus = spark.createDataFrame(fixture_pages, schemas.LINK_GRAPH)
    cfg2 = datagen.fixture_config(fixture_pages, trap_detect=True,
                                  adaptive_politeness=True)
    want = oracle.simulate(fixture_pages, cfg2)
    crawl.run_crawl(spark, catalog, cfg2, corpus, stop_after_wave=0)
    for tbl in ("trap_state", "fetch_state"):
        os.remove(catalog._meta_path(tbl))
        assert not catalog.table_exists(tbl)
    crawl.run_crawl(spark, catalog, cfg2, corpus, resume=True)
    got = [(r.wave, r.host, r.rank, r.url, r.depth)
           for r in catalog.read(spark, "admitted")
           .orderBy("wave", "host", "rank").collect()]
    assert got == want.admitted
