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
