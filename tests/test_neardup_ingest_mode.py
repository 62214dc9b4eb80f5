"""cfg.near_dup_ingest — the incremental near-dup gate inside the crawl
content pipeline: per-wave dedup against the accumulated signature
store, audit-logged, resume-safe. Engine behaviour is verified against
the pure-Python minhash twin of test_incremental, replayed wave by wave
exactly as the sink batches the documents."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from axora_spark import datagen, schemas
from axora_spark.catalog import SnapshotCatalog
from axora_spark.operators.spans import spans_to_text
from axora_spark.plans import content, crawl
from test_incremental import _py_assign  # tests dir is on sys.path


def _doc_id(url: str) -> str:
    return hashlib.sha256(url.encode()).hexdigest()


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    """Baseline crawl (mode off) learns which pages become documents and
    in which wave; then the corpus is mutated so a LATER-wave document
    carries an earlier-wave document's body — a guaranteed cross-wave
    near-dup with signature agreement 1.0. Returns everything the twin
    needs: per-wave (doc_id, text) batches of the mutated corpus."""
    pages = datagen.link_graph_rows(n_pages=120, seed=42)
    cfg = datagen.fixture_config(pages)
    cat = SnapshotCatalog(str(tmp_path_factory.mktemp("base_wh")))
    corpus = spark.createDataFrame(pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, cat, cfg, corpus,
                    content_sink=content.make_content_sink(cfg))
    wave_of_url = {r.url: r.wave
                   for r in cat.read(spark, "admitted").collect()}
    texts = {r.doc_id: (r.url, r.t) for r in
             cat.read(spark, "documents")
             .select("doc_id", "url",
                     spans_to_text(F.col("spans")).alias("t")).collect()}
    # donor: a document from the earliest doc wave; receiver: one from
    # the latest (strictly later) wave
    by_wave = sorted((wave_of_url[u], d) for d, (u, _) in texts.items())
    donor = by_wave[0][1]
    receiver = next(d for w, d in reversed(by_wave) if w > by_wave[0][0])
    donor_url, donor_text = texts[donor]
    receiver_url = texts[receiver][0]
    mut = [dict(p) for p in pages]
    for p in mut:
        if p["url"] == receiver_url:
            p["body_md"] = next(q["body_md"] for q in pages
                                if q["url"] == donor_url)
    # twin input: per-wave batches over the MUTATED texts (out_links are
    # untouched, so crawl order and doc set are identical to baseline)
    texts_mut = {d: (u, donor_text if d == receiver else t)
                 for d, (u, t) in texts.items()}
    batches: dict[int, dict[str, str]] = {}
    for d, (u, t) in texts_mut.items():
        batches.setdefault(wave_of_url[u], {})[d] = t
    return {"pages": mut, "cfg_base": cfg, "batches": batches,
            "donor": donor, "receiver": receiver,
            "all_docs": set(texts)}


def _expected(batches: dict[int, dict[str, str]], threshold: float):
    """Replay the sink's per-wave dedup with the Python twin. Returns
    (dup rows, surviving doc set, SIGS doc set) — the last excludes
    <3-word docs, which have no shingles: the engine keeps them in
    `documents` (exact dedup owns them) but never stores a signature
    (code-review r5: conflating the two sets makes the sigs assertion
    fail on a correct engine if a fixture doc is ever that short)."""
    from test_incremental import _py_sig
    store: dict[str, str] = {}
    dup_rows: set[tuple[int, str, str, float]] = set()
    for w in sorted(batches):
        assigns = _py_assign(batches[w], store, threshold=threshold)
        for d, (p, est) in assigns.items():
            dup_rows.add((w, d, p, est))
        store.update({d: t for d, t in batches[w].items()
                      if d not in assigns})
    with_sig = {d for d, t in store.items() if _py_sig(t) is not None}
    return dup_rows, set(store), with_sig


def test_near_dup_mode_matches_twin(spark, catalog, scenario):
    pages = scenario["pages"]
    cfg = datagen.fixture_config(pages, near_dup_ingest=True)
    corpus = spark.createDataFrame(pages, schemas.LINK_GRAPH)
    crawl.run_crawl(spark, catalog, cfg, corpus,
                    content_sink=content.make_content_sink(cfg))
    want_dups, want_survivors, want_sigs = _expected(
        scenario["batches"], cfg.near_dup_threshold)
    # the injected cross-wave dup must actually fire, at est 1.0
    assert any(d == scenario["receiver"] and p == scenario["donor"]
               and est == 1.0 for _, d, p, est in want_dups)

    got_dups = {(r.wave, r.doc_id, r.dup_of, r.est_jaccard)
                for r in catalog.read(spark, "dup_log").collect()}
    assert got_dups == want_dups
    got_docs = {r.doc_id
                for r in catalog.read(spark, "documents").collect()}
    assert got_docs == want_survivors
    assert {r.doc_id for r in catalog.read(spark, "sigs").collect()} \
        == want_sigs
    # downstream sinks only see survivors
    assert {r.doc_id for r in catalog.read(spark, "chunks").collect()} \
        <= want_survivors


def test_near_dup_mode_resume_identical(spark, scenario,
                                        tmp_path_factory):
    pages = scenario["pages"]
    cfg = datagen.fixture_config(pages, near_dup_ingest=True)
    corpus = spark.createDataFrame(pages, schemas.LINK_GRAPH)

    full = SnapshotCatalog(str(tmp_path_factory.mktemp("full_wh")))
    crawl.run_crawl(spark, full, cfg, corpus,
                    content_sink=content.make_content_sink(cfg))

    part = SnapshotCatalog(str(tmp_path_factory.mktemp("part_wh")))
    crawl.run_crawl(spark, part, cfg, corpus,
                    content_sink=content.make_content_sink(cfg),
                    stop_after_wave=1)
    crawl.run_crawl(spark, part, cfg, corpus, resume=True,
                    content_sink=content.make_content_sink(cfg))

    for t in ("documents", "sigs"):
        assert {r.doc_id for r in part.read(spark, t).collect()} == \
            {r.doc_id for r in full.read(spark, t).collect()}, t
    assert {(r.wave, r.doc_id, r.dup_of, r.est_jaccard)
            for r in part.read(spark, "dup_log").collect()} == \
        {(r.wave, r.doc_id, r.dup_of, r.est_jaccard)
         for r in full.read(spark, "dup_log").collect()}
