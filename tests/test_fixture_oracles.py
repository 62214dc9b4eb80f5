"""Fixture-oracle integrity gates (tools/make_fixtures.py).

The committed fixtures/ parquet tables are the DuckDB oracle for the three
non-SQL-expressible driver queries (wordpiece_tokens, chunk_pipeline,
meta_gate). These tests make staleness and drift impossible to miss:

  1. regenerate each fixture IN-MEMORY from the current testdata + current
     pure-Python cores and compare against the committed parquet — a driver
     testdata regen or a tokenizer/chunker change fails here first;
  2. pin the meta-gate's Spark-side native input synthesis byte-equal to
     the Python synthesis the fixture was computed from (the one place the
     fixture pattern has two definitions of the same value).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import make_fixtures  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _rows(path: str) -> list[tuple]:
    t = pq.read_table(path)
    return sorted(zip(*[t.column(c).to_pylist() for c in t.column_names]))


def _expected(rows: list[dict], order: list[str]) -> list[tuple]:
    return sorted(tuple(r[c] for c in order) for r in rows)


@pytest.fixture(scope="module")
def texts():
    return make_fixtures.distinct_texts()


def test_wordpiece_fixture_fresh(texts):
    got = _rows(os.path.join(FIXTURES, "wordpiece_counts.parquet"))
    want = _expected(make_fixtures.wordpiece_rows(texts),
                     ["text_sha", "wp_tokens"])
    assert got == want


def test_chunks_fixture_fresh(texts):
    got = _rows(os.path.join(FIXTURES, "chunks.parquet"))
    want = _expected(make_fixtures.chunk_rows(texts),
                     ["text_sha", "chunk_index", "chunk_sha", "token_count"])
    assert got == want


def test_meta_gate_fixture_fresh():
    got = _rows(os.path.join(FIXTURES, "meta_gate.parquet"))
    n = make_fixtures.max_doc_id() + 1
    want = _expected(make_fixtures.meta_gate_rows(n), ["doc_id", "relevant"])
    assert got == want
    rel = sum(1 for _, r in got if r)
    assert 0 < rel < len(got)  # both classes exercised


def test_url_canon_fixture_fresh():
    got = _rows(os.path.join(FIXTURES, "url_canon.parquet"))
    n = make_fixtures.max_doc_id() + 1
    want = _expected(make_fixtures.url_canon_rows(n),
                     ["doc_id", "abs_url", "canonical_url", "skip_path"])
    assert got == want
    # canonicalization actually does work on these cases
    assert any(a != c for _, a, c, _s in got)


def test_chunks_md_fixture_fresh():
    got = _rows(os.path.join(FIXTURES, "chunks_md.parquet"))
    n = make_fixtures.max_doc_id() + 1
    want = _expected(make_fixtures.chunk_md_rows(n),
                     ["doc_id", "chunk_index", "chunk_sha", "chunk_len"])
    assert got == want
    # chunk counts vary and the long-section recursion fires
    by_doc = {}
    for d, *_ in got:
        by_doc[d] = by_doc.get(d, 0) + 1
    assert len(set(by_doc.values())) > 2


def test_url_canonicalize_query_matches_python(spark):
    """End-to-end pin: the REAL q_url_canonicalize (native input synth +
    pandas UDFs) must byte-match the pure-Python urlnorm core the fixture
    was computed from — stronger than input-equality alone."""
    from axora_spark.queries import q_url_canonicalize
    got = {r.doc_id: (r.abs_url, r.canonical_url, r.skip_path)
           for r in q_url_canonicalize(
               spark, "/root/testdata/sf0.001").collect()}
    for doc_id, vals in got.items():
        w = make_fixtures.url_canon_rows(doc_id + 1)[-1]
        assert vals == (w["abs_url"], w["canonical_url"], w["skip_path"])


def test_chunk_markdown_query_matches_python(spark):
    """End-to-end pin: the REAL q_chunk_markdown (native markdown synth +
    splitter UDF) must match the pure-Python chunker output."""
    from axora_spark.queries import q_chunk_markdown
    rows = q_chunk_markdown(spark, "/root/testdata/sf0.001").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_index, r.chunk_sha, r.chunk_len))
    md_rows = make_fixtures.chunk_md_rows(max(by_doc) + 1)
    want: dict[int, list] = {}
    for w in md_rows:
        want.setdefault(w["doc_id"], []).append(
            (w["chunk_index"], w["chunk_sha"], w["chunk_len"]))
    for d in by_doc:
        assert sorted(by_doc[d]) == sorted(want[d]), f"doc {d}"


def test_meta_gate_spark_synth_matches_python(spark):
    """queries.q_meta_gate synthesizes (title, metas) natively; the fixture
    used make_fixtures.meta_gate_inputs_py. Pin them equal."""
    did = F.col("id").cast("long")
    title = F.concat(F.lit("Doc "), did, F.lit(" briefing"))
    kw = (F.when(did % 4 == 0, F.lit("growth,economies"))
           .when(did % 4 == 1, F.lit("sports,travel"))
           .when(did % 4 == 2, F.lit("policy macro-economic"))
           .otherwise(F.lit("weather")))
    desc = (F.when(did % 5 == 0, F.lit("An economical overview"))
             .otherwise(F.lit("General notes")))
    metas = F.array(
        F.struct(F.lit("keywords").alias("name"),
                 F.lit("").alias("property"), kw.alias("content")),
        F.struct(F.lit("").alias("name"),
                 F.lit("og:description").alias("property"),
                 desc.alias("content")))
    rows = (spark.range(0, 40)
            .select(did.alias("doc_id"), title.alias("title"),
                    metas.alias("metas"))
            .collect())
    for r in rows:
        t, m = make_fixtures.meta_gate_inputs_py(r.doc_id)
        assert r.title == t
        assert [x.asDict() for x in r.metas] == m
