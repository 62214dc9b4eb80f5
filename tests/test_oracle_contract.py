"""Driver-contract gate in pytest: a representative subset of
queries()/oracle_sql() pairs must agree (full sweep: tools/check_oracle.py).
Subset keeps suite time sane; picks one query per operator family.

Comparison goes THROUGH PANDAS on both sides — the driver's path — so
engine-vs-oracle type artifacts (DuckDB HUGEINT → float64 `36.0` vs Spark
int `36`) fail here, not only in the driver's CORRECTNESS report."""

from __future__ import annotations

import duckdb
import pytest

from axora_spark.queries import ORACLES, QUERIES

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from check_oracle import normalize_pdf  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SUBSET = ["frontier_filters", "politeness_rank", "quality_scores",
          "token_counts", "dedup_exact", "minhash_near_dup",
          "interleaved_spans", "cosine_topk", "tpch_q1", "sessionize",
          "html_main_md", "ngram_jaccard", "robots_gate", "pii_mask",
          "dedup_clusters", "gopher_quality", "c4_line_filters",
          "tfidf_top_terms", "url_canonicalize", "chunk_markdown",
          "contamination", "mix_sample", "pagerank", "hll_distinct",
          "lm_perplexity", "seq_packing"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_registry_complete():
    # every oracle pairs a query — and since round 3 every query has an
    # oracle (the non-SQL-expressible ones via fixture tables,
    # tools/make_fixtures.py), so the driver hash-checks all of them
    assert set(ORACLES) == set(QUERIES)
    assert len(QUERIES) >= 40


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    dpdf = duck.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    assert normalize_pdf(spdf) == normalize_pdf(dpdf), name
