"""Driver-contract gate in pytest: a representative subset of
queries()/oracle_sql() pairs must agree (full sweep: tools/check_oracle.py).
Subset keeps suite time sane; picks one query per operator family."""

from __future__ import annotations

import math

import duckdb
import pytest

from axora_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
SUBSET = ["frontier_filters", "politeness_rank", "quality_scores",
          "token_counts", "dedup_exact", "minhash_near_dup",
          "interleaved_spans", "cosine_topk", "tpch_q1", "sessionize"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def test_registry_complete():
    assert set(ORACLES) == set(QUERIES)
    assert len(QUERIES) >= 20


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    drows = [dict(zip(rel.columns, t)) for t in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert _norm(srows, sdf.columns) == _norm(drows, rel.columns), name
