"""Storage-bucketed seen table: correctness + the no-reshuffle plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axora_spark.operators.bucketed import (bucketed_anti_join_seen,
                                            write_bucketed_seen)

TABLE = "seen_bucketed_test"


@pytest.fixture()
def bucketed_seen(spark):
    seen = spark.range(0, 1000).select(
        (F.col("id") * 2).alias("url_hash"))  # evens are seen
    write_bucketed_seen(seen, TABLE, n_buckets=8)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_bucketed_anti_join_correct(spark, bucketed_seen):
    frontier = spark.range(0, 100).select(F.col("id").alias("url_hash"))
    out = bucketed_anti_join_seen(spark, frontier, bucketed_seen)
    got = sorted(r.url_hash for r in out.collect())
    assert got == [i for i in range(100) if i % 2 == 1]


def test_bucketed_seen_side_not_reshuffled(spark, bucketed_seen):
    # forbid broadcast so the gate tests the at-scale plan family (at
    # 10^10 seen keys neither side broadcasts); runtime conf, restored
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        frontier = spark.range(0, 100).select(
            F.col("id").alias("url_hash"))
        out = bucketed_anti_join_seen(spark, frontier, bucketed_seen)
        out.collect()  # finalize AQE so executedPlan is the real one
        full = out._jdf.queryExecution().executedPlan().toString()
        # AQE prints Final + Initial; gate the FINAL plan only
        plan = full.split("== Initial Plan ==")[0]
        # the seen scan reads its buckets directly...
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount" in plan
        # ...and the ONLY exchange in the join is the frontier side
        assert plan.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
