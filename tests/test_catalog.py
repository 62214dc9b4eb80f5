from __future__ import annotations

from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("v", T.StringType(), True),
])


def test_append_and_time_travel(spark, catalog):
    catalog.create_table("t", SCHEMA)
    s1 = catalog.append(spark, "t", spark.createDataFrame([(1, "a")], SCHEMA))
    s2 = catalog.append(spark, "t", spark.createDataFrame([(2, "b")], SCHEMA))
    assert catalog.current_snapshot("t") == s2
    assert catalog.read(spark, "t").count() == 2
    assert catalog.read(spark, "t", snapshot_id=s1).count() == 1
    catalog.rollback("t", s1)
    assert catalog.read(spark, "t").count() == 1


def test_overwrite(spark, catalog):
    catalog.create_table("t", SCHEMA)
    catalog.append(spark, "t", spark.createDataFrame([(1, "a")], SCHEMA))
    catalog.overwrite(spark, "t", spark.createDataFrame([(9, "z")], SCHEMA))
    rows = catalog.read(spark, "t").collect()
    assert [(r.k, r.v) for r in rows] == [(9, "z")]


def test_empty_read_has_schema(spark, catalog):
    catalog.create_table("t", SCHEMA)
    df = catalog.read(spark, "t")
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_merge_insert_if_absent(spark, catalog):
    """Get-before-upsert idempotency (reference qdrantdb/crawl_vector.go:47-56)."""
    catalog.create_table("t", SCHEMA)
    catalog.append(spark, "t", spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    catalog.merge_insert_if_absent(
        spark, "t",
        spark.createDataFrame([(2, "DUP"), (3, "c"), (3, "cc")], SCHEMA), "k")
    rows = {r.k for r in catalog.read(spark, "t").collect()}
    assert rows == {1, 2, 3}
    assert catalog.read(spark, "t").count() == 3
    # existing row untouched
    vals = {r.k: r.v for r in catalog.read(spark, "t").collect()}
    assert vals[2] == "b"
