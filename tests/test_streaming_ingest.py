"""Exactly-once streaming ingest: at-least-once source replay + keyed
idempotent merge = exactly-once table contents."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.streaming.ingest import stream_to_catalog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _write_chunk(spark, src, name, rows):
    (spark.createDataFrame(rows, SCHEMA).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, name)))


def test_stream_ingest_exactly_once(spark, catalog):
    catalog.create_table("t", SCHEMA)
    src = tempfile.mkdtemp(prefix="ing_src_")
    ckpt = tempfile.mkdtemp(prefix="ing_ckpt_")
    try:
        _write_chunk(spark, src, "f0", [(1, "a"), (2, "b")])
        stream = (spark.readStream.format("parquet").schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).load(src + "/*"))
        q = stream_to_catalog(stream, catalog, "t", key="k",
                              checkpoint_dir=ckpt, query_name="ing1")
        q.processAllAvailable()
        # more files while running: overlapping keys must not duplicate
        _write_chunk(spark, src, "f1", [(2, "b"), (3, "c")])
        _write_chunk(spark, src, "f2", [(3, "c"), (4, "d")])
        q.processAllAvailable()
        q.stop()
        got = sorted((r.k, r.v) for r in catalog.read(spark, "t").collect())
        assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]

        # crash/replay simulation: a FRESH checkpoint replays the whole
        # source (at-least-once) — table contents must not change
        ckpt2 = tempfile.mkdtemp(prefix="ing_ckpt2_")
        try:
            stream2 = (spark.readStream.format("parquet").schema(SCHEMA)
                       .option("maxFilesPerTrigger", 1).load(src + "/*"))
            q2 = stream_to_catalog(stream2, catalog, "t", key="k",
                                   checkpoint_dir=ckpt2, query_name="ing2")
            q2.processAllAvailable()
            q2.stop()
            again = sorted((r.k, r.v)
                           for r in catalog.read(spark, "t").collect())
            assert again == got
        finally:
            shutil.rmtree(ckpt2, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
