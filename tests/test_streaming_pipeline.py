"""Composed streaming crawl flow: governor → stub fetch → keyed sink,
with a forced mid-stream restart and a full fresh-checkpoint replay —
the streaming twin of tests/test_resume (VERDICT r3 #8). The admitted
table must equal the one-shot batch oracle exactly once in all cases."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import types as T

from axora_spark.streaming.pipeline import streaming_crawl_pipeline
from axora_spark.streaming.politeness import politeness_batch_py

SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

BUDGET, WINDOW_S = 2, 60.0
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _rows(spec):
    """spec: [(host, page_idx, offset_s)] → rows; urls unique per host."""
    return [(h, f"https://{h}.example.org/p{i}",
             T0 + dt.timedelta(seconds=s)) for h, i, s in spec]


# three event-time-ordered chunks; host 'a' oversubscribes window 0
# (4 urls, budget 2) and window 60 (3 urls), host 'b' stays under budget
CHUNKS = [
    _rows([("a", 0, 0), ("a", 1, 5), ("b", 0, 7)]),
    _rows([("a", 2, 10), ("a", 3, 20), ("b", 1, 30)]),
    _rows([("a", 4, 65), ("a", 5, 70), ("a", 6, 80), ("b", 2, 90)]),
]


def _expected_admitted():
    allrows = [(h, u, ts.timestamp())
               for chunk in CHUNKS for h, u, ts in chunk]
    verdict = politeness_batch_py(allrows, budget=BUDGET,
                                  window_s=WINDOW_S)
    return sorted(u for (_h, u), ok in verdict.items() if ok)


def _write_chunk(spark, src, name, rows):
    (spark.createDataFrame(rows, SCHEMA).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, name)))


def _start(spark, src, catalog, ckpt, name):
    stream = (spark.readStream.format("parquet").schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).load(src + "/*"))
    return streaming_crawl_pipeline(stream, catalog, "admitted",
                                    checkpoint_dir=ckpt, budget=BUDGET,
                                    window_s=WINDOW_S, query_name=name)


def test_streaming_pipeline_exactly_once_across_restart(spark, catalog):
    catalog.create_table("admitted", T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("window_start", T.DoubleType()),
        T.StructField("body_sha", T.StringType()),
        T.StructField("status", T.IntegerType()),
    ]))
    want = _expected_admitted()
    src = tempfile.mkdtemp(prefix="sp_src_")
    ckpt = tempfile.mkdtemp(prefix="sp_ckpt_")
    try:
        _write_chunk(spark, src, "f0", CHUNKS[0])
        _write_chunk(spark, src, "f1", CHUNKS[1])
        q = _start(spark, src, catalog, ckpt, "sc1")
        q.processAllAvailable()
        q.stop()                      # the "crash": kill mid-stream
        partial = sorted(r.url for r in
                         catalog.read(spark, "admitted").collect())
        assert 0 < len(partial) < len(want)

        # restart from the SAME checkpoint with more data arrived
        _write_chunk(spark, src, "f2", CHUNKS[2])
        q2 = _start(spark, src, catalog, ckpt, "sc2")
        q2.processAllAvailable()
        q2.stop()
        got = sorted(r.url for r in
                     catalog.read(spark, "admitted").collect())
        assert got == want

        # rows carry the deterministic fetch stub and the metering window
        row = catalog.read(spark, "admitted").first()
        assert row.status == 200 and len(row.body_sha) == 64

        # full fresh-checkpoint replay (at-least-once source): admitted
        # table must not change — governor determinism + keyed merge
        ckpt2 = tempfile.mkdtemp(prefix="sp_ckpt2_")
        try:
            q3 = _start(spark, src, catalog, ckpt2, "sc3")
            q3.processAllAvailable()
            q3.stop()
            again = sorted(r.url for r in
                           catalog.read(spark, "admitted").collect())
            assert again == want
        finally:
            shutil.rmtree(ckpt2, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
