"""Structured Streaming twins: tumbling agg ≡ batch; streaming URL dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axora_spark.streaming.events import (run_to_memory, stream_events,
                                          tumbling_counts)

SF_DIR = "/root/testdata/sf0.001"


def test_tumbling_matches_batch(spark, tmp_path):
    # FileStreamSource needs a directory; stage the single-file table
    src = str(tmp_path / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(src)
    ev_stream = stream_events(spark, src)
    agg = tumbling_counts(ev_stream)
    run_to_memory(agg, "t_out", mode="complete")
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in spark.sql("select * from t_out").collect()}

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in (ev.groupBy(F.window("ts", "5 minutes"), "event_type")
                      .agg(F.count("*").alias("n_events"),
                           F.round(F.sum("value"), 6).alias("sum_value"))
                      .select(F.col("window.start").alias("window_start"),
                              "event_type", "n_events", "sum_value")
                      .collect())}
    assert got == want
    assert len(got) > 10


def test_streaming_url_dedup(spark, tmp_path):
    from axora_spark.streaming.events import streaming_url_dedup
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("discovered_ts", T.TimestampType()),
    ])
    batch = spark.createDataFrame(
        [(1, "a", "2026-01-01 00:00:00"), (1, "a", "2026-01-01 00:01:00"),
         (2, "b", "2026-01-01 00:00:30"), (3, "c", "2026-01-01 00:02:00"),
         (2, "b2", "2026-01-01 00:03:00")],
        "url_hash long, url string, discovered_ts string") \
        .withColumn("discovered_ts", F.to_timestamp("discovered_ts"))
    src = str(tmp_path / "urls")
    batch.write.parquet(src)

    stream = (spark.readStream.format("parquet").schema(schema).load(src))
    dedup = streaming_url_dedup(spark, stream)
    q = (dedup.writeStream.outputMode("append").format("memory")
         .queryName("u_out").start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select url_hash from u_out").collect()
    hashes = sorted(r.url_hash for r in rows)
    assert hashes == [1, 2, 3]


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    # the sketch's register aggregation is its whole state and max is
    # mergeable, so streamed registers + read-side finalize must equal
    # the one-shot batch estimate BIT FOR BIT — and stay invariant when
    # the stream is sliced into single-file micro-batches
    from axora_spark.functions.sketch import hll_estimate
    from axora_spark.streaming.sketch import (hll_estimate_from_registers,
                                              hll_register_stream)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # stage as MANY files so maxFilesPerTrigger really slices batches
    src = str(tmp_path / "docs")
    docs.repartition(8).write.parquet(src)

    stream = (spark.readStream.format("parquet")
              .schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .load(src))
    words = stream.select(
        "source",
        F.explode(F.filter(F.split(F.trim("text"), r"\s+"),
                           lambda w: w != "")).alias("word"))
    regs = hll_register_stream(words, "source", "word", m=16)
    q = (regs.writeStream.outputMode("complete").format("memory")
         .queryName("hll_regs").start())
    q.processAllAvailable()
    q.stop()
    streamed = hll_estimate_from_registers(
        spark.sql("select * from hll_regs"), "source", m=16)
    got = {r.source: r.hll_distinct for r in streamed.collect()}

    batch_words = docs.select(
        "source",
        F.explode(F.filter(F.split(F.trim("text"), r"\s+"),
                           lambda w: w != "")).alias("word"))
    want = {r.source: r.hll_distinct for r in
            hll_estimate(batch_words, "source", "word", m=16).collect()}
    assert got == want
    assert len(got) >= 10
