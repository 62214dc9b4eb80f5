"""Structured Streaming operators (SURVEY.md §2.9).

The crawl loop itself is batch-by-design (MERGE + multi-table writes +
deterministic replay — SURVEY §2.9), but two of its operators have natural
streaming twins, provided here for continuous-ingest deployments:

  * tumbling event aggregation with watermark (metrics feed, A5)
  * streaming URL dedup (J1's streaming twin: dropDuplicatesWithinWatermark)

Both are micro-batch jobs over file sources; swap `.format("parquet")` for
kafka in production — the transformation subtree is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events(spark: SparkSession, src_glob: str) -> DataFrame:
    return (spark.readStream.format("parquet").schema(EVENTS_SCHEMA)
            .option("path", src_glob).load())


def tumbling_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Windowed counts with late-data watermark — streaming twin of
    queries.q_events_tumbling (same groupBy subtree)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("window.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def run_to_memory(agg: DataFrame, name: str, mode: str = "complete"):
    """Drive a streaming aggregation to completion over the available batch
    (test/smoke harness: memory sink + processAllAvailable)."""
    q = (agg.writeStream.outputMode(mode).format("memory")
         .queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return q


def streaming_url_dedup(spark: SparkSession, urls: DataFrame,
                        watermark: str = "1 hour") -> DataFrame:
    """J1's streaming twin: exactly-once URL admission within a watermark
    horizon via dropDuplicatesWithinWatermark on url_hash. State is bounded
    by the watermark (vs the batch engine's unbounded Iceberg seen table —
    the batch path remains the authority for full-history dedup)."""
    return (urls
            .withWatermark("discovered_ts", watermark)
            .dropDuplicatesWithinWatermark(["url_hash"]))
