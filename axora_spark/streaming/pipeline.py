"""Composed continuous-crawl streaming flow (SURVEY §2.9 end-to-end):

    URL stream → stateful politeness governor → (stub) fetch →
    exactly-once keyed catalog sink

the streaming twin of plans/crawl.run_crawl's wave loop: the governor
(streaming/politeness.politeness_stream, applyInPandasWithState) replaces
the batch salted top-k admission, and the keyed merge sink
(streaming/ingest.stream_to_catalog's foreachBatch recipe) replaces the
wave's lineage-tracked appends.

End-to-end exactly-once argument, piecewise:
  * the governor's verdicts are EVENT-TIME deterministic — the same
    input set admits the same URLs no matter how micro-batches slice it
    (micro-batch-invariance pinned by tests/test_streaming_politeness),
    and its per-host state lives in the streaming checkpoint, so a
    restart resumes metering where it stopped;
  * the fetch stage is a pure column map (deterministic stub body here;
    a real fetcher is the same mapInPandas the batch path uses —
    sources/fetch.fetch_http — and must be idempotent by URL anyway);
  * the sink merges by url key, so an at-least-once replay of any batch
    (crash between foreachBatch and checkpoint commit, or a full
    fresh-checkpoint replay) re-offers rows the anti-join drops.
Deterministic governor + idempotent sink = the admitted TABLE equals the
one-shot batch oracle across any crash/restart point —
tests/test_streaming_pipeline.py forces a mid-stream restart and a full
replay and checks both (the streaming twin of tests/test_resume).

Deferred URLs are reported in the verdict stream (admitted=false) but not
re-enqueued here; a production loop feeds them back into the source with
their retry time as the new event timestamp, which lands them in a later
metering window by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axora_spark.catalog import SnapshotCatalog
from axora_spark.streaming.ingest import stream_to_catalog
from axora_spark.streaming.politeness import politeness_stream


def fetched_stub_cols(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for the fetch stage: body hash derived from
    the url (what a real fetch of the deterministic fixture corpus would
    hash), status 200. Column map only — keeps the stage replay-safe."""
    return df.select(
        "host", "url", "ts", "window_start",
        F.sha2(F.col("url"), 256).alias("body_sha"),
        F.lit(200).alias("status"))


def streaming_crawl_pipeline(urls: DataFrame, catalog: SnapshotCatalog,
                             table: str, checkpoint_dir: str,
                             budget: int = 5, window_s: float = 60.0,
                             compact_every: int | None = 64,
                             query_name: str = "stream_crawl"):
    """Start the composed flow over a streaming urls(host, url, ts)
    frame; returns the StreamingQuery (caller stops it). `table` gains
    one row per ADMITTED url, exactly once, schema
    (host, url, ts, window_start, body_sha, status)."""
    verdicts = politeness_stream(urls, budget=budget, window_s=window_s)
    admitted = fetched_stub_cols(verdicts.filter(F.col("admitted")))
    return stream_to_catalog(admitted, catalog, table, key="url",
                             checkpoint_dir=checkpoint_dir,
                             query_name=query_name,
                             compact_every=compact_every)
