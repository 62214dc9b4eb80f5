"""Exactly-once streaming ingest into the snapshot catalog.

Structured Streaming's file/kafka sources give at-least-once delivery
into foreachBatch (a batch can be REPLAYED after a crash between the
batch function and the checkpoint commit). The catalog's keyed
merge_insert_if_absent makes the sink idempotent — replaying a batch
re-offers rows whose keys already landed and the anti-join drops them —
so source-side replay + idempotent sink = exactly-once TABLE CONTENTS,
the same argument the crawl's crash-resume path uses for its wave
writes (plans/crawl.py lineage rollback).

This is the standard Spark recipe (foreachBatch + MERGE on a key) for
streaming into a transactional table; on real Iceberg/Delta the
merge_insert_if_absent call site becomes MERGE INTO. State: none held
in the stream — dedup lives in the TABLE via the key, so the operator
survives restarts with only the source checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from axora_spark.catalog import SnapshotCatalog


def stream_to_catalog(stream: DataFrame, catalog: SnapshotCatalog,
                      table: str, key: str, checkpoint_dir: str,
                      query_name: str = "catalog_ingest",
                      compact_every: int | None = 64):
    """Start a streaming query appending `stream` rows into `table`
    exactly once by `key`. Returns the StreamingQuery (caller stops it).

    Each micro-batch runs ONE merge (an O(new)+anti-join append, never
    a table rewrite); batches arriving out of order across restarts are
    safe because the merge keeps the FIRST row per key and replays offer
    identical rows. Table-maintenance over an unbounded stream
    (code-review r3): all-replay batches commit NO snapshot (the merge's
    skip_empty append), and every `compact_every` committed batches the
    table is compacted and its history expired — without this a
    long-running stream accumulates one data dir per batch and reads
    degrade to manifest listing."""
    state = {"commits": 0}

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        before = catalog.current_snapshot(table)
        catalog.merge_insert_if_absent(spark, table, batch_df, key)
        if catalog.current_snapshot(table) == before:
            return  # batch was a full replay — nothing committed
        state["commits"] += 1
        if compact_every and state["commits"] % compact_every == 0:
            catalog.compact(spark, table)
            catalog.expire_snapshots(table, keep_last=1)

    return (stream.writeStream
            .foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start())
