"""Streaming incremental near-dup ingest — the foreachBatch twin of
operators/incremental.dedup_ingest.

Each micro-batch of (doc_id, text) documents dedupes against the
catalog's accumulated minhash-signature store and lands in two tables:
`sigs` (survivors' signatures) and `dup_log` (assignments). Exactly-once
argument (the stream_to_catalog recipe, extended to a two-table sink):

  * both writes are keyed merge_insert_if_absent on doc_id — a replayed
    batch re-offers rows whose keys already landed and the merge's
    anti-join drops them;
  * incremental_near_dup never self-matches (operators/incremental.py
    excludes b.doc_id == a.doc_id), so a replayed batch whose survivors
    already sit in the store re-derives the SAME assignments: a
    replayed survivor B only gains store partners that were already in
    B's candidate pool on the first run (same-batch docs smaller than B
    were compared then; larger-id survivors D were compared as (B vs D)
    from D's side and est < threshold, else D would not have survived)
    — so both merges re-offer identical rows and commit nothing.

State: none in the stream — the dedup state IS the sigs table, so the
operator survives restarts with only the source checkpoint (and
survives a LOST checkpoint too: a full-source replay converges to the
same table contents, tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from axora_spark import schemas
from axora_spark.catalog import SnapshotCatalog
from axora_spark.checkpoints import release as release_checkpoint
from axora_spark.operators.incremental import (incremental_near_dup,
                                               minhash_sig_array)


def stream_dedup_ingest(stream: DataFrame, catalog: SnapshotCatalog,
                        checkpoint_dir: str, threshold: float = 0.5,
                        sigs_table: str = "sigs",
                        dup_table: str = "dup_log_stream",
                        query_name: str = "dedup_ingest",
                        compact_every: int | None = 64):
    """Start a streaming query deduping (doc_id, text) micro-batches
    against `sigs_table`; returns the StreamingQuery (caller stops it).
    Assignments land in `dup_table` as (doc_id, dup_of, est_jaccard).
    Every `compact_every` sig-committing batches the sigs table is
    compacted and its history expired (the stream_to_catalog
    maintenance story: an unbounded stream otherwise accretes one data
    dir per batch and the per-batch store read degrades to manifest
    listing)."""
    catalog.create_table(sigs_table, schemas.SIGS)
    catalog.create_table(dup_table, schemas.STREAM_DUP_LOG)
    state = {"commits": 0}

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new_sigs = minhash_sig_array(batch_df).localCheckpoint(eager=True)
        try:
            store = catalog.read(spark, sigs_table)
            inner: list = []
            try:
                assigns = incremental_near_dup(
                    new_sigs, store, threshold=threshold,
                    handles=inner) \
                    .localCheckpoint(eager=True)
            finally:
                for h in inner:
                    release_checkpoint(h)
            try:
                catalog.merge_insert_if_absent(spark, dup_table, assigns,
                                               key="doc_id")
                survivors = new_sigs.join(assigns.select("doc_id"),
                                          "doc_id", "left_anti")
                before = catalog.current_snapshot(sigs_table)
                catalog.merge_insert_if_absent(spark, sigs_table,
                                               survivors, key="doc_id")
                if catalog.current_snapshot(sigs_table) == before:
                    return  # full replay — no snapshot, no maintenance
                state["commits"] += 1
                if compact_every and \
                        state["commits"] % compact_every == 0:
                    catalog.compact(spark, sigs_table)
                    catalog.expire_snapshots(sigs_table, keep_last=1)
            finally:
                release_checkpoint(assigns)
        finally:
            release_checkpoint(new_sigs)

    return (stream.writeStream
            .foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start())
