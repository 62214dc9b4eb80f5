"""Streaming incremental near-dup ingest: per-micro-batch dedup against
the sigs store, exactly-once across checkpoint loss, twin-verified."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import types as T

from axora_spark.streaming.dedup import stream_dedup_ingest
from test_incremental import _py_assign  # tests dir is on sys.path

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
])

A = ("the quick brown fox jumps over the lazy dog while seventeen "
     "sailors watch from a distant rusty harbor wall every evening")
B = ("gardening advice for tomatoes basil and rosemary in terracotta "
     "pots on a sunny balcony with morning light")
C = ("entirely novel third content with plenty of distinct words to "
     "form shingles and no overlap at all")

CHUNKS = [
    {"d01": A, "d02": B},
    {"d10": A,            # dup of stored d01
     "d11": C},
    {"d20": C,            # dup of batch-2 survivor d11
     "d21": A + " with two extra tail tokens"},  # near-dup of d01
]


def _expected():
    store: dict[str, str] = {}
    dups: dict[str, tuple[str, float]] = {}
    for batch in CHUNKS:
        assigns = _py_assign(batch, store)
        dups.update(assigns)
        store.update({d: t for d, t in batch.items() if d not in assigns})
    return dups, set(store)


def _write_chunk(spark, src, name, rows):
    (spark.createDataFrame(sorted(rows.items()), SCHEMA).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, name)))


def test_stream_dedup_exactly_once(spark, catalog):
    src = tempfile.mkdtemp(prefix="sdd_src_")
    ckpt = tempfile.mkdtemp(prefix="sdd_ckpt_")
    want_dups, want_store = _expected()
    assert want_dups.get("d10") == ("d01", 1.0)  # injected dups fire
    assert want_dups.get("d20") == ("d11", 1.0)
    try:
        _write_chunk(spark, src, "f0", CHUNKS[0])
        stream = (spark.readStream.format("parquet").schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).load(src + "/*"))
        q = stream_dedup_ingest(stream, catalog, ckpt, query_name="sdd1")
        q.processAllAvailable()
        # write chunks one at a time so micro-batch order is pinned
        _write_chunk(spark, src, "f1", CHUNKS[1])
        q.processAllAvailable()
        _write_chunk(spark, src, "f2", CHUNKS[2])
        q.processAllAvailable()
        q.stop()

        got_dups = {r.doc_id: (r.dup_of, r.est_jaccard)
                    for r in catalog.read(spark,
                                          "dup_log_stream").collect()}
        assert got_dups == want_dups
        got_store = {r.doc_id
                     for r in catalog.read(spark, "sigs").collect()}
        assert got_store == want_store

        # LOST checkpoint: the whole source replays (at-least-once) —
        # keyed merges + no-self-match must leave both tables unchanged
        ckpt2 = tempfile.mkdtemp(prefix="sdd_ckpt2_")
        try:
            stream2 = (spark.readStream.format("parquet").schema(SCHEMA)
                       .option("maxFilesPerTrigger", 1).load(src + "/*"))
            q2 = stream_dedup_ingest(stream2, catalog, ckpt2,
                                     query_name="sdd2")
            q2.processAllAvailable()
            q2.stop()
            assert {r.doc_id: (r.dup_of, r.est_jaccard)
                    for r in catalog.read(
                        spark, "dup_log_stream").collect()} == want_dups
            assert {r.doc_id for r in
                    catalog.read(spark, "sigs").collect()} == want_store
        finally:
            shutil.rmtree(ckpt2, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_dedup_compaction(spark, catalog):
    # compact_every=2: after the 2nd sig-committing batch the sigs
    # table collapses to one data dir with identical contents
    src = tempfile.mkdtemp(prefix="sdc_src_")
    ckpt = tempfile.mkdtemp(prefix="sdc_ckpt_")
    try:
        _write_chunk(spark, src, "f0", {"a1": A})
        stream = (spark.readStream.format("parquet").schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).load(src + "/*"))
        q = stream_dedup_ingest(stream, catalog, ckpt,
                                query_name="sdc", compact_every=2)
        q.processAllAvailable()
        _write_chunk(spark, src, "f1", {"b1": B})
        q.processAllAvailable()
        q.stop()
        assert {r.doc_id for r in catalog.read(spark, "sigs").collect()} \
            == {"a1", "b1"}
        assert len(catalog._dirs_for(catalog._load_meta("sigs"),
                                     None)) == 1
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
