"""Custom stateful streaming sessionizer (applyInPandasWithState):
micro-batch composition must equal the one-batch answer and the pure
oracle, for the same event set."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest

from axora_spark.streaming.sessions import (sessionize_batch_py,
                                            sessionize_stream)


def _mk_events():
    """3 users, gaps straddling the 1800 s threshold."""
    base = 1_700_000_000
    rows = []
    # user 1: 3 sessions (gaps 3000, 2000), 5 events
    for off in (0, 100, 3100, 5200, 5300):
        rows.append((1, base + off))
    # user 2: 1 session, 3 events (gaps exactly 1800 — NOT a new session)
    for off in (0, 1800, 3600):
        rows.append((2, base + off))
    # user 3: 2 sessions, 2 events
    for off in (0, 1801):
        rows.append((3, base + off))
    return rows


def test_pure_oracle():
    got = sessionize_batch_py([(u, float(t)) for u, t in _mk_events()])
    assert got == {1: (3, 5), 2: (1, 3), 3: (2, 2)}


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_matches_oracle(spark, n_files):
    rows = _mk_events()
    want = sessionize_batch_py([(u, float(t)) for u, t in rows])

    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")
    try:
        # split events across n_files CHRONOLOGICAL parquet files → n
        # micro-batches (maxFilesPerTrigger=1). The operator's contract is
        # event-time-ordered arrival per user ACROSS batches (a time-
        # partitioned file/kafka source); within a batch order is free.
        srt = sorted(rows, key=lambda r: r[1])
        step = (len(srt) + n_files - 1) // n_files
        chunks = [srt[i * step:(i + 1) * step] for i in range(n_files)]
        chunks = [c for c in chunks if c]
        from pyspark.sql import functions as F
        for i, chunk in enumerate(chunks):
            df = spark.createDataFrame(chunk, "user_id long, epoch long") \
                .select("user_id",
                        F.timestamp_seconds(F.col("epoch")).alias("ts"))
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"f{i}"))

        stream = (spark.readStream.format("parquet")
                  .schema("user_id long, ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .load(src + "/*"))
        out = sessionize_stream(stream)
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName(f"sess_{n_files}")
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

        # update mode emits one row per (user, batch); n_events is
        # monotone per user, so the final state = the max-n_events row
        pdf = spark.sql(f"SELECT * FROM sess_{n_files}").toPandas()
        latest: dict[int, tuple[int, int]] = {}
        for _, r in pdf.iterrows():
            cand = (int(r.n_sessions), int(r.n_events))
            u = int(r.user_id)
            if u not in latest or cand[1] > latest[u][1]:
                latest[u] = cand
        assert latest == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        time.sleep(0)
