"""Stateful streaming politeness governor (W1's streaming twin):
micro-batch composition must equal the one-batch answer and the pure
oracle, and every (host, window) must admit at most `budget` URLs."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from axora_spark.streaming.politeness import (politeness_batch_py,
                                              politeness_stream)

BUDGET = 2
WINDOW_S = 60.0


def _mk_urls():
    """Two hosts; hot host bursts past the budget inside one window,
    then recovers in the next window."""
    base = 1_700_000_000
    rows = []
    # hot host: 5 urls in window 0 (only 2 admit), 2 in window 1
    for i, off in enumerate((0, 5, 10, 20, 30)):
        rows.append(("hot.example.org", f"https://hot.example.org/w0/{i}",
                     base + off))
    for i, off in enumerate((61, 70)):
        rows.append(("hot.example.org", f"https://hot.example.org/w1/{i}",
                     base + off))
    # calm host: 2 urls, both admit
    rows.append(("calm.example.net", "https://calm.example.net/a", base + 3))
    rows.append(("calm.example.net", "https://calm.example.net/b", base + 40))
    return rows


def test_pure_oracle():
    got = politeness_batch_py(
        [(h, u, float(t)) for h, u, t in _mk_urls()],
        budget=BUDGET, window_s=WINDOW_S)
    admitted = {u for (h, u), ok in got.items() if ok}
    assert admitted == {
        "https://hot.example.org/w0/0", "https://hot.example.org/w0/1",
        "https://hot.example.org/w1/0", "https://hot.example.org/w1/1",
        "https://calm.example.net/a", "https://calm.example.net/b"}


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_matches_oracle(spark, n_files):
    rows = _mk_urls()
    want = politeness_batch_py([(h, u, float(t)) for h, u, t in rows],
                               budget=BUDGET, window_s=WINDOW_S)

    src = tempfile.mkdtemp(prefix="pol_src_")
    ckpt = tempfile.mkdtemp(prefix="pol_ckpt_")
    try:
        srt = sorted(rows, key=lambda r: (r[2], r[1]))
        step = (len(srt) + n_files - 1) // n_files
        chunks = [srt[i * step:(i + 1) * step] for i in range(n_files)]
        for i, chunk in enumerate(c for c in chunks if c):
            df = spark.createDataFrame(
                chunk, "host string, url string, epoch long") \
                .select("host", "url",
                        F.timestamp_seconds(F.col("epoch")).alias("ts"))
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"f{i}"))

        stream = (spark.readStream.format("parquet")
                  .schema("host string, url string, ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .load(src + "/*"))
        out = politeness_stream(stream, budget=BUDGET, window_s=WINDOW_S)
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(f"pol_{n_files}")
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

        pdf = spark.sql(f"SELECT * FROM pol_{n_files}").toPandas()
        got = {(r.host, r.url): bool(r.admitted)
               for _, r in pdf.iterrows()}
        assert got == want
        # hard cap: per (host, window) at most BUDGET admissions
        admitted = pdf[pdf.admitted]
        per_win = admitted.groupby(["host", "window_start"]).size()
        assert (per_win <= BUDGET).all()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_with_adaptive_budgets(spark, n_files):
    """Stream-static per-host budget join (the latency-adaptive table
    metering the continuous stream): hot host throttled to 1/window,
    calm host raised to 3 — micro-batch-invariant and equal to the
    pure oracle with the same budgets dict."""
    rows = _mk_urls()
    budgets = {"hot.example.org": 1, "calm.example.net": 3}
    want = politeness_batch_py([(h, u, float(t)) for h, u, t in rows],
                               budget=BUDGET, window_s=WINDOW_S,
                               budgets=budgets)
    # throttling must actually change verdicts vs the flat budget
    flat = politeness_batch_py([(h, u, float(t)) for h, u, t in rows],
                               budget=BUDGET, window_s=WINDOW_S)
    assert want != flat

    src = tempfile.mkdtemp(prefix="pol_ab_src_")
    ckpt = tempfile.mkdtemp(prefix="pol_ab_ckpt_")
    try:
        srt = sorted(rows, key=lambda r: (r[2], r[1]))
        step = (len(srt) + n_files - 1) // n_files
        chunks = [srt[i * step:(i + 1) * step] for i in range(n_files)]
        for i, chunk in enumerate(c for c in chunks if c):
            df = spark.createDataFrame(
                chunk, "host string, url string, epoch long") \
                .select("host", "url",
                        F.timestamp_seconds(F.col("epoch")).alias("ts"))
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"f{i}"))

        stream = (spark.readStream.format("parquet")
                  .schema("host string, url string, ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .load(src + "/*"))
        bdf = spark.createDataFrame(
            [(h, b) for h, b in budgets.items()],
            "host string, _budget int")
        out = politeness_stream(stream, budget=BUDGET,
                                window_s=WINDOW_S, budgets=bdf)
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(f"pol_ab_{n_files}")
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

        pdf = spark.sql(f"SELECT * FROM pol_ab_{n_files}").toPandas()
        got = {(r.host, r.url): bool(r.admitted)
               for _, r in pdf.iterrows()}
        assert got == want
        admitted = pdf[pdf.admitted]
        per_win = admitted.groupby(["host", "window_start"]).size()
        for (h, _), n in per_win.items():
            assert n <= budgets.get(h, BUDGET)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
