"""S8 — public-IP probe (crawler/ip_checker.go:10-35).

The reference GETs https://api.ipify.org?format=text with the crawler UA
and returns the trimmed body; a non-200 yields an empty string WITHOUT an
error (ip_checker.go:24-26), a transport failure propagates as an error.
It runs once at startup as an ops probe (cmd/main.go) — the result is
logged, never joined into the dataflow.

Spark-first shape: on a 1000-executor cluster the DRIVER's egress IP says
nothing about the workers' — fetch traffic leaves from every executor
node, so the probe worth logging is *per executor*. `probe_executors`
fans one probe task out per executor slot group (`spark.range(slots)`
repartitioned so every executor runs ≥1 task), dedups (executor_host,
ip) and returns the distinct egress identities, which the crawl driver
can write to the metrics catalog next to A5. The transport is the same
injectable `(url) -> (status, body)` seam as S3 (sources/fetch.py), so
tests run network-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from axora_spark.sources.fetch import Transport, default_transport

IPIFY_URL = "https://api.ipify.org?format=text"
USER_AGENT = "Axora-Crawler/1.0"  # ip_checker.go:16


def get_public_ip(transport: Transport | None = None,
                  endpoint: str = IPIFY_URL) -> str:
    """Driver-side probe with the reference's exact degradation contract:
    200 → trimmed body; any non-200 → "" (ip_checker.go:24-26). Transport
    exceptions surface as status 0 under the S3 contract and map to ""
    here as well — the Go caller only logs the error (cmd/main.go), so
    collapsing error→"" preserves observable behavior."""
    tp = transport or default_transport(user_agent=USER_AGENT)
    status, body = tp(endpoint)
    if status != 200 or body is None:
        return ""
    return body.strip()


PROBE_SCHEMA = T.StructType([
    T.StructField("executor_host", T.StringType(), False),
    T.StructField("pid", T.IntegerType(), False),
    T.StructField("egress_ip", T.StringType(), False),
])


def probe_executors(spark: SparkSession,
                    transport: Transport | None = None,
                    endpoint: str = IPIFY_URL,
                    slots: int | None = None) -> DataFrame:
    """Distinct (executor_host, egress_ip) across the cluster.

    One task per parallelism slot (narrow, no shuffle until the final
    tiny distinct); each task issues ONE probe request — at 1000
    executors that is ~1000 requests total, amortized over a crawl run,
    and the distinct output is executor-count-bounded (collectable)."""
    tp = transport or default_transport(user_agent=USER_AGENT)
    n = slots or spark.sparkContext.defaultParallelism

    def _probe(batches):
        import os
        import socket
        import pandas as pd
        probed = False
        for _ in batches:
            if probed:        # one request per TASK, not per batch
                continue
            probed = True
            status, body = tp(endpoint)
            ip = body.strip() if status == 200 and body is not None else ""
            yield pd.DataFrame({"executor_host": [socket.gethostname()],
                                "pid": [os.getpid()],
                                "egress_ip": [ip]})

    return (spark.range(n).repartition(n)
            .mapInPandas(_probe, schema=PROBE_SCHEMA)
            .select("executor_host", "egress_ip").distinct())
