"""S3 — fetch stage, two implementations with one contract:

* `fetch_http` — the REAL stage shape: mapInPandas over the admitted wave
  with an injectable `transport(url) -> (status, body)` callable. The
  default transport is a pooled urllib GET with the reference's UA/timeout
  semantics (cmd/main.go:199-215: 5-min timeout, pooled connections;
  crawler/crawler.go:84-86); tests inject a deterministic fixture
  transport (this sandbox is network-free). Errors — timeout, non-200,
  truncated body — produce rows with the status code and NULL body:
  OnError only logs in the reference (crawler/crawler.go OnError), the URL
  stays seen and yields no links/content. Narrow stage (no shuffle); at
  scale concurrency = input partitions × in-batch thread pool.

* `fetch_from_corpus` — deterministic join of the admitted wave against a
  fixture corpus keyed by canonical URL (broadcast-sized fixtures only).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.operators.urls import canonicalize_udf

Transport = Callable[[str], tuple[int, str | None]]

FETCHED_RAW = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("http_status", T.IntegerType(), False),
    T.StructField("body_html", T.StringType(), True),
    # wall-clock transport latency, integer ms (measured around the
    # transport call in fetch_stage — error rows included: a timeout IS
    # a latency observation). Feeds latency-adaptive politeness
    # (operators/adaptive.py) when cfg.adaptive_politeness is on.
    T.StructField("fetch_ms", T.LongType(), True),
])


def default_transport(timeout_s: float = 300.0,
                      user_agent: str = "axora-spark/1.0",
                      max_bytes: int = 16 * 1024 * 1024) -> Transport:
    """urllib GET, one request per call (stdlib urllib opens a fresh
    connection per request — no keep-alive pooling; a deployment that
    needs connection reuse swaps in an http.client/requests-session
    transport through the same callable contract). 5-min timeout mirrors
    cmd/main.go:211; any exception maps to status 0 (network error),
    non-2xx pass their code through, bodies decode lossily (the parser is
    tolerant).

    max_bytes caps the body read: a multi-GB response must not be
    materialized into executor memory per row (ADVICE r2 #5). A truncated
    page parses as far as it goes — same degradation class as a dropped
    connection, and the mini-DOM parser is tolerant of unclosed tags."""
    def _get(url: str) -> tuple[int, str | None]:
        import urllib.error
        import urllib.request
        req = urllib.request.Request(url,
                                     headers={"User-Agent": user_agent})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read(max_bytes)
                return resp.status, body.decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            return e.code, None
        except Exception:
            return 0, None
    return _get


def dict_transport(pages: dict[str, str]) -> Transport:
    """Deterministic fixture transport: url → html; missing = 404."""
    def _get(url: str) -> tuple[int, str | None]:
        body = pages.get(url)
        return (200, body) if body is not None else (404, None)
    return _get


def fetch_stage(src: DataFrame, wave: int, in_cols: list[str], call,
                out_extra: list[str], schema, n_threads: int) -> DataFrame:
    """Shared S3 mapInPandas core (ONE implementation of the fetch
    contract — fetch_http and the cookie-aware S7 stage both build on
    it): threaded per-row `call(*row_vals) -> (status, body, *extras)`,
    OnError mapping (non-200 → NULL body, row kept), wave stamp. A
    thread pool inside each Arrow batch overlaps request latency (the
    reference runs 3 async workers/domain; per-host pacing is already
    enforced upstream by W1, so threads here only hide latency, never
    violate politeness). Narrow stage, no shuffle."""
    def _fetch(batches):
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        def _timed(a):
            t0 = _time.monotonic()
            r = call(*a)
            return r, int((_time.monotonic() - t0) * 1000)

        for pdf in batches:
            if pdf.empty:
                continue
            args = list(zip(*[pdf[c] for c in in_cols]))
            with ThreadPoolExecutor(max_workers=max(1, n_threads)) as ex:
                results = list(ex.map(_timed, args))
            out = pdf[["url", "host", "depth"]].copy()
            out["wave"] = wave
            out["http_status"] = [r[0] for r, _ in results]
            out["body_html"] = [r[1] if r[0] == 200 else None
                                for r, _ in results]
            # per-call wall latency (integer ms; errors included — a
            # timeout IS an observation the adaptive scheduler needs)
            out["fetch_ms"] = [ms for _, ms in results]
            for i, name in enumerate(out_extra):
                out[name] = [r[2 + i] for r, _ in results]
            yield out

    return src.mapInPandas(_fetch, schema=schema)


def fetch_http(admitted: DataFrame, wave: int,
               transport: Transport | None = None,
               n_threads: int = 8) -> DataFrame:
    """The real S3 stage: admitted(url, host, depth) → FETCHED_RAW rows
    (see fetch_stage for the execution shape)."""
    tp = transport or default_transport()
    return fetch_stage(admitted.select("url", "host", "depth"), wave,
                       ["url"], tp, [], FETCHED_RAW, n_threads)


def corpus_from_link_graph(link_graph: DataFrame) -> DataFrame:
    """Key the fixture corpus by canonical URL once, up front."""
    return (link_graph
            .withColumn("url", canonicalize_udf(F.col("url")))
            .dropDuplicates(["url"]))


def fetch_from_corpus(admitted: DataFrame, corpus: DataFrame,
                      wave: int, broadcast_corpus: bool = True) -> DataFrame:
    """Left join admitted URLs to the corpus. Missing page = fetch error:
    the reference's OnError only logs (crawler/crawler.go OnError) — the
    URL stays seen, produces no links/content. http_status encodes it.

    Works for both corpus shapes: raw HTML (body_html — the default; the
    parse stage runs downstream) and pre-parsed (title/metas/body_md/
    out_links). broadcast_corpus=True fits the fixture corpora; at scale
    the corpus side is replaced by fetch_http (no join at all)."""
    body_col = "body_html" if "body_html" in corpus.columns else "body_md"
    payload = [c for c in ("title", "metas", "body_md", "out_links",
                           "body_html", "fetch_ms") if c in corpus.columns]
    right = corpus.select("url", *payload)
    if broadcast_corpus:
        right = F.broadcast(right)
    return (admitted
            .select("url", "host", "depth")
            .join(right, on="url", how="left")
            .withColumn("wave", F.lit(wave))
            .withColumn("http_status",
                        F.when(F.col(body_col).isNotNull(), F.lit(200))
                         .otherwise(F.lit(404))))
