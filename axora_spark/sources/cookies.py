"""S7 — per-URL cookie persistence (reference: crawler/boltdb.go:85-113).

The reference backs colly's cookie jar with BoltDB: `Cookies(u)` reads key
`"c:<url>"` before each request, `SetCookies(u, cookies)` overwrites it
from each response — a latest-wins string store keyed by the EXACT url.

Spark-first re-expression: the jar is a small catalog TABLE
(url, url_hash, cookies, updated_wave) — O(URLs that ever answered
Set-Cookie), orders of magnitude below `seen`. Per wave:

    admitted ⟕ cookies          (equi-join on url; url_hash rides along
                                 so the table buckets like the frontier
                                 tables — storage-partitioned at scale)
      → fetch_http_cookies      (transport sends the Cookie header,
                                 surfaces Set-Cookie per row)
      → merge_upsert_latest     (latest wave wins; crash-resumed waves
                                 re-upsert identical rows — idempotent)

`make_cookie_fetcher` packages the three steps behind the crawl plan's
`fetcher(admitted, wave)` seam (plans/crawl.py:158), so cookie persistence
composes with run_crawl without touching the wave loop.

The join is a plain hash join whose build side is the (small) jar; at a
scale where the jar itself is large it shuffles on url — the same key the
admitted wave is already organized by. Nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.catalog import SnapshotCatalog
from axora_spark.operators.urls import url_hash
from axora_spark.sources.fetch import FETCHED_RAW, fetch_stage

# (url, presented_cookie | None) -> (status, body | None, set_cookie | None)
CookieTransport = Callable[[str, str | None],
                           tuple[int, str | None, str | None]]

COOKIES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("cookies", T.StringType(), True),
    T.StructField("updated_wave", T.IntegerType(), False),
])

FETCHED_COOKIES = T.StructType(
    list(FETCHED_RAW.fields)
    + [T.StructField("set_cookie", T.StringType(), True)])


def init_cookie_table(catalog: SnapshotCatalog) -> None:
    """S5-style DDL for the jar (CREATE TABLE IF NOT EXISTS)."""
    catalog.create_table("cookies", COOKIES_SCHEMA)


def attach_cookies(admitted: DataFrame, jar: DataFrame) -> DataFrame:
    """admitted(url, host, depth, ...) ⟕ jar → + `cookie` string column
    (NULL = no stored cookies, matching the jar's empty-string Get)."""
    right = jar.select(F.col("url"), F.col("cookies").alias("cookie"))
    return admitted.join(right, on="url", how="left")


def fetch_http_cookies(admitted: DataFrame, wave: int,
                       transport: CookieTransport,
                       n_threads: int = 8) -> DataFrame:
    """S3 fetch with the jar in the loop: the SAME fetch_stage core as
    sources.fetch.fetch_http (one implementation of the threading /
    OnError contract — code-review r3 removed the near-copy), with the
    row's stored cookie as an extra transport input and the response's
    Set-Cookie as an extra output column."""
    src = admitted if "cookie" in admitted.columns else \
        admitted.withColumn("cookie", F.lit(None).cast("string"))

    def call(url, cookie):
        return transport(url, cookie if isinstance(cookie, str) else None)

    return fetch_stage(src.select("url", "host", "depth", "cookie"),
                       wave, ["url", "cookie"], call, ["set_cookie"],
                       FETCHED_COOKIES, n_threads)


def update_cookie_jar(catalog: SnapshotCatalog, spark: SparkSession,
                      fetched: DataFrame, wave: int) -> None:
    """Upsert this wave's Set-Cookie responses, latest wave wins
    (SetCookies overwrite, crawler/boltdb.go:103-113)."""
    rows = (fetched
            .filter(F.col("set_cookie").isNotNull())
            .select(F.col("url"),
                    url_hash(F.col("url")).alias("url_hash"),
                    F.col("set_cookie").alias("cookies"),
                    F.lit(wave).alias("updated_wave")))
    init_cookie_table(catalog)
    catalog.merge_upsert_latest(spark, "cookies", rows,
                                key="url", order_col="updated_wave")


def make_cookie_fetcher(catalog: SnapshotCatalog,
                        transport: CookieTransport,
                        n_threads: int = 8):
    """Cookie-aware `fetcher(admitted, wave)` for run_crawl: attach the
    jar, fetch, upsert Set-Cookie rows (the upsert's catalog write is the
    action that materializes the fetch exactly once — the returned frame
    is persisted so the wave's downstream consumers reuse it; the previous
    wave's cache is released on the next call)."""
    last: list[DataFrame] = []

    def fetcher(admitted: DataFrame, wave: int) -> DataFrame:
        spark = admitted.sparkSession
        init_cookie_table(catalog)
        jar = catalog.read(spark, "cookies")
        fetched = fetch_http_cookies(
            attach_cookies(admitted, jar), wave, transport,
            n_threads).persist()
        update_cookie_jar(catalog, spark, fetched, wave)
        if last:
            last.pop().unpersist()
        last.append(fetched)
        return fetched.drop("set_cookie")

    return fetcher


def dict_cookie_transport(pages: dict[str, str],
                          set_cookies: dict[str, str] | None = None,
                          echo: bool = False) -> CookieTransport:
    """Deterministic fixture transport: url → html (missing = 404);
    `set_cookies[url]` is returned as the response Set-Cookie; with
    `echo`, the presented cookie is appended to the body inside an HTML
    comment so tests can assert what the wire actually carried."""
    sc = set_cookies or {}

    def _get(url: str, cookie: str | None
             ) -> tuple[int, str | None, str | None]:
        body = pages.get(url)
        if body is None:
            return 404, None, None
        if echo:
            body = body + f"<!--cookie:{cookie or ''}-->"
        return 200, body, sc.get(url)

    return _get
