"""S3 — fetch stage.

The reference fetches over HTTP through a Tor proxy pool
(cmd/main.go:199-215, crawler/crawler.go:84-86). This sandbox is
network-free, so the fetch is a deterministic join of the admitted wave
against a fixture corpus keyed by canonical URL (SURVEY.md §2.1 S3).
A real deployment swaps `fetch_from_corpus` for `fetch_http` (mapInPandas
with an async HTTP client inside the batch) — the surrounding plan is
identical: admitted wave in, FETCHED-schema rows out, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axora_spark.operators.urls import canonicalize_udf


def corpus_from_link_graph(link_graph: DataFrame) -> DataFrame:
    """Key the fixture corpus by canonical URL once, up front."""
    return (link_graph
            .withColumn("url", canonicalize_udf(F.col("url")))
            .dropDuplicates(["url"]))


def fetch_from_corpus(admitted: DataFrame, corpus: DataFrame,
                      wave: int, broadcast_corpus: bool = True) -> DataFrame:
    """Left join admitted URLs to the corpus. Missing page = fetch error:
    the reference's OnError only logs (crawler/crawler.go OnError) — the
    URL stays seen, produces no links/content. http_status encodes it."""
    right = corpus.select(
        "url", "title", "metas", "body_md", "out_links")
    if broadcast_corpus:
        right = F.broadcast(right)
    return (admitted
            .select("url", "host", "depth")
            .join(right, on="url", how="left")
            .withColumn("wave", F.lit(wave))
            .withColumn("http_status",
                        F.when(F.col("body_md").isNotNull(), F.lit(200))
                         .otherwise(F.lit(404))))
