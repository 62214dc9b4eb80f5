"""X3/X1 — link extraction + absolutization from fetched pages.

The reference fires OnHTML per `a[href]` anchor and resolves each against
the page URL (crawler/dom_handler.go:17-29). The fixture corpus carries
`out_links` directly (the DOM-parse step is upstream of this operator), so
extraction is `explode` + vectorized urljoin + canonicalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axora_spark.config import CrawlConfig
from axora_spark.operators.filters import apply_frontier_filters
from axora_spark.operators.urls import absolutize_udf, canonicalize_udf, url_hash, host_col


def links_from_fetched(fetched: DataFrame, cfg: CrawlConfig, wave: int
                       ) -> DataFrame:
    """Wave-(w+1) frontier candidates from wave-w fetched pages.

    W2 depth horizon: children enter at parent depth+1; rows whose child
    depth would exceed max_depth never materialize (colly MaxDepth(2),
    crawler/crawler.go:63). The depth filter is applied BEFORE the explode
    so deep pages don't even fan out."""
    parents = (fetched
               .filter(F.col("http_status") == 200)
               .filter(F.col("depth") + 1 <= cfg.max_depth)
               .select(F.col("url").alias("parent_url"),
                       (F.col("depth") + 1).alias("depth"),
                       F.explode_outer("out_links").alias("href"))
               .filter(F.col("href").isNotNull()))
    cands = (parents
             .withColumn("url", canonicalize_udf(
                 absolutize_udf(F.col("parent_url"), F.col("href"))))
             .filter(F.col("url") != "")
             .withColumn("host", host_col(F.col("url")))
             .select("url", "host", "depth"))
    cands = apply_frontier_filters(cands, cfg)
    if cfg.priority_mode == "url_score":
        from axora_spark.operators.priority import url_priority_col
        prio = url_priority_col(F.col("url"), F.col("depth"))
    else:
        prio = F.lit(0.0)
    return (cands
            .withColumn("url_hash", url_hash(F.col("url")))
            .withColumn("priority", prio)
            .withColumn("discovered_wave", F.lit(wave + 1))
            .withColumn("status", F.lit("pending")))
