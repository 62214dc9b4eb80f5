"""Anchor-text aggregation per link TARGET — the classic web-scale
inverted link signal: what does the web call this page, and how many
pages (and hosts) endorse it?

The reference extracts hrefs for the frontier only
(crawler/dom_handler.go OnHTML("a[href]")); an indexer/ranker keyed on
the TARGET needs (in-degree, distinct endorsing hosts, the dominant
anchor phrases). This is the canonical MapReduce example re-expressed
declaratively.

Scale shapes, chosen for the mega-target problem (a homepage with 10⁸
in-links):
  * per-target profile: ONE keyed aggregate (count + count_distinct
    host) with map-side partial reduction;
  * top anchor phrases: per-(target, text) counts first (keyed agg —
    collapses the 10⁸ duplicate "click here" rows to one row per
    phrase), then a row_number window against a LITERAL k so Spark
    plans WindowGroupLimit — each partition prunes to its own top-k
    BEFORE the exchange, so the window never materializes a
    mega-target's full phrase list in one task;
  * the two aggregates and the window all hash by the same target key,
    so the final join re-uses the partitioning (no extra exchange).

A `collect_set(text)` per target — the obvious one-liner — is NOT used:
set growth is unbounded per key and map-side partial sets for a
mega-target blow executor memory exactly when the operator matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def aggregate_anchor_text(links: DataFrame, target_col: str = "target",
                          text_col: str = "text",
                          src_host_col: str = "src_host",
                          top_k: int = 8) -> DataFrame:
    """links: one row per (source page → target URL) anchor. Returns one
    row per target: in_links, n_src_hosts, anchors (the top_k most
    frequent anchor phrases, count-desc / text-asc selection, presented
    sorted — fully deterministic)."""
    per_target = (links.groupBy(target_col)
                  .agg(F.count("*").alias("in_links"),
                       F.count_distinct(src_host_col)
                       .alias("n_src_hosts")))
    phrase = (links.groupBy(target_col, text_col)
              .agg(F.count("*").alias("_n")))
    w = Window.partitionBy(target_col).orderBy(F.col("_n").desc(),
                                               F.col(text_col).asc())
    top = (phrase.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= top_k)   # literal → WindowGroupLimit
           .groupBy(target_col)
           .agg(F.array_sort(F.collect_list(text_col)).alias("anchors")))
    return (per_target.join(top, target_col)
            .select(F.col(target_col).alias("url"), "in_links",
                    "n_src_hosts", "anchors"))
