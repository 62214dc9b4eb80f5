"""Sitemap source (sitemaps.org protocol): seed a crawl — and feed the
freshness model — from a site's own published URL inventory.

The reference seeds only from a literal seed list (cmd/main.go:143-146)
and from SERPs (urls_collector.go); real crawl operations start from
/sitemap.xml, which also carries <lastmod> — the change signal the
recrawl scheduler (operators/recrawl.py) otherwise has to estimate
from repeated fetches.

Protocol (https://www.sitemaps.org/protocol.html): a <urlset> holds up
to 50k <url><loc> entries; a <sitemapindex> holds up to 50k <sitemap>
<loc> children — so one index can name 2.5B URLs. That number dictates
the scale shape: the INDEX file is one tiny fetch, but the child
sitemaps must be fetched and exploded DISTRIBUTED — this module runs
child fetches through the same mapInPandas fetch_stage as S3 (threaded
per-batch, injectable transport, error rows for dead children) and
explodes entries executor-side. Nothing about the URL inventory ever
funnels through the driver except the index's child LIST (≤50k strings
by spec).

XML parsing is stdlib ElementTree — sitemaps are machine-generated
XML, not tag soup, and the spec mandates well-formedness; a malformed
file degrades to zero entries (the fetch-error shape), mirroring how
parse errors are handled across the engine.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

ENTRY = T.StructType([
    T.StructField("loc", T.StringType(), False),
    T.StructField("lastmod", T.StringType(), True),
    T.StructField("changefreq", T.StringType(), True),
    T.StructField("priority", T.DoubleType(), True),
])


def parse_sitemap(xml: str) -> dict:
    """One sitemap document → {"kind": "urlset"|"sitemapindex"|"error",
    "entries": [{loc, lastmod, changefreq, priority}, ...]}. Index
    entries carry loc/lastmod only (the spec defines no changefreq/
    priority for <sitemap> children). Namespaced and bare tags both
    accepted — real-world sitemaps omit the namespace often enough."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return {"kind": "error", "entries": []}
    tag = root.tag.removeprefix(_NS)
    if tag not in ("urlset", "sitemapindex"):
        return {"kind": "error", "entries": []}

    def _text(el, name):
        c = el.find(_NS + name)
        if c is None:
            c = el.find(name)
        return c.text.strip() if c is not None and c.text else None

    child = "url" if tag == "urlset" else "sitemap"
    entries = []
    for el in list(root.iter(_NS + child)) + list(root.iter(child)):
        loc = _text(el, "loc")
        if not loc:
            continue
        prio = _text(el, "priority")
        try:
            prio = float(prio) if prio is not None else None
        except ValueError:
            prio = None
        entries.append({"loc": loc, "lastmod": _text(el, "lastmod"),
                       "changefreq": _text(el, "changefreq"),
                        "priority": prio})
    return {"kind": tag, "entries": entries}


def _parse_entries_udf(kind: str):
    import pandas as pd

    @F.pandas_udf(T.ArrayType(ENTRY))
    def u(bodies):
        def one(b):
            if not isinstance(b, str) or not b:
                return []
            parsed = parse_sitemap(b)
            return parsed["entries"] if parsed["kind"] == kind else []
        return bodies.map(one)
    return u.asNondeterministic()


def expand_sitemaps(spark: SparkSession, sitemap_urls: list[str],
                    transport, n_threads: int = 8) -> DataFrame:
    """Sitemap URLs (plain or index, mixed) → one row per page entry:
    (sitemap_url, loc, lastmod, changefreq, priority).

    Two distributed fetch levels (the spec's maximum nesting): level 0
    fetches the given files, splits page entries from index children;
    level 1 fetches the children. Both levels run through fetch_stage's
    mapInPandas (S3's exact execution shape — threaded, error-tolerant,
    no driver fan-in); only the child URL LIST (≤50k/index by spec)
    passes through the driver between levels."""
    from axora_spark.sources.fetch import FETCHED_RAW, fetch_stage

    def _fetch(urls_df) -> DataFrame:
        return fetch_stage(urls_df, 0, ["url"], transport, [],
                           FETCHED_RAW, n_threads)

    def _mk(urls: list[str]) -> DataFrame:
        n = max(1, min(len(urls), spark.sparkContext.defaultParallelism))
        return spark.createDataFrame(
            [(u, "", 0) for u in urls],
            "url string, host string, depth int").repartition(n)

    lvl0 = _fetch(_mk(sitemap_urls)).persist()
    pages0 = (lvl0.select(F.col("url").alias("sitemap_url"),
                          _parse_entries_udf("urlset")(F.col("body_html"))
                          .alias("es")))
    children = (lvl0.select(
        _parse_entries_udf("sitemapindex")(F.col("body_html")).alias("es"))
        .select(F.explode_outer("es").alias("e"))
        .filter(F.col("e").isNotNull())
        .select(F.col("e.loc").alias("url")))
    child_urls = [r["url"] for r in children.distinct().collect()]
    out = pages0
    if child_urls:
        lvl1 = _fetch(_mk(child_urls))
        pages1 = (lvl1.select(
            F.col("url").alias("sitemap_url"),
            _parse_entries_udf("urlset")(F.col("body_html")).alias("es")))
        out = pages0.unionByName(pages1)
    expl = (out.select("sitemap_url", F.explode_outer("es").alias("e"))
            .filter(F.col("e").isNotNull())
            .select("sitemap_url", F.col("e.loc").alias("loc"),
                    F.col("e.lastmod").alias("lastmod"),
                    F.col("e.changefreq").alias("changefreq"),
                    F.col("e.priority").alias("priority")))
    lvl0.unpersist()
    return expl


def sitemap_seed_frontier(spark: SparkSession, cfg, entries: DataFrame
                          ) -> DataFrame:
    """Sitemap entries → wave-0 frontier rows (the serp_seed_frontier
    adapter shape): canonicalized, frontier-filtered, deduped, with the
    sitemap's own <priority> (default 0.5 per spec) as the scheduler
    priority — the site's declared importance ordering drives W1
    admission within each host. Duplicate locs across sitemaps collapse
    deterministically in dedup_within_wave (max priority wins)."""
    from axora_spark.operators.filters import apply_frontier_filters
    from axora_spark.operators.frontier import dedup_within_wave
    from axora_spark.operators.urls import (canonicalize_udf, host_col,
                                            url_hash)
    df = (entries
          .withColumn("url", canonicalize_udf(F.col("loc")))
          .filter(F.col("url") != "")
          .withColumn("host", host_col(F.col("url")))
          .select("url", "host",
                  F.coalesce(F.col("priority"), F.lit(0.5))
                  .alias("priority")))
    df = apply_frontier_filters(df, cfg)
    return dedup_within_wave(
        df.withColumn("depth", F.lit(1))
          .withColumn("url_hash", url_hash(F.col("url")))
          .withColumn("discovered_wave", F.lit(0)))


def sitemap_revisit(cfg, entries: DataFrame, stored: DataFrame
                    ) -> DataFrame:
    """The sitemap→freshness bridge: a site's <lastmod> is a DECLARED
    change signal, so revisit decisions need no estimator
    (operators/recrawl.py covers hosts that don't publish one).

    entries: expand_sitemaps output. stored: (url, fetched_lastmod) —
    the lastmod recorded when the engine last fetched each URL (null =
    fetched before lastmod tracking, or the site omitted it then).
    Returns frontier rows for exactly the entries that are NEW (no
    stored row) or CHANGED (declared lastmod strictly newer than the
    stored one; entries with an unparseable/absent lastmod on a stored
    URL are trusted unchanged — re-fetching the whole inventory every
    cycle is the failure mode this operator exists to avoid).

    Scale: one hash join on url (|sitemap| × |seen| keyed join, both
    sides already URL-keyed) + the same filter/dedup pipeline as
    sitemap_seed_frontier. Priorities carry the site's declared
    <priority> so politeness admits important stale pages first."""
    from axora_spark.operators.filters import apply_frontier_filters
    from axora_spark.operators.frontier import dedup_within_wave
    from axora_spark.operators.urls import (canonicalize_udf, host_col,
                                            url_hash)
    # a stored row with a null fetched_lastmod must still count as
    # "stored" — the _stored marker distinguishes no-row from null-value
    df = (entries
          .withColumn("url", canonicalize_udf(F.col("loc")))
          .filter(F.col("url") != "")
          .join(stored.select("url",
                              F.col("fetched_lastmod"),
                              F.lit(True).alias("_stored")),
                "url", "left"))
    new = F.col("_stored").isNull()
    changed = (F.to_timestamp("lastmod").isNotNull()
               & F.col("fetched_lastmod").isNotNull()
               & (F.to_timestamp("lastmod")
                  > F.to_timestamp("fetched_lastmod")))
    df = (df.filter(new | changed)
          .withColumn("host", host_col(F.col("url")))
          .select("url", "host",
                  F.coalesce(F.col("priority"), F.lit(0.5))
                  .alias("priority")))
    df = apply_frontier_filters(df, cfg)
    return dedup_within_wave(
        df.withColumn("depth", F.lit(1))
          .withColumn("url_hash", url_hash(F.col("url")))
          .withColumn("discovered_wave", F.lit(0)))
