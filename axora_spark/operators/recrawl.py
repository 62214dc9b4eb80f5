"""Freshness-driven recrawl scheduling: estimate each URL's change rate
from the crawl's own observation history and rank revisits by expected
staleness.

The reference crawls each URL exactly once (colly's visited set,
`crawler/crawler.go:77` — URLFilters + the seen check admit a URL a
single time per session). A long-running engine at web scale needs the
complementary operator: given repeated observations of the same URL
across waves, WHICH urls are worth re-fetching next? This is the
Cho & Garcia-Molina freshness model (``Effective Page Refresh Policies
for Web Crawlers``, ACM TODS 2003): page changes are Poisson with
per-page rate λ, the estimator below is their bias-corrected MLE from
binary change observations at regular revisit intervals, and expected
staleness at age *a* is ``1 − e^{−λa}`` — the probability the live page
differs from our stored copy.

Scale shape: the change-flag window and the per-URL aggregate share the
same hash partitioning on ``url`` — Catalyst plans ONE Exchange for
both (gated in tests/test_plan_shapes.py). Observation rows per URL are
bounded by the revisit count (handfuls), and ``url`` is the
highest-cardinality key in a crawl, so partitions stay balanced at any
corpus size; the output is one row per URL, the same cardinality the
``seen`` table already carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def change_observations(obs: DataFrame, url_col: str = "url",
                        wave_col: str = "wave",
                        hash_col: str = "content_hash") -> DataFrame:
    """Per-URL change statistics from an observation log of
    (url, wave, content_hash) rows — one row per fetch of that URL.

    Output: one row per URL with ``n_obs``, ``n_changes`` (intervals
    whose content hash differs from the previous observation),
    ``first_wave``, ``last_wave``.
    """
    w = Window.partitionBy(url_col).orderBy(wave_col)
    flagged = obs.withColumn("_prev", F.lag(hash_col).over(w))
    changed = (F.col("_prev").isNotNull()
               & (F.col("_prev") != F.col(hash_col))).cast("long")
    return (flagged
            .groupBy(url_col)
            .agg(F.count("*").alias("n_obs"),
                 F.sum(changed).alias("n_changes"),
                 F.min(wave_col).alias("first_wave"),
                 F.max(wave_col).alias("last_wave")))


def _lambda_hat(n_int: Column, n_chg: Column, interval: Column) -> Column:
    """Cho & Garcia-Molina 2003 (§4, eq. for the bias-reduced estimator):
    λ̂ = −ln((n − X + 0.5) / (n + 0.5)) / I̅  for n observation intervals,
    X changed, mean interval I̅. The +0.5 regularizer keeps the log finite
    when every interval changed (X = n)."""
    return (-F.log((n_int - n_chg + F.lit(0.5)) / (n_int + F.lit(0.5)))
            / interval)


def estimate_change_rate(obs: DataFrame, now_wave: int,
                         url_col: str = "url", wave_col: str = "wave",
                         hash_col: str = "content_hash") -> DataFrame:
    """Per-URL change rate λ̂ (changes per wave) and expected staleness
    at ``now_wave``. URLs seen only once get a null rate and staleness
    1.0 — never-revisited pages are maximally uncertain, which puts them
    at the front of the revisit queue exactly once.

    Staleness is the revisit priority: feed it to the politeness
    scheduler via the ``priority`` column (see :func:`revisit_frontier`).
    """
    per = change_observations(obs, url_col, wave_col, hash_col)
    n_int = F.col("n_obs") - F.lit(1)
    interval = (F.col("last_wave") - F.col("first_wave")) / n_int
    lam = F.when(n_int > 0, _lambda_hat(n_int, F.col("n_changes"),
                                        interval))
    age = F.lit(now_wave) - F.col("last_wave")
    staleness = F.when(n_int > 0,
                       F.lit(1.0) - F.exp(-lam * age)).otherwise(F.lit(1.0))
    return per.select(url_col, "n_obs", "n_changes",
                      lam.alias("change_rate"),
                      staleness.alias("staleness"))


def revisit_frontier(rates: DataFrame, min_staleness: float = 0.5,
                     url_col: str = "url") -> DataFrame:
    """Turn change-rate estimates into frontier rows the politeness
    scheduler (W1) admits by ``priority`` — the link between the
    freshness model and the wave loop. Stateless filter + projection:
    no shuffle beyond what estimate_change_rate already paid."""
    from axora_spark.operators.urls import host_col, url_hash
    return (rates
            .filter(F.col("staleness") >= F.lit(min_staleness))
            .select(F.col(url_col).alias("url"),
                    host_col(F.col(url_col)).alias("host"),
                    F.lit(1).alias("depth"),
                    url_hash(F.col(url_col)).alias("url_hash"),
                    F.col("staleness").alias("priority")))
