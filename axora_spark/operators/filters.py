"""Frontier predicates F1–F3 (SURVEY.md §2.2) as native column expressions.

All three stay JVM-side (whole-stage codegen): regexp over the URL (F1),
broadcast `isin` on host (F2), and regexp over the normalized path (F3).
No Python runs in the hot frontier-filter path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from axora_spark.config import CrawlConfig, SKIP_WORDS


def _go_to_java_regex(p: str) -> str:
    """The reference patterns (crawler/crawler.go:68-75) use Go RE2 syntax;
    the subset used ((?:...), [^&]+, \\., ^$) is valid Java regex as-is."""
    return p


def url_allow_filter(url: Column, patterns: tuple[str, ...]) -> Column:
    """F1 — colly URLFilters: URL must match ≥1 pattern
    (reference: crawler/crawler.go:68-75)."""
    cond = F.lit(False)
    for p in patterns:
        cond = cond | url.rlike(_go_to_java_regex(p))
    return cond


def domain_whitelist_filter(host: Column, domains: tuple[str, ...]) -> Column:
    """F2 — colly AllowedDomains: exact host membership
    (reference: crawler/crawler.go:67, domains.yaml:1-3).
    Empty whitelist = allow all (colly semantics)."""
    if not domains:
        return F.lit(True)
    return host.isin(*[d.lower() for d in domains])


# Java regex for the skip alternation. SKIP_WORDS embeds the reference's
# literal-newline quirk ("\nsubscribe") verbatim (crawler/dom_handler.go:40-41);
# paths contain no newline, so that branch never fires — faithfully.
_SKIP_REGEX = "(?i)(" + "|".join(w.replace("\n", "\\n") for w in SKIP_WORDS) + ")"


def skip_norm_path_col(url: Column) -> Column:
    """Normalized path for F3 (reference: crawler/dom_handler.go:49-51):
    lowercase path, `_`/`.` → `-`. Native parse_url + regexp_replace."""
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    return F.regexp_replace(F.lower(path), "[_.]", "-")


def low_value_skip_filter(url: Column) -> Column:
    """F3 — keep-predicate: True when the URL is NOT a low-value path
    (reference: crawler/dom_handler.go:40-54; substring search, any match
    skips). Applied once before fetch — the reference's OnRequest re-check
    (F4, dom_handler.go:31-38) is defense-in-depth against its own queue
    races; a pull-based Spark plan needs it only once (SURVEY.md §2.2 F4)."""
    return ~skip_norm_path_col(url).rlike(_SKIP_REGEX)


def apply_frontier_filters(df: DataFrame, cfg: CrawlConfig,
                           url: str = "url", host: str = "host") -> DataFrame:
    """F1 ∧ F2 ∧ F3 in one pass (single codegen stage, pushed to scan)."""
    return df.filter(
        url_allow_filter(F.col(url), cfg.url_filters)
        & domain_whitelist_filter(F.col(host), cfg.allowed_domains)
        & low_value_skip_filter(F.col(url))
    )
