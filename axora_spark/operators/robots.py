"""Robots.txt gating + crawl-delay (north_rule target mode).

The reference IGNORES robots (`c.IgnoreRobotsTxt = true`,
crawler/crawler.go:96); the north_rule asks for robots support, so this is
a configurable operator (SURVEY.md §7.3 item 6): reference-compat mode
disables it; target mode enables it, and a per-host crawl-delay overrides
the politeness budget (W1) for that host.

Design: robots rules are a PER-HOST table (tiny: one row per host —
thousands at web scale vs 10^10 URLs), parsed once, broadcast, applied as
a vectorized prefix filter. Longest-match rule wins (Google/RFC 9309
semantics, simplified: only User-agent: * groups, Allow/Disallow by
longest path prefix, '*' not supported — documented).

Pure-Python core shared with the oracle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.functions import urlnorm


@dataclass
class HostRules:
    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay: float | None = None


def parse_robots(text: str) -> HostRules:
    """Parse the User-agent:* group(s) of a robots.txt body."""
    rules = HostRules()
    applies = False
    saw_ua = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_ua and applies and val != "*":
                applies = False
            if val == "*":
                applies = True
            saw_ua = True
        elif applies and key == "disallow":
            if val:
                rules.disallows.append(val)
        elif applies and key == "allow":
            if val:
                rules.allows.append(val)
        elif applies and key == "crawl-delay":
            try:
                rules.crawl_delay = float(val)
            except ValueError:
                pass
    return rules


def is_allowed(rules: HostRules | None, path: str) -> bool:
    """Longest-prefix-match decision; no rules → allowed; tie → allow."""
    if rules is None:
        return True
    if not path:
        path = "/"
    best_allow = max((len(p) for p in rules.allows if path.startswith(p)),
                     default=-1)
    best_disallow = max((len(p) for p in rules.disallows if path.startswith(p)),
                        default=-1)
    return best_allow >= best_disallow


def host_budget_with_robots(base_budget: int, wave_seconds: float,
                            parallelism: int,
                            crawl_delay: float | None) -> int:
    """W1 budget override: robots crawl-delay replaces the politeness delay
    for its host (budget = parallelism * wave_seconds / delay)."""
    if crawl_delay is None or crawl_delay <= 0:
        return base_budget
    return max(1, int(parallelism * wave_seconds / crawl_delay))


def robots_filter(df: DataFrame, rules_by_host: dict[str, HostRules],
                  url_col: str = "url", host_col: str = "host") -> DataFrame:
    """Drop rows disallowed by their host's robots rules. Broadcast the
    (tiny) rules dict; vectorized check over the Arrow batch."""
    if not rules_by_host:
        return df
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {h: (tuple(r.allows), tuple(r.disallows))
         for h, r in rules_by_host.items()})

    @F.pandas_udf(T.BooleanType())
    def allowed(url: pd.Series, host: pd.Series) -> pd.Series:
        table = bc.value
        out = []
        for u, h in zip(url, host):
            entry = table.get(h or "")
            if entry is None:
                out.append(True)
                continue
            r = HostRules(allows=list(entry[0]), disallows=list(entry[1]))
            out.append(is_allowed(r, urlnorm.path_of(u or "")))
        return pd.Series(out, index=url.index)

    return df.filter(allowed(F.col(url_col), F.col(host_col)))
