"""URL canonicalization + helpers — the single source of truth.

Pure Python, shared by the Spark pandas UDF (axora_spark.operators.urls)
and the deterministic oracle (axora_spark.oracle), so engine and oracle
agree byte-for-byte on canonical forms, hosts, and skip normalization.

Reference behaviors covered:
  - colly normalizes URLs via its whatwg-url dep (reference: go.mod:55);
    we define OUR canonical form explicitly (SURVEY.md §2.7 X2):
    lowercase scheme+host, strip fragment, drop default port, empty path
    → '/', sort query parameters, drop empty query.
  - absolutization `e.Request.AbsoluteURL(href)` (reference:
    crawler/dom_handler.go:19-21) → urljoin.
  - skip-path normalization: lowercase path, `_`/`.` → `-` (reference:
    crawler/dom_handler.go:43-54).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str) -> str:
    """Deterministic canonical form. Returns '' for unparseable input."""
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if not scheme or not host:
        return ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = parts.query
    if query:
        # sort key=value pairs textually; keep duplicates; drop empties
        pairs = [p for p in query.split("&") if p]
        query = "&".join(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    try:
        return urlsplit(url).path
    except ValueError:
        return ""


def absolutize(base_url: str, href: str) -> str:
    """Resolve href against page URL (reference: dom_handler.go:19-21)."""
    if not href:
        return ""
    try:
        return urljoin(base_url, href)
    except ValueError:
        return ""


def skip_norm_path(url: str) -> str:
    """Path normalized for the low-value skip filter (dom_handler.go:49-51):
    lowercase, then `_` → `-` and `.` → `-`."""
    p = path_of(url).lower()
    return p.replace("_", "-").replace(".", "-")


def matches_any(patterns: list[str], url: str) -> bool:
    """colly URLFilters semantics: pass if ANY pattern matches
    (reference: crawler/crawler.go:68-75). Go regexp MatchString is an
    unanchored search; the reference patterns self-anchor with ^...$."""
    return any(re.search(p, url) is not None for p in patterns)
