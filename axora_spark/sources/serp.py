"""S2/W3/U2 — SERP URL collector (reference: crawler/urls_collector.go).

The reference drives a headless browser over a search engine: per page it
evaluates a JS snippet that gathers, inside the engine's result container
(CSS selector), every `a[href]` whose resolved href starts with "https"
and whose anchor text is non-empty, deduped within the page by a JS Set in
DOM order (U2, urls_collector.go:210-236); it then clicks the engine's
next-page button if present, capped at maxPages=50 (W3,
urls_collector.go:63,84); collected URLs stream into the frontier (S1).

Spark-first re-expression — the browser is an injectable TRANSPORT
`(search_url, page) -> (status, html)` (this sandbox is network-free;
tests and the driver query use deterministic fixtures; a deployment swaps
in a real headless-browser pool behind the same callable):

  * pages for ONE query are inherently sequential (each is reached by
    clicking "next" on the previous one), so the wave loop advances page
    k → k+1 for every still-active query at once;
  * parallelism is ACROSS queries — thousands of queries fan out over
    executors inside one mapInPandas stage per wave, which is the axis
    that actually exists at scale (one query never needs a cluster);
  * each wave does ONE parse per (query, page): link extraction and the
    next-page probe come out of the same DOM (the reference also reuses
    the loaded page for both).

The result-container / next-button CSS selectors are honored by a small
selector engine over the crawl parser's mini-DOM (operators/html.py)
supporting the subset the engines need: tag, #id, .class, [attr],
[attr="value"] compounds joined by the descendant combinator.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Iterator
from urllib.parse import quote_plus

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.functions.urlnorm import absolutize
from axora_spark.operators.html import _Node, _walk, parse_dom

SerpTransport = Callable[[str, int], tuple[int, str | None]]


@dataclass(frozen=True)
class SearchEngine:
    """urls_collector.go:14-19 — template + the two CSS selectors."""
    name: str
    url_template: str        # {q} = query-escaped query
    next_page_selector: str
    result_selector: str


# urls_collector.go:33-47; the reference hardcodes engine [1] (Startpage)
ENGINES = {
    "brave": SearchEngine(
        "Brave", "https://search.brave.com/search?q={q}",
        'a.button[role="link"][rel="noopener"]', "#results"),
    "startpage": SearchEngine(
        "Startpage", "https://www.startpage.com/sp/search?q={q}",
        'form[aria-label="go to page Next"] '
        'button[data-testid="pagination-button"]', "section#main"),
}
DEFAULT_ENGINE = "startpage"
MAX_PAGES = 50  # W3 (urls_collector.go:63)


# ---------------------------------------------------------------------------
# CSS selector subset over the mini-DOM
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""([a-zA-Z][\w-]*)?                      # tag
        ((?:[.#][\w-]+|\[[\w-]+(?:="[^"]*")?\])*)$""", re.X)
_PART_RE = re.compile(r'[.#][\w-]+|\[[\w-]+(?:="[^"]*")?\]')


def _parse_compound(compound: str) -> tuple[str | None, list[tuple]]:
    m = _SIMPLE_RE.match(compound)
    if not m or (not m.group(1) and not m.group(2)):
        raise ValueError(f"unsupported selector: {compound!r}")
    tag = m.group(1).lower() if m.group(1) else None
    conds: list[tuple] = []
    for part in _PART_RE.findall(m.group(2) or ""):
        if part.startswith("#"):
            conds.append(("attr_eq", "id", part[1:]))
        elif part.startswith("."):
            conds.append(("class", part[1:]))
        else:  # [attr] or [attr="value"]
            inner = part[1:-1]
            if '="' in inner:
                k, v = inner.split('="', 1)
                conds.append(("attr_eq", k, v[:-1]))
            else:
                conds.append(("attr_has", inner))
    return tag, conds


def _split_compounds(selector: str) -> list[str]:
    """Whitespace split that ignores spaces inside [attr="..."] parts."""
    out, buf, depth = [], [], 0
    for ch in selector:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch.isspace() and depth == 0:
            if buf:
                out.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def parse_selector(selector: str) -> list[tuple[str | None, list[tuple]]]:
    """Descendant-combinator chain of compound selectors (the only
    combinator the engines' selectors use)."""
    return [_parse_compound(c) for c in _split_compounds(selector)]


def _match_compound(node: _Node, compound: tuple) -> bool:
    tag, conds = compound
    if tag is not None and node.tag != tag:
        return False
    for cond in conds:
        if cond[0] == "class":
            if cond[1] not in (node.attrs.get("class", "")).split():
                return False
        elif cond[0] == "attr_eq":
            if node.attrs.get(cond[1]) != cond[2]:
                return False
        else:  # attr_has
            if cond[1] not in node.attrs:
                return False
    return True


def _walk_with_ancestors(root: _Node) -> Iterator[tuple[_Node, list[_Node]]]:
    """(node, ancestor-chain) in DOM pre-order; iterative (deep pages must
    not blow the recursion limit — same policy as operators/html._walk)."""
    chain: list[_Node] = []
    stack: list[Iterator] = [iter(root.children)]
    while stack:
        for c in stack[-1]:
            if isinstance(c, _Node):
                yield c, chain
                chain.append(c)
                stack.append(iter(c.children))
                break
        else:
            stack.pop()
            if chain:
                chain.pop()


def select_all(root: _Node, selector: str) -> list[_Node]:
    """DOM-order matches of a descendant-combinator selector chain."""
    chain_sel = parse_selector(selector)
    last, prefix = chain_sel[-1], chain_sel[:-1]
    out = []
    for node, ancestors in _walk_with_ancestors(root):
        if not _match_compound(node, last):
            continue
        i = 0
        for anc in ancestors:
            if i < len(prefix) and _match_compound(anc, prefix[i]):
                i += 1
        if i == len(prefix):
            out.append(node)
    return out


def select_first(root: _Node, selector: str) -> _Node | None:
    hits = select_all(root, selector)
    return hits[0] if hits else None


# ---------------------------------------------------------------------------
# pure-Python page core (shared by the Spark stage, tests and the oracle)
# ---------------------------------------------------------------------------

def search_url(engine: SearchEngine, query: str) -> str:
    """urls_collector.go:79 — template % url.QueryEscape(query)
    (QueryEscape encodes space as '+', matching quote_plus)."""
    return engine.url_template.format(q=quote_plus(query))


def _text_len(node: _Node) -> int:
    n = 0
    stack: list[Iterator] = [iter(node.children)]
    while stack:
        for c in stack[-1]:
            if isinstance(c, str):
                n += len(c.strip())
            else:
                stack.append(iter(c.children))
                break
        else:
            stack.pop()
    return n


def extract_serp_page(html: str, engine: SearchEngine,
                      page_url: str) -> tuple[list[str], bool]:
    """(unique https result URLs in DOM order, next-page-button present).

    Mirrors the evaluated JS (urls_collector.go:210-236): anchors inside
    the result container (whole document if the container is missing),
    href resolved against the page URL (the browser's `link.href` is
    absolute), kept iff it starts with 'https' and the anchor text is
    non-empty after trim; U2 dedup = JS Set insertion order. The next
    probe is the chromedp node query on the engine's button selector
    (urls_collector.go:246-251)."""
    root = parse_dom(html)
    container = select_first(root, engine.result_selector) or root
    seen: dict[str, None] = {}
    for n in _walk(container):
        if n.tag != "a" or "href" not in n.attrs:
            continue
        href = absolutize(page_url, n.attrs["href"])
        if href.startswith("https") and _text_len(n) > 0:
            seen.setdefault(href)
    has_next = select_first(root, engine.next_page_selector) is not None
    return list(seen), has_next


# ---------------------------------------------------------------------------
# the Spark stage
# ---------------------------------------------------------------------------

_SERP_WAVE = T.StructType([
    T.StructField("query", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("urls", T.ArrayType(T.StringType()), True),
    T.StructField("has_next", T.BooleanType(), False),
])

SERP_RESULT = T.StructType([
    T.StructField("query", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("pos", T.IntegerType(), False),
    T.StructField("url", T.StringType(), False),
])


def collect_serp(spark: SparkSession, queries: list[str] | DataFrame,
                 transport: SerpTransport,
                 engine: str | SearchEngine = DEFAULT_ENGINE,
                 max_pages: int = MAX_PAGES,
                 queries_per_task: int = 64) -> DataFrame:
    """S2 — (query, page, pos, url) result rows for every query.

    Wave loop over page numbers (pages are click-sequential per query —
    the irreducible serial axis), one mapInPandas fetch+parse per wave
    fanned out ACROSS queries. Each wave is eagerly localCheckpoint-ed:
    the loop-control count and the final union read the materialized
    wave, so no page is ever fetched twice (a re-fetch is not just waste —
    live SERPs are not idempotent). A query leaves the loop when its page
    lacks the next button, errors, or hits the W3 cap (max_pages).

    At 10^6 queries × ≤50 pages this is ≤50 narrow batch stages of
    ~n_queries rows each — no shuffle anywhere (the explode is per-row);
    the output feeds seed_frontier exactly like a seed list (S1).

    The query frame is partitioned to ceil(n_queries / queries_per_task)
    — sized to the DATA, not to defaultParallelism. This matters beyond
    scheduling: every (mostly-empty) partition of a pandas-UDF stage
    forks a Python worker, and a 16-query frame spread over 32 default
    partitions across a few wave stages left ~70 idle workers resident,
    measurably degrading every subsequent stage in the session (wave
    bench 3.9s → 63s until the pool drained). Partition count follows the
    active query set, so worker fan-out always matches real work."""
    import math

    eng = ENGINES[engine] if isinstance(engine, str) else engine

    if isinstance(queries, DataFrame):
        qdf = queries.select("query").dropDuplicates(["query"])
        n_q = qdf.count()
    else:
        uniq = list(dict.fromkeys(queries))
        qdf = spark.createDataFrame([(q,) for q in uniq], "query string")
        n_q = len(uniq)
    qdf = qdf.repartition(max(1, math.ceil(n_q / queries_per_task)))

    def _make_fetch(page: int):
        def _fetch(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                urls_out, has_next_out = [], []
                for q in pdf["query"]:
                    su = search_url(eng, q)
                    status, html = transport(su, page)
                    if status != 200 or not html:
                        # navigation failure aborts this query's loop
                        # (CollectUrls returns the error; collected pages
                        # stand — urls_collector.go:92-108)
                        urls_out.append(None)
                        has_next_out.append(False)
                        continue
                    urls, has_next = extract_serp_page(html, eng, su)
                    urls_out.append(urls)
                    has_next_out.append(has_next)
                yield pd.DataFrame({
                    "query": pdf["query"], "page": page,
                    "urls": urls_out, "has_next": has_next_out})
        return _fetch

    waves: list[DataFrame] = []
    active = qdf
    page = 1
    while page <= max_pages:
        fetched = (active.select("query")
                   .mapInPandas(_make_fetch(page), schema=_SERP_WAVE)
                   .localCheckpoint(eager=True))
        waves.append(fetched)
        if page == max_pages:
            break  # W3: cap reached, don't probe further
        active = fetched.filter(F.col("has_next")).select("query")
        # re-size to the SURVIVING query count: filter inherits the
        # original partitioning, so by late pages a handful of live
        # queries would otherwise fan out over the page-1 partition
        # count — the exact idle-python-worker pathology the initial
        # sizing avoids (code-review r3). count() reads the
        # already-checkpointed wave, so it costs no re-fetch.
        n_active = active.count()
        if n_active == 0:
            break
        active = active.repartition(
            max(1, math.ceil(n_active / queries_per_task)))
        page += 1

    from functools import reduce
    all_waves = reduce(lambda a, b: a.unionByName(b), waves)
    return (all_waves
            .select("query", "page",
                    F.posexplode_outer("urls").alias("pos", "url"))
            .filter(F.col("url").isNotNull()))


def serp_seed_frontier(results: DataFrame) -> DataFrame:
    """S2 → S1 adapter: collected URLs in first-seen order per query
    become a seed list shape (url column; global U1 dedup happens in
    seed_frontier/dedup_within_wave downstream)."""
    return results.select("url").dropDuplicates(["url"])
