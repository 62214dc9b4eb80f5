"""Deterministic synthetic fixtures (seed=42, network-free).

1. `link_graph(...)` — a small synthetic web (FIXTURES.md §3) standing in
   for live fetches: ~5 hosts with one deliberately hot host (skew), pages
   with out_links mixing relative/absolute hrefs, skip-pattern paths,
   non-https schemes, off-whitelist domains and duplicates; html meta
   exercising the topic gate; markdown bodies whose word counts straddle
   the quality-score boundaries (200/10000 words, richness 0.25/0.6,
   ≥5 sentences — reference: crawler/text_extraction.go:196-230).

2. `big_frontier(spark, n)` — a Spark-native synthetic frontier generator
   (spark.range → URL strings) for throughput benches; no driver-side data.

All generation is pure-function-of-seed: same inputs → same tables.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axora_spark import schemas
from axora_spark.config import CrawlConfig

HOSTS = (
    "hot.example.org",       # deliberately hot host (skew test)
    "alpha.example.org",
    "beta.example.com",
    "gamma.example.net",
    "delta.example.org",
)
OFF_WHITELIST = "evil.offsite.io"
SKIP_PATHS = ("/contact", "/privacy-policy", "/login", "/tag/economy",
              "/about_us", "/help.html", "/subscribe")
# "/subscribe" is deliberately present: the reference's newline quirk means
# it must NOT be skipped (config.SKIP_WORDS embeds "\nsubscribe").

_VOCAB = (
    "economy market trade growth inflation policy bank rate fiscal supply "
    "demand labor capital export import sector index price wage debt credit "
    "equity bond yield tariff revenue deficit surplus output consumer "
    "producer industry energy housing retail finance currency exchange "
    "global regional quarterly annual forecast analysis report data model "
    "trend cycle recession recovery stimulus investment savings taxation"
).split()


def _words(rng: random.Random, n: int, rich: bool = True) -> str:
    """`n` words. rich=True: every other word gets a unique numeric suffix so
    vocab richness lands in the ideal (0.25, 0.6] band regardless of n;
    rich=False repeats a 6-word set (richness < 0.25)."""
    if not rich:
        return " ".join(rng.choice(_VOCAB[:6]) for _ in range(n))
    out = []
    for j in range(n):
        w = rng.choice(_VOCAB)
        if j % 2 == 0:
            w = f"{w}{rng.randrange(10**6)}"
        out.append(w)
    return " ".join(out)


def _sentences(rng: random.Random, n_sent: int, words_per: int,
               rich: bool = True) -> str:
    return ". ".join(_words(rng, words_per, rich) for _ in range(n_sent)) + "."


def _body_md(rng: random.Random, profile: str, page_id: int) -> str:
    """Markdown body with interleaved headings/paragraphs/images.

    profiles: 'good' (passes F7), 'short' (<200 words → fail), 'poor_vocab'
    (richness <0.25 → fail), 'few_sentences' (<5 → fail), 'long' (>10000
    words → length 0.7, still passes at 0.5*0.7+0.3+0.2 = 85)."""
    img = f"![fig](https://cdn.example.org/img/{page_id}.png)"
    if profile == "short":
        return f"# Brief\n\n{_sentences(rng, 6, 20)}"  # ~120 words
    if profile == "poor_vocab":
        return f"# Flat\n\n{_sentences(rng, 12, 25, rich=False)}"
    if profile == "few_sentences":
        return "# Terse\n\n" + _words(rng, 300) + "\n\n" + img
    if profile == "long":
        paras = "\n\n".join(_sentences(rng, 40, 20) for _ in range(14))
        return f"# Tome\n\n{paras}\n\n{img}"
    # good: ~400 words, 20 sentences, avg 20 w/s, mixed media
    return (f"# Page {page_id}\n\n{_sentences(rng, 8, 20)}\n\n{img}\n\n"
            f"## Detail\n\n{_sentences(rng, 8, 20)}\n\n"
            f"![chart](/img/chart_{page_id}.svg)\n\n{_sentences(rng, 4, 20)}")


_PROFILES = ("good", "good", "good", "short", "poor_vocab",
             "few_sentences", "long")


def link_graph_rows(n_pages: int = 120, seed: int = 42,
                    pages_per_host_hot_factor: int = 6) -> list[dict]:
    """Pure-Python rows (also consumed by the oracle)."""
    rng = random.Random(seed)
    # host assignment: hot host gets `hot_factor` shares
    weights = [pages_per_host_hot_factor] + [1] * (len(HOSTS) - 1)
    all_urls: list[str] = []
    metadata: list[tuple[str, str, int]] = []  # (url, host, page_id)
    for i in range(n_pages):
        host = rng.choices(HOSTS, weights=weights)[0]
        url = f"https://{host}/page/{i}"
        all_urls.append(url)
        metadata.append((url, host, i))

    rows = []
    for url, host, i in metadata:
        rng_i = random.Random(seed * 1_000_003 + i)
        profile = _PROFILES[i % len(_PROFILES)]
        # out-links: same-host relative, cross-host absolute, junk
        n_links = rng_i.randint(3, 10)
        links: list[str] = []
        for _ in range(n_links):
            tgt = rng_i.randrange(n_pages)
            if rng_i.random() < 0.5:
                links.append(f"/page/{tgt}")          # relative (X1)
            else:
                links.append(all_urls[tgt])            # absolute
        if rng_i.random() < 0.5:
            links.append(rng_i.choice(SKIP_PATHS))     # F3 fodder
        if rng_i.random() < 0.3:
            links.append(f"http://{host}/insecure/{i}")   # F1 reject
        if rng_i.random() < 0.3:
            links.append(f"https://{OFF_WHITELIST}/x/{i}")  # F2 reject
        if links:
            links.append(links[0])                     # duplicate (U1)

        relevant = (i % 3 != 0)  # 2/3 of pages pass the topic gate
        title = (f"Economy outlook {i}" if relevant else f"Cooking tips {i}")
        # extra metas feed the P1 metadata projection; their values are
        # topic-NEUTRAL (no 'eco' trigram) so the F5 gate outcome is
        # unchanged vs the 2-meta round-1 fixtures
        metas = [
            {"name": "description", "property": "",
             "content": (f"economic analysis {i}" if relevant
                         else f"pastry recipes {i}")},
            {"name": "", "property": "og:title", "content": title},
            {"name": "author", "property": "", "content": f"Writer {i % 9}"},
            {"name": "", "property": "og:site_name", "content": host},
            {"name": "keywords", "property": "",
             "content": f"fixture, synthetic, k{i % 5}"},
            {"name": "", "property": "article:published_time",
             "content": f"2025-01-{(i % 27) + 1:02d}T12:00:00Z"},
            {"name": "", "property": "og:image",
             "content": f"https://cdn.example.org/img/{i}.png"},
        ]
        rows.append({
            "url": url, "host": host, "title": title, "metas": metas,
            "body_md": _body_md(rng_i, profile, i), "out_links": links,
        })
    return rows


def link_graph(spark: SparkSession, n_pages: int = 120, seed: int = 42
               ) -> DataFrame:
    return spark.createDataFrame(link_graph_rows(n_pages, seed),
                                 schema=schemas.LINK_GRAPH)


# ---------------------------------------------------------------------------
# Raw-HTML fixtures — the engine parses these itself (X3/X4/X5 + P1).
# render_page_html is the EXACT inverse of operators.html.parse_page for the
# constructs the fixtures use (pinned by tests/test_html round-trip), so the
# pure-Python oracle keeps consuming the parsed fields while the engine
# starts from raw HTML.
# ---------------------------------------------------------------------------

def _md_block_to_html(block: str) -> str:
    import re as _re

    from axora_spark.operators.html import escape
    m = _re.fullmatch(r"(#{1,6}) (.*)", block, _re.S)
    if m:
        lvl = len(m.group(1))
        return f"<h{lvl}>{escape(m.group(2))}</h{lvl}>"
    m = _re.fullmatch(r"!\[([^\]]*)\]\(([^)\s]+)\)", block)
    if m:
        return (f'<p><img alt="{escape(m.group(1))}" '
                f'src="{escape(m.group(2))}"/></p>')
    return f"<p>{escape(block)}</p>"


def render_page_html(row: dict) -> str:
    """Fixture page → realistic HTML: head carries title + every meta; ALL
    out-links live in boilerplate nav/footer anchors (the reference's
    OnHTML fires per anchor over the whole DOM — link extraction is NOT
    main-content-scoped, crawler/dom_handler.go:17-29); the article body
    sits in <main>, which the X4 heuristic must pick over the nav/aside
    boilerplate."""
    from axora_spark.operators.html import escape
    head = [f"<title>{escape(row['title'] or '')}</title>"]
    for m in row["metas"] or []:
        attrs = []
        if m.get("name"):
            attrs.append(f'name="{escape(m["name"])}"')
        if m.get("property"):
            attrs.append(f'property="{escape(m["property"])}"')
        attrs.append(f'content="{escape(m.get("content") or "")}"')
        head.append("<meta " + " ".join(attrs) + "/>")
    links = row["out_links"] or []
    nav = "\n".join(f'<a href="{escape(h)}">link {j}</a>'
                    for j, h in enumerate(links[: len(links) // 2 + 1]))
    footer = "\n".join(f'<a href="{escape(h)}">more {j}</a>'
                       for j, h in enumerate(links[len(links) // 2 + 1:]))
    blocks = [b.strip() for b in (row["body_md"] or "").split("\n\n")]
    main = "\n".join(_md_block_to_html(b) for b in blocks if b)
    return f"""<!DOCTYPE html>
<html lang="en">
<head>
{chr(10).join(head)}
</head>
<body>
<header><nav>
{nav}
</nav></header>
<aside><p>Sponsored: unrelated sidebar copy with plenty of words that the
main-content heuristic must not pick.</p></aside>
<main>
{main}
</main>
<footer>
{footer}
<p>© fixture footer boilerplate</p>
</footer>
</body>
</html>"""


def html_graph_rows(n_pages: int = 120, seed: int = 42) -> list[dict]:
    """Raw-HTML corpus rows (url, host, body_html) rendered from the same
    deterministic graph; the parsed-field rows remain the oracle's input."""
    return [{"url": r["url"], "host": r["host"],
             "body_html": render_page_html(r)}
            for r in link_graph_rows(n_pages, seed)]


def html_graph(spark: SparkSession, n_pages: int = 120, seed: int = 42
               ) -> DataFrame:
    return spark.createDataFrame(html_graph_rows(n_pages, seed),
                                 schema=schemas.HTML_GRAPH)


def fixture_seeds(rows: list[dict], per_host: int = 2) -> tuple[str, ...]:
    """First `per_host` pages of every host in the graph."""
    by_host: dict[str, list[str]] = {}
    for r in rows:
        urls = by_host.setdefault(r["host"], [])
        if len(urls) < per_host:
            urls.append(r["url"])
    return tuple(u for urls in by_host.values() for u in urls)


def fixture_config(rows: list[dict] | None = None, **overrides) -> CrawlConfig:
    """Crawl session over the fixture graph (FIXTURES.md §4)."""
    rows = rows if rows is not None else link_graph_rows()
    defaults = dict(
        seeds=fixture_seeds(rows),
        allowed_domains=HOSTS,
        wave_seconds=10.0,   # budget = 3*10/5 = 6/host/wave — forces deferrals
    )
    defaults.update(overrides)
    return CrawlConfig(**defaults)


def fixture_robots() -> dict[str, str]:
    """robots.txt per fixture host (target mode; FIXTURES.md §4):
    hot host gets a crawl-delay (budget override) + a prefix disallow;
    gamma is fully blocked; delta has an Allow override carve-out."""
    return {
        HOSTS[0]: ("User-agent: *\n"
                   "Crawl-delay: 10\n"
                   "Disallow: /page/1\n"),   # prefix: blocks /page/1, /page/1x..
        HOSTS[1]: ("User-agent: googlebot\nDisallow: /\n"
                   "User-agent: *\nDisallow: /private\n"),
        HOSTS[3]: "User-agent: *\nDisallow: /\n",    # fully blocked
        HOSTS[4]: ("User-agent: *\n"
                   "Disallow: /page\n"
                   "Allow: /page/2\n"),      # longest-match carve-out
    }


def big_frontier(spark: SparkSession, n: int, n_hosts: int = 50,
                 hot_share: float = 0.3, seed: int = 42) -> DataFrame:
    """Spark-native synthetic frontier for benches: n URLs over n_hosts with
    `hot_share` of rows on host 0 (skew). Deterministic (hash of id), no
    driver-side materialization."""
    h = F.xxhash64(F.col("id"), F.lit(seed))
    host_idx = F.when((F.pmod(h, F.lit(1000))) < int(hot_share * 1000), F.lit(0)) \
                .otherwise(F.pmod(F.abs(h), F.lit(n_hosts - 1)) + 1)
    url = F.format_string("https://host%d.bench.example/page/%d",
                          host_idx.cast("int"), F.col("id"))
    return (spark.range(n)
            .select(url.alias("url"),
                    F.format_string("host%d.bench.example",
                                    host_idx.cast("int")).alias("host"),
                    F.lit(1).alias("depth"),
                    F.lit(0.0).alias("priority"),
                    F.lit(0).alias("discovered_wave"),
                    F.lit("pending").alias("status"))
            .withColumn("url_hash", F.xxhash64(F.col("url"))))


def declared_latency_col():
    """Deterministic 200-599 ms per-host fetch_ms column (the fixture
    stand-in for fetch_stage's measured transport latency) — single
    definition shared by cli.py --adaptive and
    tools/bench_crawl_e2e.py --governance (code-review r5)."""
    return (F.lit(200) + F.pmod(F.xxhash64("host"), F.lit(400))) \
        .cast("long")
