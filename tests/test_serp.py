"""S2/W3/U2 — SERP collector (crawler/urls_collector.go): selector-scoped
extraction with the evaluated-JS filters (https prefix, non-empty anchor
text, in-page Set dedup in DOM order), click-sequential pagination capped
at max_pages, navigation errors ending one query's loop while collected
pages stand."""

from __future__ import annotations

import pytest

from axora_spark.operators.html import parse_dom
from axora_spark.sources import serp


# ---------------------------------------------------------------------------
# selector engine
# ---------------------------------------------------------------------------

DOC = """
<html><body>
  <section id="main" class="wrap big">
    <a class="button primary" role="link" rel="noopener" href="/x">next</a>
    <form aria-label="go to page Next">
      <button data-testid="pagination-button">Next</button>
    </form>
  </section>
  <div id="results"><a href="/r">r</a></div>
  <button data-testid="pagination-button">orphan</button>
</body></html>
"""


def test_selector_compounds():
    root = parse_dom(DOC)
    assert serp.select_first(root, "#results").tag == "div"
    assert serp.select_first(root, "section#main").tag == "section"
    assert serp.select_first(root, "section.wrap").attrs["id"] == "main"
    a = serp.select_first(root, 'a.button[role="link"][rel="noopener"]')
    assert a is not None and a.attrs["href"] == "/x"
    assert serp.select_first(root, 'a.missing[role="link"]') is None
    assert serp.select_first(root, "[data-testid]").tag == "button"


def test_selector_descendant_chain():
    root = parse_dom(DOC)
    hits = serp.select_all(
        root, 'form[aria-label="go to page Next"] '
              'button[data-testid="pagination-button"]')
    # the orphan button outside the form must NOT match
    assert len(hits) == 1
    chain_hits = serp.select_all(root, "section#main a")
    assert [h.attrs["href"] for h in chain_hits] == ["/x"]


def test_selector_rejects_unsupported():
    with pytest.raises(ValueError):
        serp.parse_selector("a > b")  # child combinator unsupported


# ---------------------------------------------------------------------------
# page extraction semantics (the evaluated JS, urls_collector.go:210-236)
# ---------------------------------------------------------------------------

ENG = serp.ENGINES["startpage"]
PAGE_URL = serp.search_url(ENG, "spark engine")


def test_search_url_query_escape():
    # Go url.QueryEscape: space → '+'
    assert PAGE_URL == "https://www.startpage.com/sp/search?q=spark+engine"


def test_extract_filters_and_dedup():
    html = """
    <html><body>
      <section id="main">
        <a href="https://a.example.com/1">one</a>
        <a href="http://insecure.example.com/">plain http</a>
        <a href="https://a.example.com/1">one again (dup)</a>
        <a href="https://empty.example.com/"> \t </a>
        <a href="/relative">rel resolves to https</a>
        <a href="https://b.example.com/2"><b>bold text</b></a>
        <a name="anchor-without-href">skip</a>
      </section>
      <a href="https://outside.example.com/">outside container</a>
    </body></html>
    """
    urls, has_next = serp.extract_serp_page(html, ENG, PAGE_URL)
    # DOM order, deduped, https-only, non-empty text; relative href
    # resolves against the (https) page URL exactly like link.href
    assert urls == [
        "https://a.example.com/1",
        "https://www.startpage.com/relative",
        "https://b.example.com/2",
    ]
    assert has_next is False


def test_container_fallback_whole_document():
    # no result container → the JS falls back to document-wide anchors
    html = '<html><body><a href="https://x.example.com/">x</a></body></html>'
    urls, _ = serp.extract_serp_page(html, ENG, PAGE_URL)
    assert urls == ["https://x.example.com/"]


def test_next_button_detection_both_engines():
    nxt = ('<form aria-label="go to page Next">'
           '<button data-testid="pagination-button">Next</button></form>')
    html = f'<html><body><section id="main"></section>{nxt}</body></html>'
    assert serp.extract_serp_page(html, ENG, PAGE_URL)[1] is True
    brave = serp.ENGINES["brave"]
    bhtml = ('<html><body><div id="results"></div>'
             '<a class="button" role="link" rel="noopener" href="/n">→</a>'
             '</body></html>')
    assert serp.extract_serp_page(bhtml, brave,
                                  serp.search_url(brave, "q"))[1] is True
    # orphan button outside the form: Startpage sees no next
    orphan = ('<html><body><section id="main"></section>'
              '<button data-testid="pagination-button">N</button>'
              '</body></html>')
    assert serp.extract_serp_page(orphan, ENG, PAGE_URL)[1] is False


# ---------------------------------------------------------------------------
# the Spark wave loop
# ---------------------------------------------------------------------------

def _fixture_transport(pages_per_query: dict[str, int], fail=frozenset()):
    """(search_url, page) → deterministic SERP; queries recover from the
    search_url by inverting the template. Fully self-contained closure —
    cloudpickle must ship it by VALUE (executors can't import tests/)."""
    def tp(su: str, page: int):
        q = su.rsplit("q=", 1)[1]
        if (q, page) in fail:
            return 503, None
        total = pages_per_query[q]
        n = 3 if page <= total else 0
        links = "".join(
            f'<a href="https://site.example.com/{q}/{page}/r{j}">t{j}</a>'
            f'<a href="https://site.example.com/{q}/{page}/r{j}">dup</a>'
            for j in range(n))
        nxt = ('<form aria-label="go to page Next">'
               '<button data-testid="pagination-button">Next</button></form>'
               if page < total else "")
        return 200, (f'<html><body><section id="main">{links}</section>'
                     f'{nxt}</body></html>')
    return tp


def test_collect_serp_pagination_and_dedup(spark):
    tp = _fixture_transport({"alpha": 3, "beta": 1})
    got = serp.collect_serp(spark, ["alpha", "beta", "alpha"], tp,
                            max_pages=50)
    rows = {(r.query, r.page, r.pos, r.url) for r in got.collect()}
    want = {(q, p, j, f"https://site.example.com/{q}/{p}/r{j}")
            for q, total in (("alpha", 3), ("beta", 1))
            for p in range(1, total + 1) for j in range(3)}
    assert rows == want  # U2: in-page dups collapsed, pos = DOM-set order


def test_collect_serp_w3_cap(spark):
    # endless next buttons: the W3 cap stops the loop at max_pages
    tp = _fixture_transport({"q": 10**9})
    got = serp.collect_serp(spark, ["q"], tp, max_pages=4)
    assert sorted({r.page for r in got.collect()}) == [1, 2, 3, 4]


def test_collect_serp_error_aborts_one_query(spark):
    # beta's page 2 dies: its page-1 urls stand, alpha runs to completion
    tp = _fixture_transport({"alpha": 3, "beta": 3},
                            fail=frozenset({("beta", 2)}))
    got = serp.collect_serp(spark, ["alpha", "beta"], tp)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query, set()).add(r.page)
    assert by_q["alpha"] == {1, 2, 3}
    assert by_q["beta"] == {1}


def test_serp_seed_frontier_shape(spark):
    tp = _fixture_transport({"a": 1, "b": 1})
    seeds = serp.serp_seed_frontier(
        serp.collect_serp(spark, ["a", "b"], tp))
    assert seeds.columns == ["url"]
    assert seeds.count() == 6
