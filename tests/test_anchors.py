"""Anchor-text extraction (html.extract_links_text) and per-target
aggregation (operators/anchors.py)."""

from __future__ import annotations

from axora_spark.operators.anchors import aggregate_anchor_text
from axora_spark.operators.html import extract_links_text, parse_dom


def test_extract_links_text_truth_table():
    html = ('<html><body>'
            '<a href="/a">plain</a>'
            '<a href="/b"><b>bold</b> and <i>nested</i></a>'
            '<a href="/c">  spaced\n  out  </a>'
            '<a no-href="1">skipped</a>'
            '<a href="/a">plain</a>'  # duplicate anchors preserved
            '</body></html>')
    got = extract_links_text(parse_dom(html))
    assert got == [
        {"href": "/a", "text": "plain"},
        {"href": "/b", "text": "bold and nested"},
        {"href": "/c", "text": "spaced out"},
        {"href": "/a", "text": "plain"},
    ]


def test_aggregate_anchor_text(spark):
    rows = (
        # target T1: 3 links, 2 hosts, phrases: "home" ×2, "start" ×1
        [("h1", "https://t/1", "home"), ("h2", "https://t/1", "home"),
         ("h1", "https://t/1", "start")]
        # target T2: 5 distinct phrases, top_k=2 must keep the two most
        # frequent (count desc, text asc tie-break)
        + [("h1", "https://t/2", p) for p in
           ["bb", "bb", "aa", "aa", "cc", "dd", "ee"]]
    )
    links = spark.createDataFrame(rows,
                                  "src_host string, target string, "
                                  "text string")
    got = {r["url"]: r for r in
           aggregate_anchor_text(links, top_k=2).collect()}
    t1 = got["https://t/1"]
    assert t1["in_links"] == 3 and t1["n_src_hosts"] == 2
    assert t1["anchors"] == ["home", "start"]
    t2 = got["https://t/2"]
    assert t2["in_links"] == 7 and t2["n_src_hosts"] == 1
    # aa and bb tie at 2; cc/dd/ee (count 1) are cut by top_k=2
    assert t2["anchors"] == ["aa", "bb"]


def test_anchor_plan_windowgrouplimit(spark):
    # the top-k phrase window must prune per-partition BEFORE the
    # exchange (literal k → WindowGroupLimit) — the mega-target guard
    from axora_spark.queries import q_anchor_text
    plan = (q_anchor_text(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    final = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in final
