"""Deterministic synthetic inputs shared between the Spark-native query
side (queries.q_url_canonicalize / q_chunk_markdown) and the pure-Python
fixture-oracle generator (tools/make_fixtures.py).

These exist because two operator families are not DuckDB-expressible
(RFC 3986 URL resolution; the heading-hierarchy markdown splitter), so
their driver oracles are FIXTURE tables computed by the engine's own
pure-Python cores over inputs derived ONLY from doc_id. The Python
generators here are the single source of truth; the Spark side mirrors
them natively (concat/when over doc_id) and
tests/test_fixture_oracles.py pins the two byte-equal.
"""

from __future__ import annotations

# --- X1/X2 url canonicalization cases ---
# len(URL_BASES)=4 and len(URL_HREFS)=7 are coprime → doc_ids sweep all
# 28 combinations: ../ traversal, rooted path with fragment + unsorted
# query, relative leaf, absolute href with mixed-case host and
# non-default-for-scheme port, scheme-relative, query-only, fragment
# suffix.

URL_BASES = (
    "https://example.org/a/b/page.html",
    "https://EXAMPLE.org:443/dir/sub/",
    "http://news.example.net:8080/x/y?b=2&a=1",
    "https://example.org",
)

URL_HREFS = (
    "../up/one.html",
    "/rooted/Path_Mixed.html?z=9&a=1#frag",
    "relative/leaf",
    "https://Other.Example.COM:80/abs?q=",
    "//cdn.example.org/Asset_v1.2.js",
    "?only=query#f",
    "page2.html#Section",
)


def url_case_inputs_py(doc_id: int) -> tuple[str, str]:
    return URL_BASES[doc_id % 4], URL_HREFS[doc_id % 7]


# --- C2 markdown-chunker docs ---

MD_FILLER = ("lorem word " * 60).strip()  # 659 chars > CHUNK_SIZE=512


def md_doc_py(doc_id: int) -> str:
    """Deterministic markdown per doc_id. Covers: heading-path
    replacement at the same level, deeper nesting (###), a section
    longer than CHUNK_SIZE (recurses into the character splitter with
    the heading prefix re-attached), and docs with/without each section
    (doc_id % 2 / % 3 / % 4) so chunk counts vary."""
    i = doc_id
    parts = [f"# Guide {i}", "",
             f"Intro paragraph for document {i} covering the basics."]
    if i % 2 == 0:
        parts += ["", "## Setup", "",
                  f"Install step {i % 7} then configure option {i % 5}."]
    if i % 3 == 0:
        parts += ["", "### Details", "", "Deep dive line one.",
                  f"Deep dive line two with id {i}."]
    parts += ["", "## Usage", "",
              f"Run the tool with flag --n={i % 9} and observe."]
    if i % 4 == 1:
        parts += ["", "## Appendix", "", f"{MD_FILLER} tail{i}"]
    return "\n".join(parts)
