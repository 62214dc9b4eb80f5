"""X3/X4/X5 upstream + P1 — the raw-HTML stage.

The reference's per-page pipeline starts from raw HTML bytes:

  * X3 link extraction — goquery `OnHTML("a[href]")` fires once per anchor
    in DOM order over the WHOLE document (crawler/dom_handler.go:17-29;
    debug variant :201-223 collects (href, text) pairs).
  * F5 meta gate input — `<title>` text plus every `<meta>`'s
    (name, property, content) triple (crawler/dom_handler.go:179-199).
  * X4 main-content extraction — trafilatura
    (crawler/text_extraction.go:43-103) picks the main article subtree and
    projects rich metadata (ContentMetadata, text_extraction.go:24-41).
  * X5 HTML→Markdown — htmltomarkdown.ConvertString over the extracted
    content node (crawler/text_extraction.go:186-190).

This module re-expresses the stage Spark-first and self-contained (the
sandbox has no trafilatura/lxml): a single stdlib-`html.parser` pass builds
a tiny DOM, then pure-Python walkers derive links / title+metas / main
content / markdown. The Spark surface is ONE `mapInPandas` stage
(`parse_fetched_html`) so a page's HTML is parsed exactly once per row and
all derived columns come out of that one parse — no UDF re-evaluation, no
shuffle (narrow stage, scales with input partitions).

Main-content heuristic (documented stand-in for trafilatura, X4):
  1. boilerplate subtrees are dropped: script/style/noscript/template/
     nav/header/footer/aside/form;
  2. candidates = `<article>`, `<main>`, any node with role="main", plus
     `<section>`/`<div>` elements;
  3. score(candidate) = len(text outside <a>) − len(text inside <a>)
     over its remaining subtree (link-density penalty, the readability
     family's core signal);
  4. highest score wins, first-in-document-order breaks ties; fall back to
     <body> (boilerplate still dropped).
Divergences from trafilatura are pinned by fixtures (SEMANTICS.md).
"""

from __future__ import annotations

import hashlib
import html as _html_mod
import re
from datetime import datetime, timezone
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from axora_spark.schemas import FETCHED, METADATA

# ---------------------------------------------------------------------------
# Mini-DOM
# ---------------------------------------------------------------------------

_VOID = frozenset({"area", "base", "br", "col", "embed", "hr", "img",
                   "input", "link", "meta", "param", "source", "track",
                   "wbr"})
# elements whose end tag is optional and that never nest into themselves;
# auto-close an open one when a sibling starts (html.parser is not a full
# tree builder — this covers real-world soup well enough for crawling)
_AUTOCLOSE = frozenset({"p", "li", "option", "tr", "td", "th", "dt", "dd"})

_BOILERPLATE = frozenset({"script", "style", "noscript", "template", "nav",
                          "header", "footer", "aside", "form"})


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in _AUTOCLOSE and self._stack[-1].tag == tag:
            self._stack.pop()
        node = _Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched end tag: ignore (lenient, like browser parsers)

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_dom(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


def _walk(node: _Node, skip: frozenset = frozenset()) -> Iterator[_Node]:
    """Depth-first pre-order element walk, pruning `skip` subtrees.

    ITERATIVE (explicit stack): real-web pages can nest thousands of
    elements deep and a recursive walk would raise RecursionError inside
    the parse stage (the reference's Go parser is iterative and tolerates
    this; ADVICE r2 #1)."""
    stack: list[Iterator] = [iter(node.children)]
    while stack:
        for c in stack[-1]:
            if isinstance(c, _Node) and c.tag not in skip:
                yield c
                stack.append(iter(c.children))
                break
        else:
            stack.pop()


# ---------------------------------------------------------------------------
# X3 — links; F5 input — title + metas; misc lookups
# ---------------------------------------------------------------------------

def extract_links(root: _Node) -> list[str]:
    """Every a[href] in DOM order, href verbatim (absolutization is the
    downstream X1 operator, exactly as in the reference where OnHTML
    receives the raw attribute). Duplicates preserved — colly fires the
    callback once per anchor; dedup is the seen-check's job."""
    out = []
    for n in _walk(root):
        if n.tag == "a" and "href" in n.attrs:
            out.append(n.attrs["href"])
    return out


def extract_links_text(root: _Node) -> list[dict]:
    """Every a[href] in DOM order WITH its anchor text (whitespace-
    collapsed subtree text) — the per-link signal the X3 href walk
    drops. The reference's colly OnHTML("a[href]") callback receives
    the element and could read e.Text the same way
    (crawler/dom_handler.go's link callback uses only the attribute);
    anchor text is what a web-scale indexer aggregates per TARGET
    (operators/anchors.py)."""
    out = []
    for n in _walk(root):
        if n.tag == "a" and "href" in n.attrs:
            out.append({"href": n.attrs["href"],
                        "text": " ".join(_text_of(n).split())})
    return out


def extract_title(root: _Node) -> str:
    for n in _walk(root):
        if n.tag == "title":
            return _text_of(n).strip()
    return ""


def extract_metas(root: _Node) -> list[dict]:
    """All <meta> (name, property, content) triples in DOM order —
    the F5 gate consumes title+name+property+content concatenations
    (dom_handler.go:185-196)."""
    out = []
    for n in _walk(root):
        if n.tag == "meta":
            out.append({"name": n.attrs.get("name", ""),
                        "property": n.attrs.get("property", ""),
                        "content": n.attrs.get("content", "")})
    return out


def _text_of(node: _Node, skip: frozenset = frozenset()) -> str:
    """Concatenated text of a subtree — iterative for the same
    deep-nesting reason as _walk."""
    parts: list[str] = []
    stack: list[Iterator] = [iter(node.children)]
    while stack:
        for c in stack[-1]:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in skip:
                stack.append(iter(c.children))
                break
        else:
            stack.pop()
    return "".join(parts)


def _html_lang(root: _Node) -> str:
    for n in _walk(root):
        if n.tag == "html":
            return n.attrs.get("lang", "")
    return ""


# ---------------------------------------------------------------------------
# X4 — main-content selection (readability-style, documented above)
# ---------------------------------------------------------------------------

def _subtree_text_lens(root: _Node) -> dict[int, tuple[int, int]]:
    """ONE iterative post-order pass computing, for every element node,
    (chars outside <a>, chars inside <a>) over its subtree with
    _BOILERPLATE pruned. Replaces the per-candidate _text_of rescans that
    made extract_main O(depth²) — a 10k-deep div chain (10k candidates ×
    10k-node text walks = 10^8 visits) would stall the parse task rather
    than fail it. Lengths count NON-WHITESPACE characters: the count is
    additive bottom-up (collapsed lengths aren't), a whitespace-only
    wrapper scores exactly 0 (so it can never beat the body fallback —
    raw lengths let indentation text nodes promote empty wrappers), and
    markup indentation can't inflate a nav-heavy div's own-text score
    relative to its link text."""
    lens: dict[int, tuple[int, int]] = {}
    # frame: (node, child-iterator, [own_chars, link_chars], in_link)
    stack = [(root, iter(root.children), [0, 0], False)]
    while stack:
        node, it, acc, in_link = stack[-1]
        descended = False
        for c in it:
            if isinstance(c, str):
                acc[1 if in_link else 0] += len(_WS_RE.sub("", c))
            elif c.tag not in _BOILERPLATE:
                stack.append((c, iter(c.children), [0, 0],
                              in_link or c.tag == "a"))
                descended = True
                break
        if not descended:
            stack.pop()
            lens[id(node)] = (acc[0], acc[1])
            if stack:
                pacc = stack[-1][2]
                pacc[0] += acc[0]
                pacc[1] += acc[1]
    return lens


def extract_main(root: _Node) -> _Node | None:
    lens = _subtree_text_lens(root)
    candidates: list[tuple[int, int, _Node]] = []
    order = 0
    body = None
    for n in _walk(root, skip=_BOILERPLATE):
        order += 1
        if n.tag == "body":
            body = n
        is_cand = (n.tag in ("article", "main", "section", "div")
                   or n.attrs.get("role") == "main")
        if not is_cand:
            continue
        own, link = lens.get(id(n), (0, 0))
        candidates.append((own - link, -order, n))
    if candidates:
        best = max(candidates, key=lambda t: (t[0], t[1]))
        if best[0] > 0:
            return best[2]
    return body


_WS_RE = re.compile(r"\s+")


def _ws_collapse(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# X5 — HTML → Markdown (block/inline renderer over the mini-DOM)
# ---------------------------------------------------------------------------

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCKS = frozenset({"p", "ul", "ol", "li", "blockquote", "pre", "hr",
                     "div", "section", "article", "main", "body", "table",
                     "figure", "#document"}) | frozenset(_HEADINGS)


def html_to_markdown(node: _Node) -> str:
    """Deterministic HTML→Markdown mirroring htmltomarkdown.ConvertString's
    core rules (text_extraction.go:186-190): headings → `#`·n, paragraphs →
    blank-line blocks, img → `![alt](src)`, a → `[text](href)`,
    strong/em/code inline marks, ul/ol → `-` / `1.` items. Divergences
    (tables flattened, definition lists as plain blocks) noted in
    SEMANTICS.md and pinned by fixtures."""
    blocks: list[str] = []
    _render_block(node, blocks, list_depth=0)
    return "\n\n".join(b for b in (x.strip("\n") for x in blocks) if b)


def _render_block(node: _Node, blocks: list[str], list_depth: int) -> None:
    lvl = _HEADINGS.get(node.tag)
    if lvl:
        blocks.append("#" * lvl + " " + _ws_collapse(_render_inline(node)))
        return
    if node.tag == "p" or node.tag == "blockquote" or node.tag == "figure":
        txt = _render_mixed(node, blocks, list_depth)
        if txt:
            blocks.append(("> " if node.tag == "blockquote" else "") + txt)
        return
    if node.tag == "pre":
        blocks.append("```\n" + _text_of(node).strip("\n") + "\n```")
        return
    if node.tag == "hr":
        blocks.append("---")
        return
    if node.tag in ("ul", "ol"):
        items: list[str] = []
        i = 1
        for c in node.children:
            if isinstance(c, _Node) and c.tag == "li":
                marker = f"{i}. " if node.tag == "ol" else "- "
                inline = "".join(
                    x if isinstance(x, str) else _render_inline_one(x)
                    for x in c.children
                    if isinstance(x, str) or x.tag not in ("ul", "ol"))
                items.append("  " * list_depth + marker
                             + _ws_collapse(inline))
                i += 1
                for sub in c.children:
                    if isinstance(sub, _Node) and sub.tag in ("ul", "ol"):
                        subblocks: list[str] = []
                        _render_block(sub, subblocks, list_depth + 1)
                        items.extend(subblocks)
        if items:
            blocks.append("\n".join(items))
        return
    if node.tag in _BLOCKS or node.tag == "#document":
        # transparent container: inline runs become paragraphs, child
        # blocks recurse — mirrors how converters treat div soup
        _render_mixed(node, blocks, list_depth, container=True)
        return
    if node.tag in _BOILERPLATE:
        return
    # unknown element: treat as transparent container
    _render_mixed(node, blocks, list_depth, container=True)


def _render_mixed(node: _Node, blocks: list[str], list_depth: int,
                  container: bool = False) -> str:
    """Render children: inline content accumulates into a run; block
    children flush the run as its own paragraph. For container=True the
    trailing run is appended to `blocks`; otherwise it is returned."""
    run: list[str] = []

    def flush():
        txt = _ws_collapse("".join(run))
        run.clear()
        if txt:
            blocks.append(txt)

    for c in node.children:
        if isinstance(c, str):
            run.append(c)
        elif c.tag in _BLOCKS or c.tag in _HEADINGS or c.tag in _BOILERPLATE:
            flush()
            if c.tag not in _BOILERPLATE:
                _render_block(c, blocks, list_depth)
        else:
            run.append(_render_inline_one(c))
    if container:
        flush()
        return ""
    return _ws_collapse("".join(run))


def _render_inline(node: _Node) -> str:
    return "".join(
        c if isinstance(c, str) else _render_inline_one(c)
        for c in node.children)


def _render_inline_one(n: _Node) -> str:
    if n.tag == "img":
        return f"![{n.attrs.get('alt', '')}]({n.attrs.get('src', '')})"
    if n.tag == "br":
        return "\n"
    inner = _render_inline(n)
    if n.tag == "a":
        href = n.attrs.get("href", "")
        return f"[{_ws_collapse(inner)}]({href})" if href else inner
    if n.tag in ("strong", "b"):
        return f"**{inner}**"
    if n.tag in ("em", "i"):
        return f"*{inner}*"
    if n.tag == "code":
        return f"`{inner}`"
    return inner


# ---------------------------------------------------------------------------
# P1 — ContentMetadata projection (text_extraction.go:24-41, mapped :66-79).
# Struct layout lives in schemas.METADATA.
# ---------------------------------------------------------------------------

def _parse_iso(s: str):
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def build_metadata(title: str, metas: list[dict], lang: str,
                   main_text: str) -> dict:
    """trafilatura-style metadata from standard meta tags. Fingerprint is
    sha256 hex of the whitespace-collapsed main text (trafilatura's own
    fingerprint is a simhash — documented divergence, SEMANTICS.md)."""
    by_name: dict[str, str] = {}
    raw: dict[str, str] = {}
    for m in metas:
        key = m.get("name") or m.get("property") or ""
        if key and key not in by_name:
            by_name[key] = m.get("content") or ""
        if key:
            raw[key] = m.get("content") or ""

    def g(*keys: str) -> str:
        for k in keys:
            v = by_name.get(k, "")
            if v:
                return v
        return ""

    tags = [t.strip() for t in g("keywords", "article:tag").split(",")
            if t.strip()]
    cats = [c.strip() for c in g("article:section").split(",") if c.strip()]
    fp = hashlib.sha256(_ws_collapse(main_text).encode("utf-8")).hexdigest()
    return {
        "title": g("og:title") or title,
        "author": g("author", "article:author"),
        "description": g("description", "og:description"),
        "site_name": g("og:site_name"),
        "published_date": _parse_iso(g("article:published_time",
                                       "datePublished")),
        "modified_date": _parse_iso(g("article:modified_time",
                                      "dateModified")),
        "language": g("og:locale") or lang,
        "tags": tags,
        "categories": cats,
        "image_url": g("og:image"),
        "license": g("license"),
        "id": g("og:url"),
        "fingerprint": fp,
        "excerpt": g("description", "og:description"),
        "comments_count": 0,
        "raw_metadata": raw,
    }


# ---------------------------------------------------------------------------
# One-pass page parse (pure core + Spark stage)
# ---------------------------------------------------------------------------

def parse_page(html: str) -> dict:
    """One parse, all derived artifacts. Shared by the Spark stage, the
    oracle and the tests.

    The tree walk / text / link / meta passes are iterative (arbitrary
    nesting depth); the markdown RENDERER is still recursive (its depth =
    block-nesting depth, far shallower than raw DOM depth), so a
    pathologically deep block structure degrades to body_md="" instead of
    failing the parse — links/title/metas still come out, mirroring how
    the reference's link callbacks keep firing when content extraction
    gives up."""
    root = parse_dom(html)
    title = extract_title(root)
    metas = extract_metas(root)
    links = extract_links(root)
    main = extract_main(root)
    try:
        body_md = html_to_markdown(main) if main is not None else ""
    except RecursionError:
        body_md = ""
    main_text = _text_of(main, skip=_BOILERPLATE) if main is not None else ""
    meta = build_metadata(title, metas, _html_lang(root), main_text)
    return {"title": title, "metas": metas, "out_links": links,
            "body_md": body_md, "metadata": meta}


_META_FIELD = FETCHED["metas"].dataType


def parse_fetched_html(fetched: DataFrame,
                       html_col: str = "body_html") -> DataFrame:
    """The Spark parse stage: FETCHED_RAW rows (with raw `body_html`) →
    FETCHED rows (+ metadata). mapInPandas so each page is parsed exactly
    once and every derived column comes from that single parse; narrow
    (no shuffle), Arrow-batched, scales with scan partitions."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    in_fields = [f for f in fetched.schema.fields if f.name != html_col]
    out_schema = T.StructType(in_fields + [
        T.StructField("title", T.StringType(), True),
        T.StructField("metas", _META_FIELD, True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("body_md", T.StringType(), True),
        T.StructField("metadata", METADATA, True),
    ])

    def _parse(batches):
        def safe(h):
            # per-row guard: ONE pathological page (bad soup, resource
            # blow-up) degrades to a null row — the same shape as a fetch
            # error — instead of failing the task and, after retries, the
            # job (the reference's OnError only logs; ADVICE r2 #1)
            if not (isinstance(h, str) and h):
                return None
            try:
                return parse_page(h)
            except Exception:
                return None

        for pdf in batches:
            parsed = [safe(h) for h in pdf[html_col]]
            out = pdf.drop(columns=[html_col])
            out["title"] = [p["title"] if p else None for p in parsed]
            out["metas"] = [p["metas"] if p else None for p in parsed]
            out["out_links"] = [p["out_links"] if p else None for p in parsed]
            out["body_md"] = [p["body_md"] if p else None for p in parsed]
            out["metadata"] = [p["metadata"] if p else None for p in parsed]
            yield out

    return fetched.mapInPandas(_parse, schema=out_schema)


def escape(s: str) -> str:
    """HTML-escape helper shared with fixture renderers."""
    return _html_mod.escape(s, quote=True)
