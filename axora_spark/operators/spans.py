"""X5 — markdown body → interleaved text+media span sequence.

This operator produces the authoritative `input_hint` shape:
`spans:array<struct<kind,text,media_ref,offset>>` per doc_id, and its rules
ARE the per-row invariant (SEMANTICS.md content-pipeline closure):

  * split body on blank lines into blocks;
  * a block that is exactly an image `![alt](ref)` → one media span
    (text='', media_ref=absolutized ref);
  * inline images split their block: text part(s) + media span(s), in
    source order;
  * any other non-empty block (heading, paragraph, list, ...) → one text
    span (text=block, media_ref='');
  * offset = 0-based position in the resulting sequence.

The reference's equivalent stage is html→markdown via htmltomarkdown
(text_extraction.go:186-190) with media refs from in-content tags and
metadata (text_extraction.go:74); fidelity is pinned by fixtures, not by
the Go library (SURVEY.md §7.3 item 5).

Pure-Python core (md_to_spans) shared with the oracle/tests; Spark side is
a vectorized pandas UDF returning the nested array — one Arrow batch in,
one out, no per-row Python API.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.functions import urlnorm
from axora_spark.schemas import SPAN

_IMG_RE = re.compile(r"!\[[^\]]*\]\(([^)\s]+)\)")
_BLANK_RE = re.compile(r"\n\s*\n")


def md_to_spans(body_md: str, base_url: str = "") -> list[dict]:
    """Deterministic markdown → span list. See module docstring for rules."""
    if not body_md:
        return []
    spans: list[dict] = []

    def emit(kind: str, text: str, media_ref: str) -> None:
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    for block in _BLANK_RE.split(body_md):
        block = block.strip()
        if not block:
            continue
        pos = 0
        for m in _IMG_RE.finditer(block):
            before = block[pos:m.start()].strip()
            if before:
                emit("text", before, "")
            ref = m.group(1)
            if base_url:
                ref = urlnorm.absolutize(base_url, ref) or ref
            emit("media", "", ref)
            pos = m.end()
        tail = block[pos:].strip()
        if tail:
            emit("text", tail, "")
    return spans


def spans_udf() -> Column:
    """Factory for the vectorized spans UDF (needs an active session).

    Marked nondeterministic ON PURPOSE (it is pure): it stops the
    optimizer substituting the UDF into pushed-down filters (the native
    quality gate over spans_to_text(spans) would otherwise re-evaluate the
    whole markdown→spans conversion once per referencing predicate —
    measured 2× plan nodes)."""
    @F.pandas_udf(T.ArrayType(SPAN))
    def _udf(body_md: pd.Series, url: pd.Series) -> pd.Series:
        out = [md_to_spans(b or "", u or "") for b, u in zip(body_md, url)]
        return pd.Series(out, index=body_md.index)
    return _udf.asNondeterministic()


def spans_to_text(spans_col: Column) -> Column:
    """Concatenated text of the text spans (newline-joined) — the chunking
    input. Native higher-order functions, no UDF."""
    texts = F.filter(spans_col, lambda s: s["kind"] == "text")
    return F.array_join(F.transform(texts, lambda s: s["text"]), "\n\n")
