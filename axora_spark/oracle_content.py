"""Pure-Python oracle for the content pipeline (branch B) — mirrors
plans/content.py exactly using the same shared pure-Python cores
(textproc, spans, chunking, embed, quality). See SEMANTICS.md."""

from __future__ import annotations

import hashlib

from axora_spark.config import CrawlConfig
from axora_spark.functions.quality import quality_score_py
from axora_spark.functions.textproc import is_meta_relevant
from axora_spark.functions import urlnorm
from axora_spark.operators.chunking import (chunk_text_py,
                                            resolve_token_counter)
from axora_spark.operators.spans import md_to_spans


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def expected_documents(pages: list[dict], admitted_urls: set[str],
                       cfg: CrawlConfig) -> dict[str, dict]:
    """doc_id -> {url, spans, text} for fetched pages passing both gates."""
    docs: dict[str, dict] = {}
    for p in pages:
        canon = urlnorm.canonicalize(p["url"])
        if canon not in admitted_urls:
            continue
        if not is_meta_relevant(p.get("title") or "", p.get("metas"),
                                cfg.topic):
            continue
        spans = md_to_spans(p.get("body_md") or "", canon)
        text = "\n\n".join(s["text"] for s in spans if s["kind"] == "text")
        if quality_score_py(text) < cfg.quality_threshold:
            continue
        doc_id = sha256_hex(canon)
        docs[doc_id] = {"url": canon, "spans": spans, "text": text}
    return docs


def expected_chunks(docs: dict[str, dict], cfg: CrawlConfig
                    ) -> list[tuple[str, int, str, int]]:
    """(doc_id, chunk_index, text, token_count) — pre-gate indices, matching
    posexplode-then-filter semantics."""
    count = resolve_token_counter(cfg.tokenizer)
    out = []
    for doc_id, d in sorted(docs.items()):
        for i, c in enumerate(chunk_text_py(d["text"], cfg.chunk_method)):
            c = c.strip()
            if not c:
                continue
            tc = count(c)
            if cfg.min_tokens <= tc <= cfg.max_tokens:
                out.append((doc_id, i, c, tc))
    return out
