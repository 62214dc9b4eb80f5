"""C1–C4 — chunking + token-count gate (SURVEY.md §2.8), X10 token count.

Reference: crawler/chunking.go. Two splitters (langchaingo):
  "md"  — MarkdownTextSplitter, heading hierarchy on, overlap 50
  "sen" — RecursiveCharacter, separators ["\\n\\n","\\n",".","!","?"," ",""],
          keep-separator, overlap 50
then per chunk: trim → drop empty → keep 75 ≤ tokens ≤ 480 (>480 silently
dropped — chunking.go:144 TODO quirk, reproduced).

Splitters are self-contained reimplementations of the published
recursive-character/markdown-splitter algorithms (no langchain in this
sandbox); defaults: chunk_size=512 chars (langchaingo default), overlap=50.

Token counting: the reference uses the BGE wordpiece tokenizer via Rust FFI
(chunking.go:34-36); neither `tokenizers` nor the FFI exists here, so the
deterministic stand-in is a subword estimate that is FULLY native-SQL
expressible on both Spark and DuckDB (for the oracle contract):

    token_count(text) = Σ over whitespace-words w of ceil(len(w)/4)

Pure-Python core shared with tests; Spark side: native column expression
for the token count, pandas UDF (array<string>) for the splitters.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEPARATORS = ["\n\n", "\n", ".", "!", "?", " ", ""]
CHUNK_SIZE = 512
CHUNK_OVERLAP = 50
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")


# ---------------- token count (X10) ----------------
# Two interchangeable counters:
#   "wordpiece" — the real BGE/BERT wordpiece count (functions/wordpiece.py,
#                 mirrors chunking.go:134-136); pandas UDF, per-executor
#                 lazy vocab singleton. The DEFAULT when tokenizer.json is
#                 reachable.
#   "estimate"  — Σ ceil(len(word)/4): fully native-SQL on both Spark and
#                 DuckDB, kept for the oracle contract and as the fallback.

def token_count_py(text: str) -> int:
    return sum(math.ceil(len(w) / 4) for w in text.split())


def token_count_col(text: Column) -> Column:
    """Native: aggregate(transform(split(text,'\\s+'), w -> ceil(len/4)))."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
    return F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"))


def resolve_token_counter(tokenizer: str):
    """Pure-Python counter for `tokenizer`, shared by the content oracle and
    the Spark UDF so both sides always agree."""
    if tokenizer == "wordpiece":
        from axora_spark.functions import wordpiece
        if wordpiece.available():
            return wordpiece.count_tokens
    return token_count_py


def wordpiece_count_udf(tokenizer: str = "wordpiece"):
    """Vectorized X10: real wordpiece counts (Arrow batches; the vocab set
    loads once per executor inside the UDF).

    The executor NEVER silently falls back to the estimate: token_count_expr
    only routes here when the driver resolved wordpiece, so an executor
    that can't load the vocab raises instead of letting one slice of the
    job diverge from the oracle (and from its sibling executors). Ship the
    vocab with `spark-submit --files tokenizer.json` (SparkFiles is on the
    wordpiece search path) or set AXORA_TOKENIZER_JSON on the executors."""
    @F.pandas_udf(T.IntegerType())
    def _udf(texts: pd.Series) -> pd.Series:
        if tokenizer == "wordpiece":
            from axora_spark.functions import wordpiece
            if not wordpiece.available():
                raise RuntimeError(
                    "driver selected the wordpiece tokenizer but this "
                    "executor cannot load tokenizer.json — ship it via "
                    "spark-submit --files tokenizer.json or set "
                    "AXORA_TOKENIZER_JSON (a silent estimate fallback "
                    "would mix counting schemes within one job)")
            fn = wordpiece.count_tokens
        else:
            fn = token_count_py
        return pd.Series([fn(t or "") for t in texts],
                         index=texts.index, dtype="int32")
    # pure, but marked nondeterministic so the C4 gate's filter pushdown
    # can't substitute (and re-run) the tokenizer per predicate
    return _udf.asNondeterministic()


def token_count_expr(text: Column, tokenizer: str) -> Column:
    """The engine's token-count column: native estimate stays JVM-side;
    wordpiece goes through the Arrow UDF (the tokenizer IS the operator —
    Python is unavoidable and batched)."""
    if tokenizer == "wordpiece":
        from axora_spark.functions import wordpiece
        if wordpiece.available():
            return wordpiece_count_udf(tokenizer)(text)
    return token_count_col(text)


# ---------------- recursive-character splitter (C3) ----------------

def _split_on(text: str, seps: list[str]) -> list[str]:
    """Split `text` by the first applicable separator, keep-separator
    semantics (separator stays attached to the preceding piece)."""
    sep = None
    for s in seps:
        if s == "":
            sep = ""
            break
        if s in text:
            sep = s
            break
    rest = seps[seps.index(sep) + 1:] if sep is not None else []
    if sep == "" or sep is None:
        pieces = list(text)
    else:
        parts = text.split(sep)
        pieces = [p + sep for p in parts[:-1]] + [parts[-1]]
        pieces = [p for p in pieces if p]
    out: list[str] = []
    for p in pieces:
        if len(p) <= CHUNK_SIZE or not rest:
            out.append(p)
        else:
            out.extend(_split_on(p, rest))
    return out


def _merge_pieces(pieces: list[str], chunk_size: int = CHUNK_SIZE,
                  overlap: int = CHUNK_OVERLAP) -> list[str]:
    """Greedy merge of adjacent pieces up to chunk_size with trailing
    overlap carried into the next chunk (the published recursive-character
    merge loop)."""
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for p in pieces:
        if cur and cur_len + len(p) > chunk_size:
            chunks.append("".join(cur).strip())
            # carry overlap: drop leading pieces until ≤ overlap remains
            while cur and cur_len > overlap:
                cur_len -= len(cur[0])
                cur.pop(0)
        cur.append(p)
        cur_len += len(p)
    if cur:
        chunks.append("".join(cur).strip())
    return [c for c in chunks if c]


def chunk_sentence_py(text: str) -> list[str]:
    """C3 — recursive-character, keep-separator, overlap 50."""
    if not text or not text.strip():
        return []
    return _merge_pieces(_split_on(text, SEPARATORS))


# ---------------- markdown splitter (C2) ----------------

def chunk_markdown_py(text: str) -> list[str]:
    """C2 — heading-hierarchy splitter: each section = its heading path +
    body; long sections recurse into the character splitter."""
    if not text or not text.strip():
        return []
    lines = text.split("\n")
    sections: list[tuple[list[str], list[str]]] = []  # (heading_path, body)
    path: list[str] = []
    body: list[str] = []

    def flush():
        if body and any(ln.strip() for ln in body):
            sections.append((list(path), list(body)))
        body.clear()

    for ln in lines:
        m = _HEADING_RE.match(ln)
        if m:
            flush()
            level = len(m.group(1))
            path[:] = path[: level - 1]
            while len(path) < level - 1:
                path.append("")
            path.append(m.group(2).strip())
        else:
            body.append(ln)
    flush()

    chunks: list[str] = []
    for hpath, blines in sections:
        header = "\n".join(f"{'#' * (i + 1)} {h}" for i, h in enumerate(hpath) if h)
        btext = "\n".join(blines).strip()
        section = (header + "\n" + btext).strip() if header else btext
        if len(section) <= CHUNK_SIZE:
            chunks.append(section)
        else:
            prefix = (header + "\n") if header else ""
            for sub in chunk_sentence_py(btext):
                chunks.append((prefix + sub).strip())
    return [c for c in chunks if c]


def chunk_text_py(text: str, method: str) -> list[str]:
    """C1 — dispatcher (chunking.go:48-58); unknown method raises."""
    if method == "md":
        return chunk_markdown_py(text)
    if method == "sen":
        return chunk_sentence_py(text)
    raise ValueError(f"unsupported chunk type: {method}")


# ---------------- Spark side ----------------

def chunks_udf(method: str):
    """Vectorized splitter UDF: text → array<string> (pre-gate chunks).
    asNondeterministic (it is pure): prevents filter-pushdown substitution
    from re-running the splitter per referencing predicate."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series([chunk_text_py(t or "", method) for t in texts],
                         index=texts.index)
    return _udf.asNondeterministic()


def chunk_gate(token_count: Column, min_tokens: int = 75,
               max_tokens: int = 480) -> Column:
    """C4 — keep 75 ≤ tokens ≤ 480; >max silently dropped
    (chunking.go:139-144)."""
    return (token_count >= min_tokens) & (token_count <= max_tokens)
