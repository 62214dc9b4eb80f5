"""X10 — real wordpiece tokenizer (pure Python, Arrow-vectorized on Spark).

The reference tokenizes chunks with the HuggingFace `tokenizers` Rust FFI
(crawler/chunking.go:34-36), loading `tokenizer.json` — the BAAI/
bge-base-en-v1.5 vocabulary (docker-compose.yml:21-22), which is the
standard BERT-uncased WordPiece scheme:

  normalizer     BertNormalizer{clean_text, handle_chinese_chars,
                 lowercase, strip_accents: null → strip iff lowercase}
  pre_tokenizer  BertPreTokenizer (whitespace split; every punctuation
                 char is its own token)
  model          WordPiece greedy longest-match, continuation prefix
                 '##', max_input_chars_per_word=100, fallback [UNK]

The reference counts `len(Encode(text, false))` — addSpecialTokens=false
(chunking.go:134-136) — so counts here exclude [CLS]/[SEP] too.

The algorithm is public (BERT, Devlin et al. 2018; the HF tokenizers
spec); only the VOCABULARY is loaded from tokenizer.json. The loader looks
at $AXORA_TOKENIZER_JSON, then ./assets/tokenizer.json, then the reference
checkout's copy; when none exists `available()` is False and callers fall
back to the native ceil(len/4) estimate (operators/chunking.py), keeping
the engine runnable anywhere.

The vocab set is loaded lazily ONCE PER EXECUTOR (module-level singleton
inside the pandas UDF) — at 100 TB it is a ~3 MB per-executor constant,
not a broadcast, not per-batch work.
"""

from __future__ import annotations

import json
import os
import unicodedata
from functools import lru_cache

_UNK = "[UNK]"
_MAX_WORD_CHARS = 100
_CONT = "##"

_SEARCH_PATHS = (
    os.environ.get("AXORA_TOKENIZER_JSON", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                 "tokenizer.json"),
    "/root/reference/tokenizer.json",
)


def _spark_files_path() -> str:
    """tokenizer.json shipped via `spark-submit --files` (SparkFiles), for
    real clusters where the reference checkout doesn't exist on executors."""
    try:
        from pyspark import SparkFiles
        p = SparkFiles.get("tokenizer.json")
        return p if p and os.path.exists(p) else ""
    except Exception:
        return ""


@lru_cache(maxsize=1)
def _vocab() -> frozenset | None:
    for p in (*_SEARCH_PATHS, _spark_files_path()):
        if p and os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                tk = json.load(f)
            model = tk.get("model", {})
            if model.get("type") == "WordPiece" and "vocab" in model:
                return frozenset(model["vocab"])
    return None


def available() -> bool:
    return _vocab() is not None


# --------------------------------------------------------------------------
# BertNormalizer + BertPreTokenizer (public BERT preprocessing rules)
# --------------------------------------------------------------------------

def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


_CJK_RANGES = ((0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
               (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
               (0xF900, 0xFAFF), (0x2F800, 0x2FA1F))


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


# ASCII fast path: for pure-ASCII text (the overwhelming majority of a web
# crawl) the per-char unicodedata classification collapses to a translate
# + one regex. BERT's punct set covers ALL printable non-alnum ASCII
# (ranges 33-47, 58-64, 91-96, 123-126), control chars drop, whitespace
# splits — equivalence with the general path is property-tested.
_ASCII_DROP = {c: None for c in range(32) if chr(c) not in "\t\n\r"}
_ASCII_DROP[127] = None
_ASCII_TRANS = str.maketrans(_ASCII_DROP)
_ASCII_TOK_RE = __import__("re").compile(
    r"[^\s!-/:-@\[-`{-~]+|[!-/:-@\[-`{-~]")


def _pre_tokenize_ascii(text: str) -> list[str]:
    return _ASCII_TOK_RE.findall(text.translate(_ASCII_TRANS).lower())


def pre_tokenize(text: str) -> list[str]:
    """clean_text → CJK padding → lowercase+strip-accents → whitespace
    split → punctuation isolation. Output: the word units WordPiece sees."""
    if text.isascii():
        return _pre_tokenize_ascii(text)
    return _pre_tokenize_general(text)


def _pre_tokenize_general(text: str) -> list[str]:
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if _is_whitespace(ch):
            cleaned.append(" ")
        elif _is_cjk(cp):
            cleaned.append(f" {ch} ")
        else:
            cleaned.append(ch)
    lowered = unicodedata.normalize("NFD", "".join(cleaned).lower())
    stripped = "".join(c for c in lowered
                       if unicodedata.category(c) != "Mn")
    words: list[str] = []
    for w in stripped.split():
        run = []
        for ch in w:
            if _is_punct(ch):
                if run:
                    words.append("".join(run))
                    run = []
                words.append(ch)
            else:
                run.append(ch)
        if run:
            words.append("".join(run))
    return words


# --------------------------------------------------------------------------
# WordPiece greedy longest-match
# --------------------------------------------------------------------------

def _wordpiece(word: str, vocab: frozenset) -> list[str]:
    if len(word) > _MAX_WORD_CHARS:
        return [_UNK]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = _CONT + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [_UNK]
        pieces.append(cur)
        start = end
    return pieces


def tokenize(text: str) -> list[str]:
    """Wordpiece tokens of `text` (no special tokens). Raises RuntimeError
    when no vocabulary is available — count_tokens/callers are expected to
    gate on available()."""
    vocab = _vocab()
    if vocab is None:
        raise RuntimeError("no tokenizer.json found (see module docstring)")
    out: list[str] = []
    for w in pre_tokenize(text):
        out.extend(_wordpiece(w, vocab))
    return out


def count_tokens(text: str) -> int:
    return len(tokenize(text))
