"""F7 — content-quality score as native column algebra (SURVEY.md §2.2 F7).

Reference: crawler/text_extraction.go:145-230. Composite score
100·(0.50·length + 0.30·richness + 0.20·sentence); pages scoring < 67 drop.

Everything here is built-in pyspark.sql.functions — whole-stage codegen,
no Python on the hot path. The same arithmetic exists in pure Python in
`quality_score_py` for the oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# strings.Trim(w, ".,!?\"'():;[]{}") — trim from both ends only
_TRIM_CLASS = r'[.,!?"\'():;\[\]{}]+'
_TRIM_RE_PY = re.compile(r'^[.,!?"\'():;\[\]{}]+|[.,!?"\'():;\[\]{}]+$')


def word_count(text: Column) -> Column:
    """A1 — len(strings.Fields(text)): count of whitespace-separated runs;
    empty/blank string → 0 (split('') yields [''] — guard it)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def distinct_word_count(text: Column) -> Column:
    """A2 — distinct lowercased, punctuation-trimmed words ('' excluded)."""
    words = F.split(F.trim(text), r"\s+")
    cleaned = F.transform(
        words,
        lambda w: F.regexp_replace(
            F.regexp_replace(F.lower(w), f"^{_TRIM_CLASS}", ""),
            f"{_TRIM_CLASS}$", ""))
    return F.size(F.array_distinct(F.filter(cleaned, lambda w: w != "")))


def sentence_count(text: Column) -> Column:
    """A3 — len(regexp [.!?]+ split), min 1 (Go Split counts empty tails)."""
    return F.greatest(F.size(F.split(text, r"[.!?]+")), F.lit(1))


def score_from_counts(wc: Column, dwc: Column, sc: Column) -> Column:
    """Score from already-computed counts. Multi-column consumers (the
    quality_scores driver query) materialize wc/dwc/sc as attribute
    columns first and derive score/gate from THOSE: the text-composed
    quality_score(text) embeds the splits in every consuming column,
    and HOF expression trees are interpreted (no codegen CSE), so a
    5-column select re-ran the regex split 22× per row (PLANS.md
    audit)."""
    richness = dwc.cast("double") / F.when(wc == 0, F.lit(1)).otherwise(wc)
    avg_sentence = wc.cast("double") / sc

    length_s = (F.when(wc < 200, F.lit(0.0))
                 .when(wc > 10000, F.lit(0.7))
                 .otherwise(F.lit(1.0)))
    rich_s = (F.when(richness < 0.25, F.lit(0.0))
               .when(richness > 0.6, F.lit(0.8))
               .otherwise(F.lit(1.0)))
    sent_s = (F.when(sc < 5, F.lit(0.0))
               .when((avg_sentence < 10) | (avg_sentence > 30), F.lit(0.7))
               .otherwise(F.lit(1.0)))
    return (F.lit(0.50) * length_s + F.lit(0.30) * rich_s
            + F.lit(0.20) * sent_s) * F.lit(100.0)


def quality_score(text: Column) -> Column:
    """Single-expression form — for one-use positions (the F7 filter)."""
    return score_from_counts(word_count(text), distinct_word_count(text),
                             sentence_count(text))


def quality_gate(text: Column, threshold: float = 67.0) -> Column:
    """Keep-predicate: score ≥ threshold (text_extraction.go:170-173)."""
    return quality_score(text) >= F.lit(threshold)


# ---------------- pure-Python mirror (oracle side) ----------------

def _length_score(wc: int) -> float:
    if wc < 200:
        return 0.0
    if wc > 10000:
        return 0.7
    return 1.0


def _richness_score(r: float) -> float:
    if r < 0.25:
        return 0.0
    if r > 0.6:
        return 0.8
    return 1.0


def _sentence_score(n: int, avg: float) -> float:
    if n < 5:
        return 0.0
    if avg < 10 or avg > 30:
        return 0.7
    return 1.0


def quality_metrics_py(text: str) -> dict:
    words = text.split()
    wc = len(words)
    uniq = {w for w in (_TRIM_RE_PY.sub("", x.lower()) for x in words) if w}
    richness = len(uniq) / wc if wc else 0.0
    sentences = re.split(r"[.!?]+", text)
    n_sent = max(len(sentences), 1)
    avg = wc / n_sent
    return {"word_count": wc, "distinct_words": len(uniq),
            "richness": richness, "sentence_count": n_sent,
            "avg_sentence_length": avg}


def quality_score_py(text: str) -> float:
    m = quality_metrics_py(text)
    return (0.50 * _length_score(m["word_count"])
            + 0.30 * _richness_score(m["richness"])
            + 0.20 * _sentence_score(m["sentence_count"],
                                     m["avg_sentence_length"])) * 100.0
