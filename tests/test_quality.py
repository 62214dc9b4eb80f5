"""F7 quality score: boundary truth table + Spark↔Python parity
(reference: crawler/text_extraction.go:145-230)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axora_spark.functions.quality import (quality_gate, quality_score,
                                           quality_score_py, word_count,
                                           distinct_word_count,
                                           sentence_count)


def _mk(wc: int, vocab: int, sentences: int) -> str:
    """Text with `wc` words, `vocab` distinct, `sentences` sentences."""
    words = [f"w{i % vocab}" for i in range(wc)]
    per = max(1, wc // sentences)
    out = []
    for i, w in enumerate(words):
        if (i + 1) % per == 0:
            out.append(w + ".")
        else:
            out.append(w)
    return " ".join(out)


BOUNDARY_CASES = [
    # (wc, vocab, sentences) — straddling 200/10000 words, 0.25/0.6
    # richness, 5 sentences, avg 10/30
    (199, 150, 10), (200, 150, 10), (201, 150, 10),
    (250, 50, 12), (250, 62, 12), (250, 63, 12),   # richness ≈ 0.25
    (250, 150, 12), (250, 151, 12),                # richness ≈ 0.6
    (300, 200, 4), (300, 200, 5),                  # sentence count
    (300, 200, 31), (300, 200, 10),                # avg length 10/30
    (250, 160, 26),                                # avg < 10
]


def test_score_py_boundaries():
    # wc<200 → length 0 → max 0.3+0.2 = 50 < 67 → drop: length is the only
    # single factor that can fail a page on its own (text_extraction.go:196)
    assert quality_score_py(_mk(199, 150, 10)) == pytest.approx(44.0)
    assert quality_score_py(_mk(200, 150, 10)) >= 67   # boundary: 200 passes
    # ideal text: 1.0/1.0/1.0 → 100 (richness 0.6 is NOT > 0.6 → 1.0)
    assert quality_score_py(_mk(250, 150, 12)) == pytest.approx(100.0)
    # poor vocab alone: 0.5 + 0 + 0.2 = 70 ≥ 67 → still passes
    assert quality_score_py(_mk(250, 50, 12)) == pytest.approx(70.0)
    # few sentences → 0.5+0.3·0.8+0 = 74 ≥ 67 (can't kill alone either)
    assert quality_score_py(_mk(300, 200, 4)) >= 67


def test_empty_text():
    assert quality_score_py("") < 67


def test_spark_python_parity(spark):
    texts = [_mk(*c) for c in BOUNDARY_CASES] + ["", "one two. three!"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        quality_score(F.col("text")).alias("score"),
        word_count(F.col("text")).alias("wc"),
        distinct_word_count(F.col("text")).alias("dwc"),
        sentence_count(F.col("text")).alias("sc"),
    ).collect()
    from axora_spark.functions.quality import quality_metrics_py
    for r in rows:
        m = quality_metrics_py(r.text)
        assert r.wc == m["word_count"], r.text[:50]
        assert r.dwc == m["distinct_words"], r.text[:50]
        assert r.sc == m["sentence_count"], r.text[:50]
        assert r.score == pytest.approx(quality_score_py(r.text)), r.text[:50]
