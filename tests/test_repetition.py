"""Gopher repetition filters (Rae et al. 2021 A1.1) — constructed-value
gates on top-n-gram character coverage and the pass thresholds."""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def rep_rows(spark):
    docs = [
        # doc 0: pure 2-cycle — "a b" occurs 3×, covers all 6 word-chars
        (0, "a b a b a b", "en", "t", 11),
        # doc 1: 26 distinct 3-char words — every n-gram unique, so top-n
        # coverage = n*3/78, under every threshold (0.077/0.115/0.154)
        (1, "abc def ghi jkl mno pqr stu vwx yza bcd efg hij klm nop qrs "
            "tuv wxy zab cde fgh ijk lmn opq rst uvw xyz", "en", "t", 78),
        # doc 2: heavy 3-gram repetition ("x y z" ×4 of 13 words)
        (2, "x y z x y z x y z x y z q", "en", "t", 25),
        # doc 3: fewer than 4 words (4-gram impossible, count 0)
        (3, "one two three", "en", "t", 13),
    ]
    d = tempfile.mkdtemp(prefix="axora_rep_")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    from axora_spark.queries import q_repetition_filters
    out = {r.doc_id: r for r in q_repetition_filters(spark, d).collect()}
    yield out
    import shutil
    shutil.rmtree(d, ignore_errors=True)


def test_pure_cycle_fails_gate(rep_rows):
    r = rep_rows[0]
    # "a b"×3 → 3 occurrences × 2 chars / 6 total chars = 1.0
    assert r.top2gram_char_frac == 1.0
    # "a b a"×2 → 2×3/6 = 1.0; "a b a b"... ×2 → 2×4/6
    assert r.top3gram_char_frac == 1.0
    assert r.top4gram_char_frac == pytest.approx(8 / 6, abs=1e-6)
    assert r.dup_word_frac == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert r.passes_repetition is False


def test_varied_text_passes(rep_rows):
    r = rep_rows[1]
    # every n-gram unique: coverage = one n-gram's chars / total
    assert r.top2gram_char_frac == pytest.approx(6 / 78, abs=1e-6)
    assert r.top4gram_char_frac == pytest.approx(12 / 78, abs=1e-6)
    assert r.passes_repetition is True
    assert r.dup_word_frac == 0.0


def test_trigram_repetition(rep_rows):
    r = rep_rows[2]
    # "x y z" ×4, 3 chars, total 13 word-chars → 12/13
    assert r.top3gram_char_frac == pytest.approx(12 / 13, abs=1e-6)
    assert r.passes_repetition is False


def test_short_doc_zero_4gram(rep_rows):
    r = rep_rows[3]
    assert r.top4gram_char_frac == 0.0
    # best bigram is "two three" (8 chars) / 11 total word-chars
    assert r.top2gram_char_frac == pytest.approx(8 / 11, abs=1e-6)
    # the single trigram covers the whole doc
    assert r.top3gram_char_frac == 1.0
