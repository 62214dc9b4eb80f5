"""X10 — real wordpiece tokenizer (functions/wordpiece.py) against the
reference's tokenizer.json vocabulary (crawler/chunking.go:34-36).

The greedy-invariant test is the independent check: it re-verifies every
emitted piece against the raw vocab set (piece ∈ vocab, pieces re-join to
the word, and NO LONGER piece was available at each position) without
going through the tokenizer's own code path."""

from __future__ import annotations

import pytest

from axora_spark.functions import wordpiece as wp

pytestmark = pytest.mark.skipif(not wp.available(),
                                reason="no tokenizer.json reachable")


def test_basic_words_single_tokens():
    # common English words are whole vocab entries in any BERT-uncased vocab
    v = wp._vocab()
    for w in ("hello", "world", "economy", "the", "quick"):
        assert w in v, w
    assert wp.count_tokens("hello world") == 2
    assert wp.count_tokens("the quick brown fox") == 4


def test_lowercase_and_accent_strip():
    assert wp.tokenize("Héllo") == wp.tokenize("hello")
    assert wp.tokenize("ÉCONOMY") == wp.tokenize("economy")


def test_punctuation_isolated():
    assert wp.tokenize("a,b") == wp.tokenize("a") + [","] + wp.tokenize("b")
    assert wp.count_tokens("hello, world!") == 4


def test_control_chars_dropped_whitespace_folded():
    assert wp.tokenize("hello\x00\x07 \t\n world") == \
        wp.tokenize("hello world")


def test_cjk_chars_split_individually():
    toks = wp.tokenize("中文abc")
    # each CJK char is isolated; latin tail tokenizes separately
    assert toks[0] in ("中", "[UNK]") and toks[1] in ("文", "[UNK]")
    assert "".join(t.lstrip("#") for t in toks[2:]) in ("abc",) or \
        "[UNK]" in toks[2:]


def test_unknown_word_is_unk():
    assert wp.tokenize("ʘʘʘqqqঀxx") == ["[UNK]"] or \
        wp.tokenize("ʘʘʘ") == ["[UNK]"]


def test_overlong_word_is_single_unk():
    assert wp.tokenize("a" * 101) == ["[UNK]"]
    assert wp.count_tokens("a" * 101) == 1


def test_greedy_longest_match_invariant():
    """Independent re-verification against the raw vocab: for every non-UNK
    tokenization, pieces must re-join to the word, every piece must be a
    vocab entry, and at each start position no LONGER vocab match may
    exist (that is the definition of greedy longest-match)."""
    v = wp._vocab()
    words = ["unaffable", "tokenization", "johanson", "12345xyzzy",
             "hyperparameter", "fixture", "spark", "quarterly",
             "recessionary", "overcapitalization"]
    for word in words:
        pieces = wp._wordpiece(word, v)
        if pieces == ["[UNK]"]:
            continue
        rejoined = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert rejoined == word, word
        pos = 0
        for i, p in enumerate(pieces):
            raw = p[2:] if i > 0 else p
            assert p in v, p
            # no longer match at this position
            for ln in range(len(raw) + 1, len(word) - pos + 1):
                cand = word[pos:pos + ln]
                if i > 0:
                    cand = "##" + cand
                assert cand not in v, (word, pos, cand)
            pos += len(raw)


def test_counts_exclude_special_tokens():
    # Encode(text, false): no [CLS]/[SEP] — a 2-word text counts 2, not 4
    assert wp.count_tokens("hello world") == 2


def test_chunk_gate_with_real_counts(spark):
    """C4 with real wordpiece counts (chunking.go:139-141): 74 tokens drop,
    75 pass, 480 pass, 481 drop."""
    from pyspark.sql import functions as F

    from axora_spark.operators.chunking import chunk_gate, token_count_expr
    mk = lambda n: " ".join(["economy"] * n)  # noqa: E731 — 1 token/word
    df = spark.createDataFrame(
        [(mk(74),), (mk(75),), (mk(480),), (mk(481),)], "text string")
    out = (df.withColumn("tc", token_count_expr(F.col("text"), "wordpiece"))
             .withColumn("keep", chunk_gate(F.col("tc")))
             .collect())
    got = {r.tc: r.keep for r in out}
    assert got == {74: False, 75: True, 480: True, 481: False}


def test_udf_matches_pure_python(spark):
    from pyspark.sql import functions as F

    from axora_spark.operators.chunking import wordpiece_count_udf
    texts = ["Economy outlook, 2025!", "short", "", "Héllo wörld",
             "a" * 101, "中文 mixed content"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text",
                     wordpiece_count_udf()(F.col("text")).alias("tc")) \
             .collect()
    for r in rows:
        assert r.tc == wp.count_tokens(r.text), repr(r.text)


def test_ascii_fast_path_equals_general():
    """The ASCII pre-tokenize fast path must match the general
    unicodedata-driven path exactly."""
    import random
    import string
    rng = random.Random(7)
    pool = string.ascii_letters + string.digits + string.punctuation \
        + " \t\n\r" + "\x00\x07\x7f"
    cases = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 60)))
             for _ in range(300)]
    cases += ["Hello, World!", "a\x00b", "x\ty\nz", "...", "", "A-B_c.d"]
    for s in cases:
        assert wp._pre_tokenize_ascii(s) == wp._pre_tokenize_general(s), \
            repr(s)
