"""C1–C4 + X10: chunker determinism, token gate, Spark↔Python parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axora_spark.operators.chunking import (CHUNK_SIZE, chunk_gate,
                                            chunk_markdown_py,
                                            chunk_sentence_py, chunk_text_py,
                                            token_count_col, token_count_py)


def test_dispatcher_rejects_unknown():
    with pytest.raises(ValueError):
        chunk_text_py("x", "nope")


def test_sentence_chunker_bounds():
    text = ". ".join(f"sentence number {i} with several words" for i in range(200))
    chunks = chunk_sentence_py(text)
    assert len(chunks) > 1
    assert all(len(c) <= CHUNK_SIZE + 60 for c in chunks)  # overlap slack
    assert all(c == c.strip() and c for c in chunks)
    # deterministic
    assert chunks == chunk_sentence_py(text)


def test_markdown_chunker_heading_hierarchy():
    md = ("# Top\n\nintro text here\n\n## Sub\n\nsub body text\n\n"
          "# Second\n\nmore body")
    chunks = chunk_markdown_py(md)
    assert any(c.startswith("# Top") for c in chunks)
    # a subsection chunk carries its heading path
    sub = [c for c in chunks if "## Sub" in c]
    assert sub and sub[0].startswith("# Top")
    assert any(c.startswith("# Second") for c in chunks)


def test_markdown_long_section_recurses():
    body = " ".join(f"word{i}" for i in range(400))
    md = f"# H\n\n{body}"
    chunks = chunk_markdown_py(md)
    assert len(chunks) > 1
    assert all(c.startswith("# H") for c in chunks)


def test_token_count_py():
    assert token_count_py("") == 0
    assert token_count_py("a bb ccc dddd") == 4       # all ceil(len/4)=1
    assert token_count_py("abcdefgh") == 2            # ceil(8/4)
    assert token_count_py("  spaced   out  ") == 3  # ceil(6/4)+ceil(3/4)


def test_token_gate_bounds():
    # 75 and 480 inclusive; below/above excluded (chunking.go:139-144)
    assert not (74 >= 75)
    lo = "word " * 74   # 74 tokens of len 4 → 74
    ok = "word " * 75
    hi = "word " * 480
    over = "word " * 481
    assert token_count_py(lo) == 74 and token_count_py(ok) == 75
    assert token_count_py(hi) == 480 and token_count_py(over) == 481


def test_token_count_spark_parity(spark):
    texts = ["", "a bb ccc dddd", "abcdefgh", "  spaced   out  ",
             "word " * 75, "longword" * 3 + " x",
             "punct, here! and; stuff?"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text", token_count_col(F.col("text")).alias("tc")).collect()
    for r in rows:
        assert r.tc == token_count_py(r.text), repr(r.text)


def test_gate_column(spark):
    df = spark.createDataFrame([(i,) for i in [74, 75, 480, 481]], "tc int")
    kept = [r.tc for r in df.filter(chunk_gate(F.col("tc"))).collect()]
    assert sorted(kept) == [75, 480]
