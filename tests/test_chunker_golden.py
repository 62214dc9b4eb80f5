"""C2 golden fixture — pins the markdown chunker's exact behavior
(heading-hierarchy path prefix + 50-char overlap, the langchaingo
MarkdownTextSplitter semantics of crawler/chunking.go:98-109).

Documented divergences from langchaingo (SEMANTICS.md): heading path is
re-rendered as `#`·level lines (langchaingo keeps original lines — same
content for well-formed fixtures); chunk_size is 512 chars (langchaingo
counts by characters too, default 512). Any change to the splitter must
consciously update this golden."""

from __future__ import annotations

import re

from axora_spark.operators.chunking import chunk_markdown_py, chunk_sentence_py

MD = """# Title

Intro paragraph one. It has two sentences.

## Section A

Alpha body text that is fairly short.

### Sub A1

Deep section body. More words here to give the splitter something. \
Another sentence tail.

## Section B

""" + " ".join(f"w{i}" for i in range(220)) + """

Closing line.
"""


def test_markdown_chunker_golden():
    chunks = chunk_markdown_py(MD)
    assert len(chunks) == 6
    assert chunks[0] == "# Title\nIntro paragraph one. It has two sentences."
    assert chunks[1] == ("# Title\n## Section A\n"
                         "Alpha body text that is fairly short.")
    assert chunks[2] == ("# Title\n## Section A\n### Sub A1\n"
                         "Deep section body. More words here to give the "
                         "splitter something. Another sentence tail.")
    # long section recurses into the character splitter, heading path
    # prefixed onto every sub-chunk
    for c in chunks[3:]:
        assert c.startswith("# Title\n## Section B\n")
    assert chunks[3].split("\n")[2].startswith("w0 w1 ")
    assert chunks[5].endswith("Closing line.")


def test_markdown_chunker_no_content_loss_and_overlap():
    chunks = chunk_markdown_py(MD)
    covered = set()
    for c in chunks:
        covered.update(re.findall(r"w\d+", c))
    assert covered == {f"w{i}" for i in range(220)}
    # adjacent sub-chunks of the long section share the 50-char overlap
    w3 = re.findall(r"w\d+", chunks[3])
    w4 = re.findall(r"w\d+", chunks[4])
    assert set(w3) & set(w4), "no overlap carried between sub-chunks"


def test_sentence_chunker_golden():
    chunks = chunk_sentence_py("One. Two! Three? " + "pad " * 200)
    assert len(chunks) == 2
    assert chunks[0].startswith("One. Two! Three? pad")
    assert len(chunks[0]) <= 512 + 4  # keep-separator slack
    # overlap: tail of chunk 0 reappears at the head of chunk 1
    assert chunks[1].startswith("pad")


def test_heading_only_levels_render():
    chunks = chunk_markdown_py("# A\n\nbody a\n\n#### Deep\n\nbody d")
    assert chunks[0] == "# A\nbody a"
    # level-4 heading under level-1: intermediate levels are empty and
    # skipped in the rendered path
    assert chunks[1] == "# A\n#### Deep\nbody d"
