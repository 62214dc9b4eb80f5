"""Sequence packing (queries.q_seq_packing): block spans against a
hand-folded pure-Python packing, including boundary-spanning documents
and per-source stream independence."""

from __future__ import annotations

import math

from axora_spark import queries as Q
from axora_spark.queries import _PACK_L


def _est_tokens(text: str) -> int:
    return sum(math.ceil(len(w) / 4) for w in text.split() if w)


def test_block_spans_match_pure_fold(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    # doc 2's token run crosses a block boundary by construction:
    # ~1500 estimated tokens per doc, L=2048
    rows = [(i, "web" if i % 2 else "books",
             ("tok{} ".format(i) * 1500)) for i in range(1, 9)]
    rows.append((99, "web", ""))            # empty: no row
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in Q.q_seq_packing(spark, str(d)).collect()}

    # pure fold per source in doc_id order
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, s, t in sorted(rows):
        n = _est_tokens(t)
        if n >= 1:
            by_src.setdefault(s, []).append((i, n))
    want = {}
    for s, docs in by_src.items():
        off = 0
        for i, n in docs:
            want[i] = (s, n, off, off // _PACK_L,
                       (off + n - 1) // _PACK_L)
            off += n
    assert set(got) == set(want)            # empty doc 99 absent
    for i, (s, n, off, fb, lb) in want.items():
        r = got[i]
        assert (r.source, r.n_tok, r.start_off, r.first_block,
                r.last_block) == (s, n, off, fb, lb), i
        assert r.n_blocks == lb - fb + 1
    # at least one doc spans a block boundary, or the test is vacuous
    assert any(r.n_blocks > 1 for r in got.values())
    # streams are per-source: both sources start at offset 0
    firsts = {r.source: min(x.start_off for x in got.values()
                            if x.source == r.source)
              for r in got.values()}
    assert set(firsts.values()) == {0}
