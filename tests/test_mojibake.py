"""Mojibake detector (queries.q_mojibake): the deterministic injection
fires exactly on doc_id % 7 == 0, counts scale with the repeat factor,
and every marker is a multiple of the per-blob count."""

from __future__ import annotations

from axora_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_injection_and_counts(spark):
    rows = Q.q_mojibake(spark, SF).collect()
    dirty = [r for r in rows if not r.clean]
    assert dirty and all(r.doc_id % 7 == 0 for r in dirty)
    assert all(r.clean for r in rows if r.doc_id % 7 != 0)
    for r in dirty:
        blobs = 1 + r.doc_id % 3
        # the blob carries one of each of the 4 markers
        assert r.moji_total == 4 * blobs
        assert r.n_replacement == blobs
    assert all(r.moji_total == 0 and r.n_replacement == 0
               for r in rows if r.clean)
