"""duplicate_passages — cross-document repeated-passage spans
(operators/passages.py; Lee et al. 2022 exact-substring dedup mode)."""

from __future__ import annotations

from axora_spark.operators.passages import duplicate_passages


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted((r.doc_id, r.span_start, r.span_end, r.span_grams)
                  for r in df.collect())


def test_shared_passages_exact_spans(spark):
    # two 3-grams shared between A and B at different offsets; filler
    # words unique per doc; C unrelated. n=3: each shared passage is
    # exactly one dup 3-gram, gaps > n keep the islands separate.
    docs = _docs(spark, [
        (1, "x1 x2 x3 g1 g2 g3 y1 y2 y3 y4 g4 g5 g6 z1"),
        (2, "g1 g2 g3 q1 q2 q3 q4 q5 g4 g5 g6"),
        (3, "totally unrelated words in this third document here"),
    ])
    got = _spans(duplicate_passages(docs, n=3))
    assert got == [(1, 3, 5, 1), (1, 10, 12, 1),
                   (2, 0, 2, 1), (2, 8, 10, 1)]


def test_gap_exactly_n_merges_gap_above_splits(spark):
    # doc 4: hits at pos 0 and 3 (gap == n) -> ONE span [0, 5];
    # doc 5: hits at pos 0 and 4 (gap == n+1) -> TWO spans
    docs = _docs(spark, [
        (4, "g1 g2 g3 g4 g5 g6"),
        (5, "g1 g2 g3 f5 g4 g5 g6"),
        (6, "g1 g2 g3 e1 e2 e3 e4 g4 g5 g6"),
    ])
    got = {d: [(s, e, c) for dd, s, e, c in _spans(duplicate_passages(
        docs, n=3)) if dd == d] for d in (4, 5, 6)}
    assert got[4] == [(0, 5, 2)]
    assert got[5] == [(0, 2, 1), (4, 6, 1)]
    assert got[6] == [(0, 2, 1), (7, 9, 1)]


def test_within_doc_repetition_not_flagged(spark):
    # the SAME doc repeating a passage is not cross-document duplication
    docs = _docs(spark, [
        (1, "r1 r2 r3 mid r1 r2 r3"),
        (2, "other words entirely here now"),
    ])
    assert duplicate_passages(docs, n=3).count() == 0


def test_min_docs_threshold(spark):
    docs = _docs(spark, [
        (1, "s1 s2 s3 a1"), (2, "s1 s2 s3 b1"), (3, "s1 s2 s3 c1"),
        (4, "t1 t2 t3 d1"), (5, "t1 t2 t3 e1"),
    ])
    # min_docs=3: the s-gram (3 docs) qualifies, the t-gram (2) doesn't
    got = _spans(duplicate_passages(docs, n=3, min_docs=3))
    assert got == [(1, 0, 2, 1), (2, 0, 2, 1), (3, 0, 2, 1)]
    # min_docs=2 (the min!=max fast path) flags both
    assert len(_spans(duplicate_passages(docs, n=3, min_docs=2))) == 5


def _py_duplicate_passages(texts: dict[int, str], n: int,
                           min_docs: int = 2):
    """Pure-Python twin (the oracle-model style of oracle.py)."""
    grams: dict[int, list[str]] = {}
    for d, t in texts.items():
        w = [x for x in t.split() if x]
        grams[d] = [" ".join(w[i:i + n])
                    for i in range(len(w) - n + 1)] if len(w) >= n else []
    docs_of: dict[str, set[int]] = {}
    for d, gs in grams.items():
        for g in gs:
            docs_of.setdefault(g, set()).add(d)
    out = []
    for d, gs in grams.items():
        hits = sorted(i for i, g in enumerate(gs)
                      if len(docs_of[g]) >= min_docs)
        run: list[int] = []
        for p in hits:
            if run and p - run[-1] > n:
                out.append((d, run[0], run[-1] + n - 1, len(run)))
                run = []
            run.append(p)
        if run:
            out.append((d, run[0], run[-1] + n - 1, len(run)))
    return sorted(out)


def test_matches_python_twin_on_mixed_corpus(spark):
    # deterministic mixed corpus: common boilerplate + unique tails +
    # a doc too short for any n-gram
    boiler = "terms of service apply to all users of this site"
    texts = {i: f"u{i}a u{i}b {boiler} u{i}c u{i}d" for i in range(6)}
    texts[6] = "short doc"
    texts[7] = boiler + " " + boiler          # repeats boiler twice
    texts[8] = " ".join(f"only{j}" for j in range(20))
    docs = _docs(spark, sorted(texts.items()))
    for n in (3, 8):
        assert _spans(duplicate_passages(docs, n=n)) == \
            _py_duplicate_passages(texts, n=n)


def test_excise_passages_spans_removed_exactly(spark):
    from axora_spark.operators.passages import excise_passages
    import hashlib
    docs = _docs(spark, [
        (1, "a b c d e f g h"),      # span [2,4] -> keep a b f g h
        (2, "x y z"),                # no spans -> untouched
        (3, "p q r"),                # span covers everything -> empty
    ])
    spans = spark.createDataFrame(
        [(1, 2, 4), (3, 0, 2)],
        "doc_id long, span_start int, span_end int")
    got = {r.doc_id: (r.kept_words, r.dropped_words, r.clean_sha)
           for r in excise_passages(docs, spans).collect()}
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()  # noqa: E731
    assert got == {1: (5, 3, sha("a b f g h")),
                   2: (3, 0, sha("x y z")),
                   3: (0, 3, sha(""))}


def test_detect_then_excise_leaves_no_cross_doc_ngrams(spark):
    # closure property: after excising ALL duplicated-passage spans,
    # re-detecting on the surviving words finds nothing (n-grams that
    # straddle an excision seam are new strings, not corpus dups)
    from axora_spark.operators.passages import excise_passages
    from pyspark.sql import functions as F
    boiler = "one two three four five six seven eight nine ten"
    texts = {i: f"u{i}x u{i}y {boiler} u{i}z" for i in range(4)}
    docs = _docs(spark, sorted(texts.items()))
    spans = duplicate_passages(docs, n=8)
    assert spans.count() == 4
    joined = (docs.join(
        spans.groupBy("doc_id").agg(
            F.collect_list(F.struct("span_start", "span_end"))
            .alias("sp")), "doc_id", "left")
        .select("doc_id", F.array_join(F.filter(
            F.split(F.trim("text"), r"\s+"),
            lambda x, i: ~F.exists(
                F.coalesce("sp", F.array()),
                lambda s: (i >= s["span_start"])
                & (i <= s["span_end"]))), " ").alias("text")))
    assert duplicate_passages(joined, n=8).count() == 0
