"""contamination_check as a first-class parameterized operator
(VERDICT r4 #7): real eval-set DataFrame + n-gram width + threshold,
not just the self-synthesized driver fixture."""

from __future__ import annotations

from axora_spark.operators.decontam import contamination_check


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _evals(spark, rows):
    return spark.createDataFrame(rows, "bench_id long, text string")


def test_overlap_counts_distinct_ngrams(spark):
    # doc 1 contains the eval row's 10-word span -> 10-8+1 = 3 distinct
    # 8-grams shared; doc 2 shares none; doc 3 repeats the SAME 8-gram
    # twice (distinct count 1 < min_overlap -> not flagged)
    span = "a b c d e f g h i j"
    docs = _docs(spark, [
        (1, "x y " + span + " z"),
        (2, "totally different words with no shared eight gram at all"),
        (3, "a b c d e f g h a b c d e f g h"),
    ])
    evals = _evals(spark, [(100, span)])
    got = {(r.doc_id, r.bench_id): r.overlap_8grams
           for r in contamination_check(docs, evals, n=8,
                                        min_overlap=2).collect()}
    assert got == {(1, 100): 3}


def test_gopher_13gram_width(spark):
    # Gopher-style n=13: a 13-word exact span is exactly one 13-gram
    span = " ".join(f"w{i}" for i in range(13))
    docs = _docs(spark, [(1, "pre " + span + " post"), (2, span[:-1])])
    evals = _evals(spark, [(7, span)])
    hits = contamination_check(docs, evals, n=13, min_overlap=1)
    rows = hits.collect()
    assert [(r.doc_id, r.bench_id, r.overlap_13grams)
            for r in rows] == [(1, 7, 1)]


def test_multiple_eval_rows_independent_pairs(spark):
    s1 = "p q r s t u v w x"          # 9 words -> 2 distinct 8-grams
    s2 = "k l m n o p2 q2 r2 s2"
    docs = _docs(spark, [(1, s1), (2, s2), (3, s1 + " " + s2)])
    evals = _evals(spark, [(10, s1), (20, s2)])
    got = {(r.doc_id, r.bench_id): r.overlap_8grams
           for r in contamination_check(docs, evals,
                                        min_overlap=1).collect()}
    assert got == {(1, 10): 2, (2, 20): 2, (3, 10): 2, (3, 20): 2}


def test_short_docs_and_evals_drop_cleanly(spark):
    docs = _docs(spark, [(1, "only seven words here not eight ok"),
                         (2, "")])
    evals = _evals(spark, [(1, "short"), (2, "")])
    assert contamination_check(docs, evals, min_overlap=1).count() == 0
