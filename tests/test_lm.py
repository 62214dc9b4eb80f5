"""CCNet-style bigram-LM perplexity scoring (queries.q_lm_perplexity):
engine ≡ pure-Python model on a hand-built corpus, plus the semantic
contract the filter exists for — repetitive (low-entropy) text lands in
the head tercile, shuffled/rare-word text in the tail."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from axora_spark import queries as Q

ALPHA = 0.5


def _py_lm_scores(texts: dict[int, str]) -> dict[int, tuple[int, float]]:
    """doc_id -> (n_bigrams, nats/bigram) under the exact operator model:
    add-alpha bigram LM trained on the same corpus, V = distinct context
    types."""
    bigrams: dict[int, list[tuple[str, str]]] = {}
    c12: Counter = Counter()
    for d, t in texts.items():
        w = [x for x in t.lower().split() if x]
        bg = list(zip(w, w[1:]))
        bigrams[d] = bg
        c12.update(bg)
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    v = len(c1)
    out = {}
    for d, bg in bigrams.items():
        if not bg:
            continue
        nats = [-math.log((c12[p] + ALPHA) / (c1[p[0]] + ALPHA * v))
                for p in bg]
        out[d] = (len(bg), sum(nats) / len(bg))
    return out


CORPUS = {
    # doc 1: pure repetition — every bigram seen many times -> head
    1: "the cat sat on the mat " * 8,
    2: "the cat sat on the mat and the cat sat again on the mat",
    3: "the dog sat on the mat while the cat sat on the rug",
    # doc 4: every bigram unique in the corpus -> tail
    4: "zephyr quixotic brambles vellum ostrich kaleidoscope unguent",
    5: "the mat sat on the cat and the rug sat on the dog",
    6: "on the mat the cat sat and sat the cat on the mat",
}


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lm")
    rows = [(i, "web" if i % 2 else "books", t)
            for i, t in CORPUS.items()]
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .write.parquet(str(d / "documents.parquet"))
    df = Q.q_lm_perplexity(spark, str(d))
    return {r.doc_id: r for r in df.collect()}


def test_scores_match_pure_python_model(result):
    exp = _py_lm_scores(CORPUS)
    assert set(result) == set(exp)
    for d, (nb, nats) in exp.items():
        assert result[d].n_bigrams == nb
        assert result[d].nats == pytest.approx(round(nats, 6), abs=2e-6)


def test_tercile_semantics(result):
    exp = _py_lm_scores(CORPUS)
    # repetition is cheap under the corpus LM, novelty expensive
    assert exp[1][1] < exp[4][1]
    # per-source rank-based terciles: 3 docs per source -> one doc per
    # tercile, ordered by score
    for src in ("web", "books"):
        docs = sorted((d for d in result if result[d].source == src),
                      key=lambda d: (round(exp[d][1], 9), d))
        assert [result[d].tercile for d in docs] == [1, 2, 3]
    # keep = head + middle (CCNet keeps the low-perplexity 2/3)
    for d, r in result.items():
        assert r.keep == (r.tercile <= 2)
    assert result[1].tercile == 1 and result[1].keep
    # doc 4 is the most surprising doc in its source -> tail, dropped
    assert result[4].tercile == 3 and not result[4].keep


def test_short_docs_excluded(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lm_short")
    rows = [(1, "web", "solo"), (2, "web", ""),
            (3, "web", "two words here")]
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in Q.q_lm_perplexity(spark, str(d)).collect()}
    # <2 words -> no bigrams -> no row (documented inner semantics)
    assert set(got) == {3}
    assert got[3].n_bigrams == 2


def test_two_corpus_form(spark, tmp_path_factory):
    """CCNet's actual shape: train on a trusted corpus, score another.
    Contract: inner join on (w1, w2) — only bigrams the trusted model
    can judge count, docs with no judgeable bigram emit no row."""
    from axora_spark.operators.lm import lm_perplexity

    train_texts = {101: "the cat sat on the mat",
                   102: "the dog sat on the rug"}
    score_texts = {1: "the cat sat on the rug",   # all bigrams in-model
                   2: "the cat ate fish today",   # only 'the cat' judged
                   3: "zebras juggle flaming swords"}  # nothing judged
    mk = lambda d: spark.createDataFrame(
        [(i, "s", t) for i, t in d.items()],
        "doc_id long, source string, text string")
    got = {r.doc_id: r for r in
           lm_perplexity(mk(score_texts), train=mk(train_texts))
           .collect()}

    # pure-python twin: model from TRAIN only, inner-join semantics
    c12, c1 = Counter(), Counter()
    for t in train_texts.values():
        w = t.lower().split()
        c12.update(zip(w, w[1:]))
    for (w1, _), c in c12.items():
        c1[w1] += c
    v = len(c1)
    for d, t in score_texts.items():
        w = t.lower().split()
        judged = [p for p in zip(w, w[1:]) if p in c12]
        if not judged:
            assert d not in got
            continue
        nats = [-math.log((c12[p] + ALPHA) / (c1[p[0]] + ALPHA * v))
                for p in judged]
        assert got[d].n_bigrams == len(judged)
        assert got[d].nats_raw == pytest.approx(sum(nats) / len(nats),
                                                rel=1e-12)
    assert set(got) == {1, 2}
    # doc 1 is fluent under the model, doc 2's one judged bigram is
    # common — but doc 1's mean must beat doc 2's unseen-heavy text on
    # judged-count, the quantity a mixing pipeline gates on
    assert got[1].n_bigrams > got[2].n_bigrams
