"""N-gram language-model scoring (CCNet, Wenzek et al. LREC 2020).

CCNet scores every document with an LM trained on a TRUSTED corpus
(Wikipedia) and keeps the low-perplexity head/middle of the
distribution. This module is the two-corpus form of that operator —
``lm_perplexity(docs, train)`` trains an add-α bigram LM on `train`
and scores `docs`; ``train=None`` is the self-scoring single-corpus
form the driver query registers (queries.q_lm_perplexity). The
production swap is KenLM behind the same join shape; everything here
is deterministic so the score is oracle-verifiable bit-for-bit.

Scale shape (the tfidf lesson applied to an LM): each corpus's token
stream collapses to per-doc bigram TYPE counts in ONE keyed
aggregation — the only token-volume exchange per corpus. The model
(c12, c1, V) derives from the train-side aggregate at type grain; the
scored join is per-doc-type ⋈ model on (w1, w2), SHUFFLE_HASH-pinned
because the vocabulary is unbounded at web scale (sandbox stats would
broadcast it — the plan that dies at 100 TB; plan-gated); the per-doc
reduce Σ cnt·(-ln P) / Σ cnt equals the token-stream mean without
re-touching token rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axora_spark.functions.words import words_col

DEFAULT_ALPHA = 0.5  # add-α smoothing; exact in doubles (integer + 0.5)


def bigram_types(docs: DataFrame, materialize: bool = False) -> DataFrame:
    """(doc_id, source, h1, hb, cnt): per-doc lowercased bigram-type
    counts — the one token-level aggregation. h1 = xxhash64(w1) keys
    the context, hb = xxhash64(w1, w2) keys the pair: the token-volume
    exchange and every downstream aggregation/join move and compare
    8-byte longs instead of word strings (guide §2.3 'shuffle keys
    instead of payloads' — no downstream consumer ever needs the words
    back, only equality). Equal bigrams map to equal keys by
    construction; distinct bigrams collide at the accepted 64-bit
    class (the gram-key/url_hash convention; a collision perturbs one
    count in ~2^64).

    materialize=True lazily checkpoints it for dual consumers (the
    self-scoring path feeds both the model aggregation and the scored
    join; branches don't bridge via exchange reuse). Single-consumer
    frames (both sides of the two-corpus path) skip the checkpoint —
    it would only pin token-scale blocks in executor storage for
    nothing (code-review r5)."""
    wd = docs.select("doc_id", "source",
                     words_col(F.lower(F.col("text"))).alias("w"))
    n = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.zip_with(F.slice(F.col("w"), F.lit(1), n),
                       F.slice(F.col("w"), F.lit(2), n),
                       lambda a, b: F.struct(
                           F.xxhash64(a).alias("h1"),
                           F.xxhash64(a, b).alias("hb")))
    bg = (wd.select("doc_id", "source", F.explode(pairs).alias("p"))
          .select("doc_id", "source", "p.h1", "p.hb"))
    tf = (bg.groupBy("doc_id", "source", "h1", "hb")
          .agg(F.count("*").alias("cnt")))
    return tf.localCheckpoint(eager=False) if materialize else tf


def bigram_model(train_tf: DataFrame,
                 alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """(hb, nats) add-α conditional bigram model from a bigram_types
    frame: P(w2|w1) = (c12 + α) / (c1 + α·V), V = distinct context
    types, keyed by the 64-bit pair hash hb (h1 keys the context
    aggregation internally and is dropped — hb alone identifies the
    pair for the scored join). Type-grain keyed aggregations + one
    SHUFFLE_HASH join; the only broadcast is the 1-row V scalar."""
    c12 = train_tf.groupBy("h1", "hb").agg(F.sum("cnt").alias("c12"))
    c1 = c12.groupBy("h1").agg(F.sum("c12").alias("c1"))
    v = c1.agg(F.count("*").alias("v"))
    return (c12.join(c1.hint("shuffle_hash"), "h1")
            .crossJoin(F.broadcast(v))
            .withColumn("nats",
                        -F.log((F.col("c12") + alpha)
                               / (F.col("c1") + alpha * F.col("v"))))
            .select("hb", "nats"))


def lm_perplexity(docs: DataFrame, train: DataFrame | None = None,
                  alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """(doc_id, source, n_bigrams, nats_raw): mean model cross-entropy
    (nats/bigram) of every `docs` document under the LM trained on
    `train` (default: docs itself — the driver-query form).

    Judged-bigram contract: any (w1, w2) PAIR absent from train drops
    out of the inner join — including novel continuations of a known
    context, for which the add-α model would define a smoothed penalty
    α/(c1+αV). nats_raw is therefore the mean over the doc's judged
    bigrams only (it biases fluent-side for disfluent docs); pair it
    with n_bigrams — the judged count — which is the coverage signal a
    mixing pipeline gates on. The smoothed-penalty variant is a left
    join on (w1, w2) plus a w1-keyed fallback join; this operator
    keeps the single model join. Docs with no judgeable bigram emit no
    row."""
    docs_tf = bigram_types(docs, materialize=train is None)
    train_tf = docs_tf if train is None else bigram_types(train)
    model = bigram_model(train_tf, alpha)
    return (docs_tf.join(model.hint("shuffle_hash"), ["hb"])
            .groupBy("doc_id", "source")
            .agg(F.sum("cnt").alias("n_bigrams"),
                 (F.sum(F.col("cnt") * F.col("nats"))
                  / F.sum("cnt")).alias("nats_raw")))
