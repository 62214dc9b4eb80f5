"""Cross-document duplicated-passage detection — the exact-substring
dedup mode of a training-data pipeline (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better": repeated ≥50-token
substrings across a corpus; their suffix-array formulation is
single-machine, this is the Spark-native equivalent over word n-grams).

Complements the existing dedup family: exact dedup drops whole-document
copies, minhash/Jaccard drop near-identical documents — this operator
finds SHARED PASSAGES inside otherwise-distinct documents (boilerplate,
quoted licenses, syndicated paragraphs) and reports their word spans so
a downstream pass can excise the span rather than the document.

Scale shape (the honest 100-TB accounting):
  * one generate fans each doc into (pos, n-gram) rows — map-only, the
    decontam n-gram fold (no per-row array_distinct, no re-slicing);
  * grams key as xxhash64 (8 bytes) — the shuffle moves hashes, never
    the n-gram strings (~n× smaller exchange; a 64-bit collision flags
    one spurious position pair in ~2^64, acceptable for flagging);
  * TWO keyed exchanges over the gram stream are inherent (one to
    count docs per gram, one to route positions to their gram's
    verdict) — same order as the minhash signature shuffle; the
    duplicated-key side arrives at the join partially aggregated and
    pre-filtered, so on a mostly-clean corpus AQE broadcasts it and
    the second exchange disappears (observed at fixture scale);
  * span assembly is one exchange keyed on doc_id: the lag/cumsum
    gaps-and-islands windows and the final island aggregate all reuse
    that single partitioning (groupBy(doc_id, island) is satisfied by
    hashpartitioning(doc_id) — no further exchange, verified in
    PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from axora_spark.functions.words import words_col
from axora_spark.operators.decontam import ngram_keys_of_words


def duplicate_passages(docs: DataFrame, n: int = 8,
                       min_docs: int = 2) -> DataFrame:
    """docs(doc_id, text) → (doc_id, span_start, span_end, span_grams):
    maximal word-position spans [span_start, span_end] (0-based,
    inclusive) covered by word n-grams that occur in ≥ min_docs DISTINCT
    documents; span_grams counts the duplicated n-grams merged into the
    span. Two spans merge while their covered ranges overlap or touch
    (position gap ≤ n); a doc repeating a passage only WITHIN itself is
    not flagged (cross-document is the contract).

    min_docs=2 reduces via min≠max over doc_id — a plain partial
    aggregate; higher thresholds pay count_distinct (still two-phase)."""
    words = (docs.select("doc_id", words_col(F.col("text")).alias("w"))
             .filter(F.size("w") >= n))
    # gram keys WITHOUT ever building n-gram strings (r6 —
    # decontam.ngram_keys_of_words: word-hash fold, measured
    # 1.50 → 1.19 s per gram pass at sf1.0; key_i covers words
    # [i, i+n), the same positional contract the string form had).
    # posexplode_OUTER + post-filter (the decontam/q_html_links trap:
    # plain explode would infer a size()>0 pre-filter that re-evaluates
    # the whole key fold as a predicate)
    grams = (words
             .select("doc_id",
                     ngram_keys_of_words(F.col("w"), n).alias("g"))
             .select("doc_id",
                     F.posexplode_outer("g").alias("pos", "gk"))
             .filter(F.col("gk").isNotNull()))
    if min_docs <= 2:
        dup_keys = (grams.groupBy("gk")
                    .agg(F.min("doc_id").alias("_mn"),
                         F.max("doc_id").alias("_mx"))
                    .filter(F.col("_mn") != F.col("_mx"))
                    .select("gk"))
    else:
        dup_keys = (grams.groupBy("gk")
                    .agg(F.count_distinct("doc_id").alias("_nd"))
                    .filter(F.col("_nd") >= min_docs)
                    .select("gk"))
    hits = grams.join(dup_keys, "gk").select("doc_id", "pos")

    # gaps-and-islands over the (sparse) hit positions: both windows and
    # the final aggregate share the one hashpartitioning(doc_id)
    w = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    brk = F.when(gap > n, 1).otherwise(0)  # NULL gap (first row) → 0
    island = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (hits.withColumn("_island", island)
            .groupBy("doc_id", "_island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + (n - 1)).alias("span_end"),
                 F.count("*").cast("int").alias("span_grams"))
            .drop("_island"))


def excise_passages(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """The ACT half of exact-substring dedup (Lee et al. excise the
    duplicated substring, not the document): drop every word position
    covered by a span. docs(doc_id, text); spans(doc_id, span_start,
    span_end) — typically duplicate_passages output, but any span
    table with the same contract works (so policy — keep first
    occurrence corpus-wide, length floors, … — stays a span-table
    transformation, not an operator variant).

    Output: (doc_id, kept_words, dropped_words, clean_sha) — the sha256
    of the space-rejoined surviving words, which both keeps the driver
    comparison value-exact and avoids shipping full cleaned text
    through the result (callers wanting the text use `clean_text_col`
    on the same join).

    Shape: spans aggregate to one array per doc (output-of-detection
    sized), ONE keyed left join onto docs, then a map-only positional
    filter (2-arg HOF lambda = (element, index)) — O(words × doc_spans)
    per row, no explode, no second shuffle. Docs without spans pass
    through with dropped_words = 0."""
    sp = (spans.groupBy("doc_id")
          .agg(F.collect_list(F.struct("span_start", "span_end"))
               .alias("_spans")))
    joined = (docs.join(sp, "doc_id", "left")
              .select("doc_id", words_col(F.col("text")).alias("w"),
                      F.coalesce("_spans", F.array()).alias("sp")))
    kept = F.filter(
        F.col("w"),
        lambda x, i: ~F.exists(
            F.col("sp"), lambda s: (i >= s["span_start"])
            & (i <= s["span_end"])))
    return (joined
            .select("doc_id", F.col("w").alias("_w"), kept.alias("_k"))
            .select("doc_id",
                    F.size("_k").alias("kept_words"),
                    (F.size("_w") - F.size("_k")).alias("dropped_words"),
                    F.sha2(F.array_join("_k", " "), 256)
                    .alias("clean_sha")))
