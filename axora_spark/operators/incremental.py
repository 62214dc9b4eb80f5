"""Incremental near-duplicate ingest — dedupe each NEW batch of
documents against the accumulated corpus WITHOUT reprocessing it.

The batch (full-corpus) near-dup family in operators/neardup.py
re-blocks everything on every run; a production crawl/training-data
pipeline ingests waves and must answer "is this new doc a near-dup of
anything we already kept?" at per-wave cost. The standard design (the
one behind every minhash-LSH dedup service): persist only the MINHASH
SIGNATURES of surviving documents (n_perm strings per doc — constant
bytes per doc, no text retained), band them, and bucket-join each new
batch's bands against the store. Estimated Jaccard = fraction of
agreeing signature positions (the unbiased minhash estimator) verifies
candidates without ever re-reading stored text.

Scale accounting:
  * signature computation is the one-sha256-per-shingle digest-slice
    family of q_minhash_signature — map-only over the new batch;
  * the candidate join keys on (band, band_key): the new side is
    batch-sized; the store side is corpus-sized but 4 rows/doc of
    ~70 bytes — and because the store is an append-only catalog table,
    a production deployment writes it BUCKETED by band_key
    (operators/bucketed.py proves the no-reshuffle pattern), making
    the store-side exchange a one-time cost, not per-wave;
  * verification joins signatures (broadcastable batch side) and the
    final per-doc reduce is min/min_by — partial-aggregating.

dup_of chains to the smallest qualifying id (store doc or earlier
same-batch doc), matching the leader contract of ngram_jaccard_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axora_spark.catalog import SnapshotCatalog
from axora_spark.functions.words import shingles_of_words, words_col

N_PERM_DEFAULT = 8


def minhash_sig_array(docs: DataFrame,
                      n_perm: int = N_PERM_DEFAULT) -> DataFrame:
    """docs(doc_id, text) → (doc_id, sig: array<string>) — the
    digest-slice one-hash minhash family of q_minhash_signature
    (permutation i = min over shingles of the i-th 8-hex-char slice of
    sha256(shingle)), kept in array form for the signature store.
    Docs with < 3 words have no shingles and are dropped (nothing to
    compare — exact dedup owns empty/short docs)."""
    words = (docs.select("doc_id", words_col(F.col("text")).alias("w"))
             .filter(F.size("w") >= 3))
    sh = words.select("doc_id", shingles_of_words(F.col("w")).alias("sh"))
    hashed = sh.select(
        "doc_id",
        F.transform(F.col("sh"), lambda s: F.sha2(s, 256)).alias("hs"))

    def _slice_min(lo: int):
        # closure factory, NOT a lambda default arg (the transform
        # (element, index) overload trap)
        return F.array_min(F.transform(
            F.col("hs"), lambda h: F.substring(h, lo, 8)))

    return hashed.select(
        "doc_id",
        F.array(*[_slice_min(i * 8 + 1) for i in range(n_perm)])
        .alias("sig"))


def _bands(sigs: DataFrame, rows_per_band: int,
           n_perm: int, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, sig) → (doc_id, *keep, band, band_key); band key =
    sorted concat of the band's slice (the band_buckets convention).
    `keep` columns ride the explode — callers needing a flag per band
    row pass it through here instead of joining it back on doc_id
    (r6: that join re-shuffled the whole banded corpus AND re-ran the
    signature subtree a second time just to recover is_store)."""
    n_bands = n_perm // rows_per_band
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("|", F.array_sort(
                     F.slice(F.col("sig"), b * rows_per_band + 1,
                             rows_per_band))).alias("band_key"))
        for b in range(n_bands)])
    return (sigs.select("doc_id", *keep, F.explode(bands).alias("bk"))
            .select("doc_id", *keep, F.col("bk.band").alias("band"),
                    F.col("bk.band_key").alias("band_key")))


def incremental_near_dup(new_sigs: DataFrame, store_sigs: DataFrame,
                         threshold: float = 0.5,
                         rows_per_band: int = 2,
                         n_perm: int = N_PERM_DEFAULT,
                         round_to: int = 6,
                         max_bucket: int | None = None,
                         handles: list | None = None) -> DataFrame:
    """(doc_id, dup_of, est_jaccard) for NEW docs only. A new doc is a
    dup if it shares ≥1 LSH band with a store doc or a SMALLER-id doc
    of the same batch AND the signature-agreement estimate of Jaccard
    ≥ threshold; dup_of is the smallest qualifying partner.

    max_bucket caps degenerate (band, band_key) buckets exactly like
    lsh_candidate_pairs: on a template-heavy corpus one boilerplate
    band key can hold thousands of docs and the candidate join goes
    batch×bucket — capped buckets are DROPPED (their members still
    pair through their other, more selective bands). Measured on the
    e2e bench's homogeneous synthetic corpus (BENCH/BASELINE.md)."""
    # doc_ids present in BOTH inputs (a replayed batch whose survivors
    # already landed in the store) keep only their STORE copy —
    # first-ingested-wins, the merge_insert_if_absent convention.
    # Without this dedupe a replayed doc's band rows appear twice and
    # the is_store join fans them ×2, inflating max_bucket's _bsz so a
    # replay could re-derive DIFFERENT assignments (code-review r5,
    # demonstrated: cap 4, first run {2→1}, replay []) — the
    # exactly-once argument of streaming/dedup.py needs replays to be
    # bit-identical, capped or not.
    allsig = (store_sigs.select("doc_id", "sig",
                                F.lit(True).alias("is_store"))
              .unionByName(
                  new_sigs.join(store_sigs.select("doc_id"),
                                "doc_id", "left_anti")
                  .select("doc_id", "sig",
                          F.lit(False).alias("is_store"))))
    # allsig feeds THREE consumers (the band explode, the verification
    # partner-sig join, the new-side sig join) — when the inputs are
    # derived from text (q_neardup_incremental's shape) each reference
    # re-ran the whole sha256-per-shingle signature pass. Materialize
    # once (lazy); loop callers pass `handles` and release after their
    # output is materialized (the pagerank/_dedup_pass protocol).
    allsig = allsig.localCheckpoint(eager=False)
    if handles is not None:
        handles.append(allsig)
    ob = _bands(allsig, rows_per_band, n_perm, keep=("is_store",))
    if max_bucket is not None:
        sizes = (ob.groupBy("band", "band_key")
                 .agg(F.count("*").alias("_bsz")))
        ob = (ob.join(sizes, ["band", "band_key"])
              .filter(F.col("_bsz") <= max_bucket).drop("_bsz"))
    # the new side IS ob minus store rows (the SQL oracle's own
    # derivation) — one band computation, and the cap filter above
    # applies to both sides at once. Replayed already-stored docs are
    # absent here, so they produce no (re-)assignments — their sigs
    # re-offer and the caller's keyed sink drops them.
    nb = ob.filter(~F.col("is_store")).drop("is_store")
    a, b = nb.alias("a"), ob.alias("b")
    # b.doc_id != a.doc_id: a doc is never a near-dup of ITSELF — when
    # a batch is REPLAYED after a partial commit (streaming at-least-
    # once, crash-resume), its survivors' sigs are already in the store
    # under the same doc_id and must not self-match (streaming/dedup.py
    # builds its exactly-once argument on this)
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("b.doc_id") != F.col("a.doc_id"))
                   & (F.col("b.is_store")
                      | (F.col("b.doc_id") < F.col("a.doc_id"))))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("partner"))
            .distinct())
    # sa from the checkpointed union, not new_sigs: cand's doc_ids are
    # exactly allsig's non-store rows (replayed docs are absent from
    # BOTH), so the inner join result is identical and the new batch's
    # signature subtree is not evaluated a second time.
    sa = (allsig.filter(~F.col("is_store"))
          .select(F.col("doc_id"), F.col("sig").alias("sa")))
    sb = allsig.select(F.col("doc_id").alias("partner"),
                       F.col("sig").alias("sb"))
    est = F.round(
        F.size(F.filter(F.zip_with(F.col("sa"), F.col("sb"),
                                   lambda x, y: x == y),
                        lambda v: v)).cast("double") / n_perm, round_to)
    verified = (cand.join(sa, "doc_id").join(sb, "partner")
                .select("doc_id", "partner", est.alias("est"))
                .filter(F.col("est") >= threshold))
    return (verified.groupBy("doc_id")
            .agg(F.min("partner").alias("dup_of"),
                 F.min_by("est", "partner").alias("est_jaccard")))


def dedup_ingest(spark: SparkSession, catalog: SnapshotCatalog,
                 new_docs: DataFrame, table: str = "sigs",
                 threshold: float = 0.5, rows_per_band: int = 2,
                 n_perm: int = N_PERM_DEFAULT,
                 max_bucket: int | None = None) -> DataFrame:
    """Ingest a (doc_id, text) batch against the catalog's signature
    store: returns the dup assignments for the batch and appends the
    SURVIVORS' signatures to `table` (append-only — the store never
    holds text). Returns (doc_id, dup_of, est_jaccard); callers drop
    those doc_ids from the batch before admitting it.

    The returned frame is an EAGER localCheckpoint (it must survive
    the release of the signature frame it derives from) — the CALLER
    owns its storage: checkpoints.release it once fully consumed, or
    it pins one RDD per call for the session (the r5 no-op-unpersist
    lesson; plans/content.py's sink and streaming/dedup.py both
    release theirs)."""
    from axora_spark.checkpoints import release as release_checkpoint
    new_sigs = minhash_sig_array(new_docs, n_perm) \
        .localCheckpoint(eager=True)  # used thrice: assign ×2 + append
    try:
        if catalog.table_exists(table):
            store = catalog.read(spark, table)
        else:
            catalog.create_table(table, new_sigs.schema)
            store = spark.createDataFrame([], new_sigs.schema)
        # assigns checkpoints eagerly (it is batch-bounded tiny) so the
        # big signature frame can be RELEASED before returning — the
        # r5 lesson: DataFrame.unpersist() is a no-op for
        # localCheckpoint storage, only checkpoints.release frees it
        inner: list = []
        try:
            assigns = incremental_near_dup(
                new_sigs, store, threshold=threshold,
                rows_per_band=rows_per_band, n_perm=n_perm,
                max_bucket=max_bucket, handles=inner) \
                .localCheckpoint(eager=True)
        finally:
            for h in inner:
                release_checkpoint(h)
        survivors = new_sigs.join(assigns.select("doc_id"),
                                  "doc_id", "left_anti")
        # skip_empty: an all-dup batch must not commit an empty data
        # dir + snapshot (the long-session dir-per-wave accretion the
        # append docstring warns about)
        catalog.append(spark, table, survivors, skip_empty=True)
        return assigns
    finally:
        release_checkpoint(new_sigs)
