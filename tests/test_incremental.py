"""Incremental near-dup ingest (operators/incremental.py): per-batch
dedup against an append-only signature store, twin-verified against a
pure-Python minhash model."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from axora_spark.operators.incremental import (dedup_ingest,
                                               incremental_near_dup,
                                               minhash_sig_array)

N_PERM = 8


def _py_sig(text: str, n_perm: int = N_PERM):
    w = [x for x in text.split() if x]
    sh = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
    if not sh:
        return None
    hs = [hashlib.sha256(s.encode()).hexdigest() for s in sh]
    return [min(h[i * 8:(i + 1) * 8] for h in hs) for i in range(n_perm)]


def _py_bands(sig, rpb: int = 2):
    return {(b, "|".join(sorted(sig[b * rpb:(b + 1) * rpb])))
            for b in range(len(sig) // rpb)}


def _py_assign(new: dict, store: dict, threshold: float = 0.5):
    """id -> (dup_of, est) over raw texts, mirroring the operator."""
    nsig = {d: _py_sig(t) for d, t in new.items()}
    osig = {d: _py_sig(t) for d, t in store.items()}
    out = {}
    for d, sd in sorted(nsig.items()):
        if sd is None:
            continue
        pool = {**{o: s for o, s in osig.items() if s is not None},
                **{o: s for o, s in nsig.items()
                   if s is not None and o < d}}
        best = None
        for o, so in pool.items():
            if _py_bands(sd) & _py_bands(so):
                est = sum(a == b for a, b in zip(sd, so)) / len(sd)
                if est >= threshold and (best is None or o < best[0]):
                    best = (o, est)
        if best:
            out[d] = (best[0], round(best[1], 6))
    return out


def _df(spark, texts: dict):
    return spark.createDataFrame(sorted(texts.items()),
                                 "doc_id long, text string")


BOILER = ("the quick brown fox jumps over the lazy dog while seventeen "
          "sailors watch from a distant rusty harbor wall every evening")


def test_sig_array_matches_python_model(spark):
    texts = {1: BOILER, 2: "tiny doc", 3: "", 4: "alpha beta gamma delta"}
    got = {r.doc_id: list(r.sig)
           for r in minhash_sig_array(_df(spark, texts)).collect()}
    want = {d: s for d, (s) in ((d, _py_sig(t)) for d, t in texts.items())
            if s is not None}
    assert got == want  # <3-word docs dropped, slices byte-identical


def test_incremental_matches_python_model(spark):
    store = {1: BOILER, 2: "completely unrelated text about gardening "
                           "with tomatoes basil and rosemary in pots",
             9: BOILER + " extra tail words appended here"}
    new = {4: BOILER,                       # exact dup of store doc 1
           5: BOILER + " extra tail words appended here",  # dup of 9
           6: "fresh unique content never seen before in any batch "
              "with enough words to shingle",
           7: BOILER}                       # dup of 1 (and of 4 in-batch)
    got = {r.doc_id: (r.dup_of, r.est_jaccard)
           for r in incremental_near_dup(
               minhash_sig_array(_df(spark, new)),
               minhash_sig_array(_df(spark, store))).collect()}
    want = _py_assign(new, store)
    assert got == want
    assert got[4][0] == 1 and got[7][0] == 1  # smallest partner wins
    assert got[4][1] == 1.0


def test_dedup_ingest_store_grows_by_survivors(spark, catalog):
    b1 = {1: BOILER,
          2: "gardening advice for tomatoes basil and rosemary in "
             "terracotta pots on a sunny balcony"}
    a1 = dedup_ingest(spark, catalog, _df(spark, b1))
    assert a1.count() == 0
    assert catalog.read(spark, "sigs").count() == 2

    b2 = {10: BOILER,                      # dup of stored 1
          11: "entirely novel second-batch content with plenty of "
              "distinct words to form shingles"}
    a2 = {r.doc_id: r.dup_of
          for r in dedup_ingest(spark, catalog, _df(spark, b2)).collect()}
    assert a2 == {10: 1}
    stored = {r.doc_id for r in catalog.read(spark, "sigs").collect()}
    assert stored == {1, 2, 11}            # survivor 11 appended, 10 not

    # third batch dups against a SECOND-batch survivor
    b3 = {20: b2[11]}
    a3 = {r.doc_id: r.dup_of
          for r in dedup_ingest(spark, catalog, _df(spark, b3)).collect()}
    assert a3 == {20: 11}
    assert catalog.read(spark, "sigs").count() == 3


def test_ingest_releases_checkpoint_storage(spark, catalog):
    # diff SETS of persisted RDD ids (the ContextCleaner-race-proof
    # pattern): only the returned assigns checkpoint may remain
    def persisted_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = persisted_ids()
    a = dedup_ingest(spark, catalog, _df(spark, {1: BOILER, 2: BOILER}))
    assert a.count() == 1                  # 2 dups 1 in-batch
    assert len(persisted_ids() - before) <= 1  # assigns only; sig
    # frame released via checkpoints.release (unpersist is a no-op)


def test_reoffered_stored_doc_never_self_matches(spark):
    # replay safety (streaming/dedup.py): a doc whose signature is
    # ALREADY in the store under the same doc_id must not come back as
    # a dup of itself — and with no other store partner it survives the
    # assignment (the keyed sink merge then drops its re-offered sig)
    texts = {1: BOILER}
    sigs = minhash_sig_array(_df(spark, texts))
    assert incremental_near_dup(sigs, sigs).count() == 0


def test_max_bucket_caps_degenerate_buckets(spark):
    # 4 identical docs: every band bucket has size 4. max_bucket=3
    # drops them ALL (identical docs share every band, so no other
    # band rescues the pair — the documented lsh_candidate_pairs
    # trade); an adequate cap finds the dups
    texts = {i: BOILER for i in range(1, 5)}
    sigs = minhash_sig_array(_df(spark, texts))
    empty = spark.createDataFrame([], sigs.schema)
    assert incremental_near_dup(sigs, empty, max_bucket=3).count() == 0
    capped = {r.doc_id: r.dup_of
              for r in incremental_near_dup(sigs, empty,
                                            max_bucket=10).collect()}
    assert capped == {2: 1, 3: 1, 4: 1}


def test_capped_replay_is_deterministic(spark):
    # code-review r5 (demonstrated bug): a replayed batch whose
    # survivor sigs are already stored must re-derive IDENTICAL
    # assignments even with max_bucket — duplicated doc_ids used to
    # inflate _bsz and flip capped buckets between runs
    new = _df(spark, {1: BOILER, 2: BOILER})
    sigs = minhash_sig_array(new)
    empty = spark.createDataFrame([], sigs.schema)
    first = {(r.doc_id, r.dup_of) for r in incremental_near_dup(
        sigs, empty, max_bucket=4).collect()}
    assert first == {(2, 1)}
    # replay: survivor 1's sig is now in the store under the SAME id
    store = sigs.filter("doc_id = 1")
    replay = {(r.doc_id, r.dup_of) for r in incremental_near_dup(
        sigs, store, max_bucket=4).collect()}
    assert replay == first


def test_skip_empty_commits(spark, catalog):
    # dup-free batches must not commit dup_log dirs; all-dup batches
    # must not commit sigs dirs (code-review r5: dir-per-wave accretion)
    dedup_ingest(spark, catalog, _df(spark, {1: BOILER}))
    before = catalog.current_snapshot("sigs")
    dedup_ingest(spark, catalog, _df(spark, {2: BOILER}))  # all dup
    assert catalog.current_snapshot("sigs") == before
