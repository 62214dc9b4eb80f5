"""Near-duplicate detection operators — the blocked scale paths.

Round-1 shipped two quadratic near-dup queries (all-pairs joins behind thin
blocking); this module is the fix: every pair enumeration goes through a
bounded block key, so candidate counts are O(Σ bucket²) with bucket sizes
the operator can cap, never O(n²).

Shapes (all pure DataFrame algebra — hash-partitioned joins and groupBys
that AQE can skew-split; no collects, no UDFs):

  * blocked n-gram Jaccard: block on K one-permutation minhashes of the
    word set (two docs with Jaccard J share one min under a random
    permutation with probability J, so K=2 keys give recall ≥ 1-(1-J)^2 —
    0.96 at the 0.8 threshold), verify exact Jaccard within blocks only.
  * banded minhash LSH: signature table (computed once, reusable/
    persistable), band keys, bucket join with optional per-bucket cap
    (oversized buckets are degenerate shingle collisions — cap + count
    them rather than letting one bucket go quadratic).
  * embedding sign-LSH: L tables × B sign bits per table (table t uses
    dims [t·B, (t+1)·B)); candidates agree on ALL B bits in ≥1 table;
    exact cosine verifies. B/L trade recall vs candidate volume; at a
    production 0.99-cosine threshold use B=16, L=4 (SEMANTICS.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.checkpoints import release as release_checkpoint


# --------------------------------------------------------------------------
# Word-set helpers (shared with queries.py's SQL mirrors)
# --------------------------------------------------------------------------

from axora_spark.functions.words import words_col  # noqa: E402 — the
# single tokenization definition (code-review r5); oracle parity
# depends on every operator splitting words identically


def block_keys_minword(ws: Column, n_keys: int = 2, salt: str = "",
                       band_width: int = 1) -> Column:
    """K blocking keys from one-permutation minhashes of a word array:
    key_i = concat over j < band_width of
    min over words of sha256(word ∥ salt ∥ '#' ∥ (i·band_width+j)).
    Returns array<string> of length n_keys.

    salt selects an independent permutation family; band_width trades
    recall for block purity exactly like LSH bands: width 1 collides two
    docs with probability J per key (max recall, but on a near-dup-heavy
    corpus the blocks are huge and MIXED — the min-doc_id leader is
    usually unrelated to a given pair in the block), width 2 collides
    with probability J² (≈0.64 at the 0.8 threshold per key, but blocks
    contain mostly mutual near-dups, so the leader comparison actually
    lands). The iterated dedup uses width 1 for its first sweep and
    fresh-salted width-2 bands for refinement rounds — measured on the
    fixture corpus, same-key or same-width re-blocking was a no-op while
    width-2 rounds close the survivor-pair gap (SCALE.md).

    The permutation constant binds via an OUTER variable, never a lambda
    default arg — a 2-arg transform lambda is the (element, index) overload
    and pyspark would silently pass the array index as the second arg."""
    keys = []
    for i in range(n_keys):
        mins = []
        for j in range(band_width):
            suffix = F.lit(f"{salt}#{i * band_width + j}")
            mins.append(F.array_min(F.transform(
                ws, lambda w: F.sha2(F.concat(w, suffix), 256))))
        keys.append(mins[0] if band_width == 1
                    else F.concat_ws("|", *mins))
    return F.array(*keys)


def _keyed_word_sets(docs: DataFrame, n_keys: int, salt: str = "",
                     band_width: int = 1) -> DataFrame:
    # stagewise attribute materialization + explode_OUTER: filtering on
    # size(ws) lets pushdown substitute the distinct-words tree into a
    # pre-Exchange filter, and a plain explode makes
    # InferFiltersFromGenerate inline the sha256-per-word key
    # computation into an inferred size(keys)>0 predicate (the keys
    # array is always length n_keys, so outer ≡ inner; the empty-words
    # filter runs on the cheap split instead)
    sets = (docs.select(F.col("doc_id"),
                        words_col(F.col("text")).alias("w"))
            .filter(F.size("w") > 0)
            .select("doc_id", F.array_distinct(F.col("w")).alias("ws")))
    keyed = sets.select(
        "doc_id", "ws",
        block_keys_minword(F.col("ws"), n_keys, salt,
                           band_width).alias("keys"))
    return (keyed.select("doc_id", "ws",
                         F.explode_outer("keys").alias("bk")))


def _jac(a: Column, b: Column, round_to: int) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(inter.cast("double") / union, round_to)


def ngram_jaccard_dedup(docs: DataFrame, threshold: float = 0.8,
                        n_keys: int = 2, round_to: int = 6,
                        key_salt: str = "", band_width: int = 1,
                        leader_salt: str | None = None) -> DataFrame:
    """Blocked word-set Jaccard LEADER dedup: docs(doc_id, text) →
    (doc_id, dup_of, jaccard) where dup_of is the smallest doc_id of a
    same-block leader with Jaccard ≥ threshold.

    Every member compares against its block's LEADER only (min doc_id per
    block) — O(n·K) comparisons and ≤n output rows, never O(block²).
    All-pairs enumeration is fundamentally quadratic-sized on a near-dup-
    heavy corpus no matter how good the blocking is (the fixture corpus
    proves it: ~32k qualifying pairs from 500 docs); keeper assignment is
    the shape a 100-TB dedup pipeline actually materializes.

    Recall caveat (leader-conditional): the block-sharing probability
    bound 1-(1-J)^n_keys only converts to dup-pair recall when the pair's
    shared block is led by one of the pair (or by a transitive near-dup of
    both). A block whose min-doc_id leader is unrelated to a dup pair in
    it swallows that pair. Where full recall matters, iterate
    (ngram_jaccard_dedup_iterated), or use ngram_jaccard_pairs (with
    max_block) for exhaustive pair output.

    leader_salt: None (default) = classic min-doc_id leaders and the
    doc_id > leader orientation above. A string = RANDOMIZED leaders:
    rank docs by sha256(doc_id ∥ salt) and lead each block with the
    min-rank member; dup_of can then exceed doc_id (the output is a
    keeper FOREST, chains resolved by following dup_of). This is the
    iterated refinement's escape hatch from systematic leader bias —
    measured on the fixture corpus, min-doc_id leadership is
    adversarial (the oldest docs sit just BELOW threshold to whole
    stuck clusters and win every block, so identical-pair survivors
    stayed stuck for 8 straight re-salted rounds; random leadership
    hits a stuck pair's own endpoint with probability 2/block and
    collapses them — SCALE.md has the numbers)."""
    result, _keyed = _dedup_pass(docs, threshold, n_keys, round_to,
                                 key_salt, band_width, leader_salt)
    # _keyed stays persisted: the returned (lazy) frame still reads
    # through it. Callers that eagerly materialize the result and need
    # storage back use _dedup_pass directly (the iterated loop does).
    return result


def _dedup_pass(docs: DataFrame, threshold: float, n_keys: int,
                round_to: int, key_salt: str, band_width: int,
                leader_salt: str | None
                ) -> tuple[DataFrame, DataFrame]:
    """One leader-dedup pass; returns (result, keyed_checkpoint) so
    loop callers can unpersist the internal checkpoint once they have
    materialized the result (ADVICE r4 leak class)."""
    # keyed feeds both the leader aggregation and the candidate join;
    # exchange reuse does not bridge self-join branches (verified on the
    # minhash path — each branch carried the full sha256 key pipeline),
    # so materialize it once
    keyed = _keyed_word_sets(docs, n_keys, key_salt,
                             band_width).localCheckpoint(eager=False)
    if leader_salt is None:
        leaders = keyed.groupBy("bk").agg(
            F.min("doc_id").alias("leader"),
            F.min_by("ws", "doc_id").alias("lws"))
        members = keyed.join(leaders, "bk") \
                       .filter(F.col("doc_id") > F.col("leader"))
    else:
        rk = F.sha2(F.concat(F.col("doc_id").cast("string"),
                             F.lit(leader_salt)), 256)
        leaders = (keyed.withColumn("_rk", rk).groupBy("bk")
                   .agg(F.min_by(F.struct("doc_id", "ws"),
                                 F.struct("_rk", "doc_id")).alias("_l"))
                   .select("bk", F.col("_l.doc_id").alias("leader"),
                           F.col("_l.ws").alias("lws")))
        members = keyed.join(leaders, "bk") \
                       .filter(F.col("doc_id") != F.col("leader"))
    cands = (members
             .select("doc_id", "leader",
                     _jac(F.col("ws"), F.col("lws"), round_to)
                     .alias("jaccard"))
             .filter(F.col("jaccard") >= threshold))
    # a doc can qualify under both keys → keep the smallest leader
    best = cands.groupBy("doc_id").agg(
        F.min(F.struct("leader", "jaccard")).alias("_b"))
    return (best.select("doc_id", F.col("_b.leader").alias("dup_of"),
                        F.col("_b.jaccard").alias("jaccard")),
            keyed)


def ngram_jaccard_dedup_iterated(docs: DataFrame, threshold: float = 0.8,
                                 n_keys: int = 2, round_to: int = 6,
                                 max_rounds: int = 5) -> DataFrame:
    """Iterated leader dedup — the recall refinement the single-pass
    docstring names: run ngram_jaccard_dedup, then RE-BLOCK the
    survivors (docs with no dup_of) under a FRESH permutation family
    (key_salt = round number) and rerun, until a round assigns nothing
    new. The salt is the load-bearing part: re-blocking with the SAME
    keys is a near-no-op, because a block's min-doc_id leader has no
    dup_of by construction, survives into the next round, reclaims the
    same block, and swallows the same pairs — fresh permutations give
    survivors new leaders and the missed pairs a fresh 1-(1-J)^K chance
    each round. Output: union of every round's (doc_id, dup_of,
    jaccard); a doc is assigned at most once (it leaves the survivor
    set the round it gains a dup_of).

    Refinement rounds (rnd ≥ 1) change THREE things at once, each
    measured necessary on the fixture corpus (SCALE.md):
    fresh-salted permutations (same keys re-elect the same leaders —
    0 new assignments), band_width=2 keys (width-1 blocks on a
    near-dup-heavy corpus are huge and mixed, so even fresh leaders
    are usually unrelated — ≤1 new/round), and RANDOMIZED leader
    choice (min-doc_id leadership proved systematically adversarial:
    the oldest docs sat just below threshold to whole stuck clusters
    and won every block under every salt, leaving even identical
    pairs stuck — random leaders hit a stuck pair's own endpoint with
    probability 2/block per round).

    Measured on the fixture corpus vs the exhaustive
    ngram_jaccard_pairs ground truth (31,721 qualifying pairs;
    tests/test_neardup.py::test_iterated_leader_recall_fixture_corpus):
    COVERAGE recall — the operational dedup metric, a qualifying pair
    is missed only when BOTH endpoints survive — 0.9916 single-pass →
    0.9949 at max_rounds=5 → 0.9990 at max_rounds=10, clearing the
    1-(1-J)^K ≥ 0.96 bound unconditionally. Component-pair recall
    (both endpoints in the same dup_of tree) stays lower by design:
    keeper assignment emits one edge per removed doc, so a truth pair
    whose endpoints dup'd into different keepers counts against it —
    full transitive clustering is dedup_clusters'
    (connected-components) job, not leader dedup's. The dup_of forest
    is provably acyclic: round-0 edges descend doc_id, salted-round
    edges descend that round's rank order, and chains never re-enter
    earlier rounds.

    Cost: each round is one O(survivors·K) leader pass over a SHRINKING
    set; max_rounds bounds the tail."""
    docs = docs.select("doc_id", "text").localCheckpoint(eager=False)
    assigned = None
    survivors = docs
    dry = 0
    try:
        for rnd in range(max_rounds):
            got, keyed = _dedup_pass(
                survivors, threshold, n_keys, round_to,
                "" if rnd == 0 else f"r{rnd}",
                1 if rnd == 0 else 2,
                None if rnd == 0 else f"L{rnd}")
            got = got.localCheckpoint(eager=True)  # one fixpoint chk/rnd
            release_checkpoint(keyed)  # got is self-contained now
            n_new = got.count()
            if n_new == 0:
                # refinement keys are randomized per round — one barren
                # salt doesn't prove the next is; stop after 2 dry
                release_checkpoint(got)  # empty round backs nothing
                dry += 1
                if dry >= 2:
                    break
                continue
            dry = 0
            assigned = got if assigned is None else assigned.union(got)
            prev = survivors
            survivors = (survivors.join(got.select("doc_id"), "doc_id",
                                        "left_anti")
                         .localCheckpoint(eager=True))
            if prev is not docs:  # round ≥2: drop superseded checkpoint
                release_checkpoint(prev)
    finally:
        # ADVICE r4: the FINAL survivors checkpoint and the initial docs
        # one are not part of the returned union (only the per-round
        # `got` checkpoints back it) — drop them or executor storage
        # grows per invocation over a long session
        if survivors is not docs:
            release_checkpoint(survivors)
        if assigned is not None:
            release_checkpoint(docs)  # got checkpoints are self-contained
    if assigned is None:
        # schema-only empty result built WITHOUT referencing the (now
        # unpersistable) docs checkpoint
        spark = docs.sparkSession
        schema = T.StructType([docs.schema["doc_id"],
                               T.StructField("dup_of", T.LongType()),
                               T.StructField("jaccard", T.DoubleType())])
        release_checkpoint(docs)
        return spark.createDataFrame([], schema)
    return assigned


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        n_keys: int = 2, round_to: int = 6,
                        max_block: int | None = 1000) -> DataFrame:
    """All qualifying pairs within min-word blocks (exploratory shape;
    output is inherently O(pairs)). max_block caps degenerate blocks —
    REQUIRED at scale; None only for small exact studies."""
    keyed = _keyed_word_sets(docs, n_keys).localCheckpoint(eager=False)
    if max_block is not None:
        sizes = keyed.groupBy("bk").agg(F.count("*").alias("_bsz"))
        keyed = (keyed.join(sizes, "bk")
                 .filter(F.col("_bsz") <= max_block).drop("_bsz"))
    a, b = keyed.alias("a"), keyed.alias("b")
    jac = _jac(F.col("a.ws"), F.col("b.ws"), round_to)
    return (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .distinct())


# --------------------------------------------------------------------------
# Banded minhash LSH (reusable signature)
# --------------------------------------------------------------------------

def band_buckets(sig: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """(doc_id, perm, minhash) signature rows → (doc_id, band, band_key)."""
    banded = sig.withColumn(
        "band", (F.col("perm") / rows_per_band).cast("int"))
    return (banded.groupBy("doc_id", "band")
            .agg(F.concat_ws("|", F.array_sort(
                F.collect_list("minhash"))).alias("band_key")))


def lsh_candidate_pairs(bands: DataFrame,
                        max_bucket: int | None = None) -> DataFrame:
    """Bucket join over (band, band_key) → distinct (doc_a, doc_b).
    max_bucket caps degenerate buckets: a bucket of m docs yields m²/2
    pairs, so one pathological band key (empty docs, boilerplate) can
    dominate the whole job at scale; capped buckets are DROPPED (their
    members still pair through their other, more selective bands)."""
    if max_bucket is not None:
        sizes = (bands.groupBy("band", "band_key")
                 .agg(F.count("*").alias("_bsz")))
        bands = (bands.join(sizes, ["band", "band_key"])
                 .filter(F.col("_bsz") <= max_bucket)
                 .drop("_bsz"))
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


# --------------------------------------------------------------------------
# Dedup clusters: connected components over LSH bucket edges
# --------------------------------------------------------------------------

def bucket_star_edges(bands: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) buckets → star edges (a, b): every bucket
    member connects to the bucket's min doc_id. Same connected components
    as the all-pairs-in-bucket graph with O(members) edges instead of
    O(members²) — the only edge shape that survives a degenerate bucket
    at corpus scale."""
    roots = (bands.groupBy("band", "band_key")
             .agg(F.min("doc_id").alias("root")))
    return (bands.join(roots, ["band", "band_key"])
            .filter(F.col("doc_id") != F.col("root"))
            .select(F.col("doc_id").alias("a"), F.col("root").alias("b"))
            .distinct())


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Min-label propagation to a fixpoint: (a, b) undirected edges →
    (doc_id, cluster_id) for every node appearing in an edge, cluster_id =
    min doc_id of the component. The canonical Spark CC loop (same shape
    GraphFrames/GraphX use for label propagation):

      label(v) ← min(label(v), min over neighbors u of label(u))

    one shuffle join per iteration, convergence = zero changed labels
    (a count on the joined diff — no collect of the labels themselves).
    Each round's labels are localCheckpoint-ed: without lineage
    truncation the logical plan doubles per round (the join re-embeds
    the previous round's whole tree) and Catalyst analysis time blows
    up long before the data does — the standard iterative-algorithm
    trap; a production cluster would point this at a reliable
    checkpoint dir instead of executor-local storage.
    Iterations needed = graph diameter; star edges pre-collapse every
    bucket to depth 1, so chains only form ACROSS buckets and real
    corpora converge in a handful of rounds (the 100-TB refinement is
    large-star/small-star alternation — same per-round plan, provably
    O(log n) rounds). max_iter bounds a pathological chain; hitting it
    raises rather than returning a half-converged clustering."""
    sym = (edges.select("a", "b")
           .union(edges.select(F.col("b").alias("a"),
                               F.col("a").alias("b")))
           .distinct().localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("doc_id"))
              .distinct()
              .withColumn("label", F.col("doc_id"))
              .localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            nbr = (sym.join(labels, sym["b"] == labels["doc_id"])
                   .groupBy(sym["a"].alias("doc_id"))
                   .agg(F.min("label").alias("nbr_min")))
            new_labels = (labels.join(nbr, "doc_id", "left")
                          .select("doc_id",
                                  F.least("label", "nbr_min").alias("label"))
                          .localCheckpoint(eager=True))
            changed = (new_labels.join(labels.withColumnRenamed(
                           "label", "old"), "doc_id")
                       .filter(F.col("label") != F.col("old")).count())
            # each round's checkpoint supersedes the last — unpersist the
            # stale one or executor storage grows linearly with rounds
            # (and with every invocation in a long session, code-review r4)
            release_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                # the result must outlive the finally-block unpersists:
                # copy the converged labels out of the checkpointed frame
                out = labels.select(
                    "doc_id", F.col("label").alias("cluster_id"))
                out = out.localCheckpoint(eager=True)
                return out
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds")
    finally:
        release_checkpoint(sym)
        release_checkpoint(labels)


def _ls_mins(e: DataFrame) -> DataFrame:
    """per-u star minimum m = min(Γ(u) ∪ {u}) over an edge list (u, v)."""
    return (e.groupBy("u").agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("u"), F.col("_mn")).alias("m")))


def connected_components_star(edges: DataFrame,
                              max_iter: int = 50,
                              local_finish: int = 100_000) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
    MapReduce and Beyond", SoCC 2014) — the scale path for CC. Output
    contract: undirected (a, b) edges → (doc_id, cluster_id =
    component-min doc_id) for every node in a NON-self edge. The one
    divergence from connected_components (ADVICE r4): self-loop-only
    nodes are dropped here (the a != b prefilter erases them;
    test_star_cc_self_loops_and_empty pins []) while min-label emits
    them as singleton clusters — irrelevant in the dedup pipeline since
    bucket_star_edges never produces self-edges, but callers feeding
    arbitrary edge lists should pre-split self-loops if they want
    singletons.

    Per alternation, two grouped passes over the edge set:

      large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
      small-star(u): over (max,min)-directed edges, m as above;
                     emit (v, m) for v ∈ Γ(u) ∪ {u}, v ≠ m

    Both operations strictly decrease a potential (Σ over edges of
    height), so alternation converges — provably in O(log² n) rounds
    worst-case, O(log n) observed (and exactly what the long-chain test
    pins: a path of n nodes collapses in ≤ 2·log2(n) alternations,
    because each large-star round roughly halves every node's distance
    to its component min, vs the n rounds min-label propagation needs).
    At the fixpoint the edge set IS the answer: stars (child, root).

    vs min-label propagation (connected_components): same per-round cost
    (one shuffle join + groupBy), but rounds = O(log n) instead of graph
    diameter, and state is the edge set itself (shrinking) rather than
    edge set + labels. Min-label stays the small-graph path — on
    already-star-shaped bucket edges (diameter ≤ a few) it converges in
    2-3 rounds with one fewer pass per round."""
    e = (edges.filter(F.col("a") != F.col("b"))
         .select(F.col("a").alias("u"), F.col("b").alias("v"))
         .distinct().localCheckpoint(eager=True))
    e_count = e.count()
    if e_count <= local_finish:
        # data-adaptive local finish (Kiveris et al. §6 run their last
        # rounds on a single machine once the contracted graph fits):
        # below the bound the edge set is a few MB — a driver
        # union-find replaces ~6 alternation rounds of tiny Spark jobs
        # whose cost is pure scheduling latency (r6 measured 4.0 s for
        # an 11 k-edge graph, <0.5 s locally). Output contract is
        # IDENTICAL — cluster_id is the component-min doc_id, and any
        # exact CC yields the same labels — so the driver query stays
        # hash-green. At 100 TB the alternation rounds shrink the edge
        # set toward stars first and this branch finishes the residue;
        # local_finish=0 forces the pure-distributed path.
        rows = e.collect()
        try:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for r in rows:
                ru, rv = find(r.u), find(r.v)
                if ru != rv:
                    # union by min keeps find() roots = component min
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
            out_rows = [(x, find(x))
                        for x in {r.u for r in rows} | {r.v for r in rows}]
            schema = T.StructType([
                T.StructField("doc_id", e.schema["u"].dataType),
                T.StructField("cluster_id", e.schema["v"].dataType)])
            return e.sparkSession.createDataFrame(out_rows, schema)
        finally:
            release_checkpoint(e)
    try:
        for _ in range(max_iter):
            # large-star over the symmetrized neighborhood
            sym = e.union(e.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
            ls = (sym.join(_ls_mins(sym), "u")
                  .filter(F.col("v") > F.col("u"))
                  .select(F.col("v").alias("u"), F.col("m").alias("v"))
                  .distinct())
            # small-star over (max, min)-directed edges
            directed = ls.select(F.greatest("u", "v").alias("u"),
                                 F.least("u", "v").alias("v")).distinct()
            mins = _ls_mins(directed)
            ss = (directed.join(mins, "u")
                  .select(F.col("v").alias("n"), F.col("u"), F.col("m"))
                  .union(mins.select(F.col("u").alias("n"), "u", "m"))
                  .filter(F.col("n") != F.col("m"))
                  .select(F.col("n").alias("u"), F.col("m").alias("v"))
                  .distinct().localCheckpoint(eager=True))
            # fixpoint test: one near-free count over the fresh eager
            # checkpoint (e's count carries over from last round)
            # short-circuits every non-converged round; the subtract
            # job runs only when the counts agree. (r6 tried a one-job
            # union+groupBy set-equality check here — 2× SLOWER: it
            # pays a full shuffle-agg every round where the counts
            # disagree for free.)
            ss_count = ss.count()
            same = (ss_count == e_count
                    and ss.subtract(e).limit(1).count() == 0)
            release_checkpoint(e)
            e, e_count = ss, ss_count
            if same:
                roots = e.select(F.col("v").alias("doc_id")).distinct() \
                         .withColumn("cluster_id", F.col("doc_id"))
                out = (e.select(F.col("u").alias("doc_id"),
                                F.col("v").alias("cluster_id"))
                       .union(roots).distinct()
                       .localCheckpoint(eager=True))
                return out
        raise RuntimeError(
            f"connected_components_star: no fixpoint in {max_iter} rounds")
    finally:
        release_checkpoint(e)


# --------------------------------------------------------------------------
# Embedding sign-LSH (multi-table)
# --------------------------------------------------------------------------

def sign_lsh_keys(emb: Column, bits: int, tables: int) -> Column:
    """array<long> of `tables` bucket keys; table t packs the sign bits of
    dims [t·bits, (t+1)·bits). Deterministic coordinate hyperplanes keep
    the operator native-SQL mirrorable; production would rotate with a
    seeded random projection first (same shape, one extra matmul)."""
    keys = []
    for t in range(tables):
        k = F.lit(0).cast("long")
        for i in range(bits):
            dim = t * bits + i + 1  # element_at is 1-based
            k = k + F.when(F.element_at(emb, dim) >= 0,
                           F.lit(1 << i)).otherwise(F.lit(0))
        # disambiguate tables: same bit pattern in different tables must
        # not collide into one join key
        keys.append(k + F.lit(t << bits))
    return F.array(*keys)


def embedding_near_dup_pairs(emb: DataFrame, cosine_expr=None,
                             threshold: float = 0.99, bits: int = 8,
                             tables: int = 2,
                             max_bucket: int | None = None,
                             round_to: int = 6) -> DataFrame:
    """emb(vec_id, embedding) → (vec_a, vec_b, cos_sim ≥ threshold),
    candidates from multi-table sign-LSH buckets only.

    cosine_expr=None (default) uses the split dot/precomputed-norm form:
    each row's L2 norm is computed ONCE before the self-join and rides
    the shuffle as one extra double, so a candidate pair pays one
    zip_with dot fold instead of three O(d) folds (dot + both norms —
    at d=768 that was ~3× the per-pair flops, the dominant cost of the
    bucket join; r6 guide §1.2 'per-task work'). Bit-identical to
    embed.cosine_similarity: same left folds over the same cast-to-
    double arrays, sqrt per side, then the identical dot/(na*nb).
    Pass an explicit cosine_expr(a_arr, b_arr) for a custom metric."""
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    keyed = emb.select(
        "vec_id", "embedding",
        F.explode(sign_lsh_keys(F.col("embedding"), bits, tables))
        .alias("bk"))
    if cosine_expr is None:
        keyed = keyed.withColumn(
            "_nrm", F.sqrt(F.aggregate(
                F.transform(dbl(F.col("embedding")), lambda x: x * x),
                F.lit(0.0), lambda acc, x: acc + x)))
    if max_bucket is not None:
        sizes = keyed.groupBy("bk").agg(F.count("*").alias("_bsz"))
        keyed = (keyed.join(sizes, "bk")
                 .filter(F.col("_bsz") <= max_bucket).drop("_bsz"))
    a, b = keyed.alias("a"), keyed.alias("b")
    if cosine_expr is None:
        dot = F.aggregate(
            F.zip_with(dbl(F.col("a.embedding")), dbl(F.col("b.embedding")),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        cos = F.round(dot / (F.col("a._nrm") * F.col("b._nrm")), round_to)
    else:
        cos = F.round(cosine_expr(dbl(F.col("a.embedding")),
                                  dbl(F.col("b.embedding"))), round_to)
    return (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
            .distinct())
