"""Cross-source MinHash overlap (functions/sketch.minhash_set_sketch):
the engine's sketch must equal a pure-Python twin of the digest-slice
permutation family bit-for-bit, and the Jaccard estimate must land
within the Broder error bound at production perm counts."""

from __future__ import annotations

import hashlib
import math

from axora_spark.functions.sketch import (minhash_set_sketch,
                                          sketch_pairwise_jaccard)


def _py_sketch(values, n_perm):
    """Pure-Python twin: permutation i = slice i%8 of digest i//8
    (group 0 unsalted, later groups salted with '#g')."""
    mins = [None] * n_perm
    for v in set(values):
        for g in range((n_perm + 7) // 8):
            s = v if g == 0 else f"{v}#{g}"
            h = hashlib.sha256(s.encode()).hexdigest()
            for i in range(g * 8, min(g * 8 + 8, n_perm)):
                piece = h[(i % 8) * 8:(i % 8) * 8 + 8]
                if mins[i] is None or piece < mins[i]:
                    mins[i] = piece
    return mins


def _corpus(spark, sources):
    rows = [(k, w) for k, words in sources.items() for w in words]
    return spark.createDataFrame(rows, "source string, word string")


def test_sketch_matches_python_twin(spark):
    sources = {
        "a": [f"w{i}" for i in range(200)],
        "b": [f"w{i}" for i in range(100, 300)],   # 50% overlap with a
        "c": [f"z{i}" for i in range(50)] * 3,      # duplicates collapse
    }
    for n_perm in (3, 8, 20):
        sk = {r["source"]: [r[f"mh{i}"] for i in range(n_perm)]
              for r in minhash_set_sketch(_corpus(spark, sources),
                                          "source", "word",
                                          n_perm=n_perm).collect()}
        for s, words in sources.items():
            assert sk[s] == _py_sketch(words, n_perm), (s, n_perm)


def test_identical_and_disjoint_sources(spark):
    sources = {
        "x1": [f"t{i}" for i in range(100)],
        "x2": [f"t{i}" for i in range(100)],   # identical set
        "y": [f"u{i}" for i in range(100)],    # disjoint
    }
    sk = minhash_set_sketch(_corpus(spark, sources), "source", "word")
    est = {(r["key_a"], r["key_b"]): r["est_jaccard"]
           for r in sketch_pairwise_jaccard(sk, "source").collect()}
    assert est[("x1", "x2")] == 1.0
    assert est[("x1", "y")] == 0.0 and est[("x2", "y")] == 0.0


def test_estimate_within_error_bound_at_production_perms(spark):
    # |A|=|B|=600, |A∩B|=400 → J = 400/800 = 0.5; with n_perm=128 the
    # estimator's std err is sqrt(J(1-J)/128) ≈ 0.044 — assert 4σ
    n_perm = 128
    a = [f"k{i}" for i in range(600)]
    b = [f"k{i}" for i in range(200, 800)]
    jacc = len(set(a) & set(b)) / len(set(a) | set(b))
    sk = minhash_set_sketch(_corpus(spark, {"a": a, "b": b}),
                            "source", "word", n_perm=n_perm)
    est = sketch_pairwise_jaccard(sk, "source", n_perm=n_perm) \
        .collect()[0]["est_jaccard"]
    bound = 4 * math.sqrt(jacc * (1 - jacc) / n_perm)
    assert abs(est - jacc) <= bound, (est, jacc, bound)


def test_overlap_plan_partial_min_single_exchange(spark):
    # the sketch must reduce map-side (partial_min) to n_perm strings
    # per source before its single keyed exchange; the pair join runs
    # broadcast on the dwarf sketch table
    from axora_spark.queries import q_source_overlap
    df = q_source_overlap(spark, "/root/testdata/sf0.001")
    df.collect()  # the self-join dedup is an AQE stage-reuse property —
    # only the EXECUTED plan shows the ReusedExchange
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert "partial_min" in final
    # count NODES (the ReusedExchange line echoes the original
    # exchange's description, so a plain substring count sees two)
    assert final.count("+- Exchange hashpartitioning") == 1
    assert "ReusedExchange" in final  # b-side reuses it, no second scan
    assert final.count("FileScan parquet") == 1
    assert "BroadcastNestedLoopJoin" in final  # tiny pair join
