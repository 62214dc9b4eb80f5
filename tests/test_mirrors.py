"""Cross-host mirror detection (operators/mirrors.py): pair semantics,
thresholds, and the boilerplate cap."""

from __future__ import annotations

from axora_spark.operators.mirrors import detect_mirrors


def _hf(spark, rows):
    return spark.createDataFrame(rows, "host string, fingerprint string")


def test_detect_mirrors_pairs_and_ratio(spark):
    rows = (
        # a and b share 4 of a's 5 docs (b has 6) → ratio 4/5
        [("a", f"s{i}") for i in range(4)] + [("a", "ax")]
        + [("b", f"s{i}") for i in range(4)] + [("b", "bx"), ("b", "by")]
        # c is unrelated
        + [("c", f"c{i}") for i in range(5)]
        # duplicate (host, fp) rows must collapse before counting
        + [("a", "s0"), ("b", "s0")]
    )
    got = {(r["host_a"], r["host_b"]): r for r in
           detect_mirrors(_hf(spark, rows), min_shared=3,
                          min_ratio=0.5).collect()}
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r["shared"], r["n_a"], r["n_b"]) == (4, 5, 6)
    assert r["ratio"] == 0.8


def test_detect_mirrors_thresholds(spark):
    rows = ([("a", f"s{i}") for i in range(10)]
            + [("b", f"s{i}") for i in range(3)]       # ratio 3/3 = 1.0
            + [("d", f"s{i}") for i in range(2)])      # shared 2 < min
    got = {(r["host_a"], r["host_b"]) for r in
           detect_mirrors(_hf(spark, rows), min_shared=3,
                          min_ratio=0.9).collect()}
    assert got == {("a", "b")}  # d falls below min_shared


def test_boilerplate_cap_drops_hot_fingerprints(spark):
    # one fingerprint on EVERY host (a shared footer) must not mint
    # pairs when it exceeds the cap; the real mirror pair survives
    rows = ([(f"h{i}", "footer") for i in range(10)]
            + [("h0", f"m{i}") for i in range(5)]
            + [("h1", f"m{i}") for i in range(5)])
    got = {(r["host_a"], r["host_b"]): r["shared"] for r in
           detect_mirrors(_hf(spark, rows), min_shared=3, min_ratio=0.5,
                          max_hosts_per_fp=4).collect()}
    assert got == {("h0", "h1"): 5}  # footer contributed nothing
