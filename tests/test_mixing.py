"""operators/mixing.py: domain-balanced sampling seams (VERDICT r4 #9)
and the bounded-key draw (ADVICE r4 int64-overflow fix)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from axora_spark.operators import mixing


def _docs(spark, n=400, sources=("a", "b", "c", "d")):
    # source 'a' is ~8x over-represented in token mass
    rows = [(i, sources[i % len(sources)],
             ("tok " * (40 if i % len(sources) == 0 else 5)).strip())
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_epoch_reproducible_and_distinct(spark):
    docs = _docs(spark)
    e0a = {r.doc_id for r in mixing.mix_sample(docs, epoch=0).collect()}
    e0b = {r.doc_id for r in mixing.mix_sample(docs, epoch=0).collect()}
    e1 = {r.doc_id for r in mixing.mix_sample(docs, epoch=1).collect()}
    assert e0a == e0b                      # same epoch -> same subset
    assert e0a != e1                       # fresh epoch -> fresh subset
    # rates are a pure function of the corpus: identical across epochs
    r0 = {(r.source, r.sample_rate) for r in
          mixing.mix_sample(docs, epoch=0)
          .select("source", "sample_rate").distinct().collect()}
    r1 = {(r.source, r.sample_rate) for r in
          mixing.mix_sample(docs, epoch=1)
          .select("source", "sample_rate").distinct().collect()}
    assert r0 == r1
    # downsampling really bites the over-represented source
    kept_a = sum(1 for d in e0a if d % 4 == 0)
    assert kept_a < 100  # of 100 'a' docs


def test_draw_bounded_no_int64_wrap(spark):
    # ADVICE r4: doc_id >= ~3.47e9 wrapped the unbounded product in
    # Spark while DuckDB raised. The bounded form must agree with an
    # independent Python evaluation AND with DuckDB at extreme ids.
    ids = [0, 1, 2**31 - 1, 2**31, 3_470_000_000, 2**40 + 17,
           2**62 + 12345, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.u for r in
           df.select("doc_id",
                     mixing.mix_draw(F.col("doc_id"), epoch=3)
                     .alias("u")).collect()}

    def py_draw(doc_id, epoch):
        key = (doc_id % 2**31 + epoch * mixing.EPOCH_PRIME) % 2**31
        return (key * mixing.MIX_HASH) % 2**32 / 2**32

    for i in ids:
        assert got[i] == py_draw(i, 3), i
    # DuckDB evaluates the same arithmetic without overflow errors
    con = duckdb.connect()
    for i in ids:
        off = 3 * mixing.EPOCH_PRIME  # pre-multiplied: DuckDB would
        # otherwise do the 3*prime literal product in INT32 and raise
        key_sql = (f"((({i} % 2147483648) + 2147483648) % 2147483648"
                   f" + {off}) % 2147483648")
        (u,) = con.execute(
            f"SELECT ({key_sql} * {mixing.MIX_HASH}) % {mixing.MIX_MOD}"
            f" / {mixing.MIX_MOD}.0").fetchone()
        assert u == py_draw(i, 3), i


def test_token_col_seam(spark):
    # a caller-supplied token counter changes the rates (word count
    # weighs every word 1 instead of ceil(len/4) per word)
    docs = _docs(spark)
    est = mixing.mix_sample(docs).select("source", "sample_rate")
    words = mixing.mix_sample(
        docs, token_col=F.size(F.split(F.trim("text"), r"\s+"))) \
        .select("source", "sample_rate")
    # both balanced: over-represented source downsampled under either
    for frame in (est, words):
        rates = {r.source: r.sample_rate
                 for r in frame.distinct().collect()}
        assert rates["a"] < 1.0
        assert rates["b"] == 1.0
