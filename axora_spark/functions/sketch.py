"""Deterministic cardinality sketches.

HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) as a NATIVE Spark
aggregation, generalized over the register count m (VERDICT r4 #2/#6):
the driver query runs m=16 so the DuckDB oracle can hash-verify every
bit of the estimate; production uses m=2^14 (standard error
1.04/sqrt(m) ~ 0.8%) — SAME plan, different constants, proven by
tests/test_hll.py's error-bound run at m=16384.

Why not Spark's approx_count_distinct: that is a black-box HLL++ whose
estimate an external oracle cannot reproduce; this implementation pins
the hash (first 32 bits of sha256), the bucket split, and the
correction rule, so two engines agree bit-for-bit.

Scale shape: one map-side (key, bucket) partial max — the whole sketch
is m tiny rows per key however many values stream through. This is THE
shape for distinct-URL/host accounting on a 100-TB crawl where exact
count-distinct would shuffle every key (reference analog: the Go
crawler's seen-set accounting, crawler/crawler.go).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# alpha_m (Flajolet et al. 2007 Fig. 3): exact small-m constants, the
# closed form for m >= 128
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _check_m(m: int) -> int:
    p = m.bit_length() - 1
    if m <= 1 or (1 << p) != m:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    return p


def _keys(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def hll_rho_cols(value: str, m: int) -> tuple:
    """(bucket, rho) columns for one value — the per-row half of the
    register aggregation, shared by hll_registers and the streaming
    trap profile (streaming/traps.py)."""
    p = _check_m(m)
    low = 32 - p
    h = (F.conv(F.substring(F.sha2(F.col(value), 256), 1, 8), 16, 10)
         .cast("long"))
    w_low = h.bitwiseAND(F.lit((1 << low) - 1))
    bucket = F.shiftright(h, low)
    rho = (F.when(w_low == 0, F.lit(low + 1))
           .otherwise(low + 1 - F.length(F.bin(w_low))))
    return bucket, rho


def hll_registers(df: DataFrame, key, value: str,
                  m: int = 16) -> DataFrame:
    """The register half of the sketch: (key, bucket, m_reg) with
    m_reg = max rho per bucket. This aggregation is the sketch's WHOLE
    state and max is monotone-mergeable, so it is also the streaming
    form (streaming/sketch.py runs exactly this groupBy in update mode
    and merges register tables across restarts by max).

      h      = first 32 bits of sha256(value)
      bucket = h >> (32-p)   (top p = log2(m) bits)
      rho    = leading-zero count of the low 32-p bits + 1
               (= 33-p - length(bin(w)); w = 0 -> 33-p)

    `key` may be a single column name or a list (composite keys — the
    streaming trap profile groups by (host, template))."""
    ks = _keys(key)
    bucket, rho = hll_rho_cols(value, m)
    return (df
            .select(*ks, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*ks, "bucket")
            .agg(F.max("rho").alias("m_reg")))


def hll_finalize(per_bucket: DataFrame, key,
                 m: int = 16, extra_aggs: list | None = None) -> DataFrame:
    """Registers -> estimate: E = alpha_m * m^2 / sum(2^-M_j),
    small-range corrected to m*ln(m/V) when E <= 2.5m and V > 0 empty
    registers. Pure read-side math over m rows per key.

    extra_aggs: additional aggregate Columns carried through the same
    groupBy (monotone companions stored at register grain, e.g. the
    trap profile's max depth/params)."""
    _check_m(m)
    ks = _keys(key)
    per_key = (per_bucket.groupBy(*ks)
               .agg(F.sum(F.pow(F.lit(2.0), -F.col("m_reg")))
                    .alias("z_present"),
                    F.count("*").alias("nb"),
                    *(extra_aggs or [])))
    zeros = (m - F.col("nb")).cast("double")
    z = F.col("z_present") + zeros  # absent registers contribute 2^0
    raw = F.lit(hll_alpha(m) * m * m) / z
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
           .otherwise(raw)
    extras = [c for c in per_key.columns
              if c not in ks + ["z_present", "nb"]]
    return per_key.select(*ks, est.alias("hll_distinct"), *extras)


def hll_estimate(df: DataFrame, key: str, value: str,
                 m: int = 16) -> DataFrame:
    """HyperLogLog distinct-count estimate of `value` per `key`.
    Returns (key, hll_distinct:double) — m register rows per key live
    only inside the aggregation, never a corpus-sized shuffle.

    Exactness (oracle hash): the 2^-M_j are dyadic and their sum is
    exactly representable, so Z, the division and the comparison are
    bit-identical across engines; only ln() can differ in the last
    ulp, absorbed by 6dp output rounding downstream."""
    return hll_finalize(hll_registers(df, key, value, m), key, m)


# --------------------------------------------------------------------------
# MinHash set sketches: compact per-key signatures whose coordinate-wise
# agreement estimates Jaccard overlap BETWEEN keys (Broder 1997, "On the
# resemblance and containment of documents"). Complements the per-doc
# near-dup minhash family (operators/neardup.py): there the unit is a
# document and candidates come from LSH bands; here the unit is a whole
# SOURCE (corpus, crawl, snapshot) and the question is "how much do two
# corpora overlap?" — the mixing/dedup-audit question a training-data
# pipeline asks before combining sources. Same one-hash digest-slice
# permutation family as queries.q_minhash_signature (one sha256 per
# value, permutation i = the i-th disjoint 8-hex-char slice).
#
# Scale shape: ONE keyed aggregate with map-side partial min — the
# sketch is n_perm strings per key however many values stream through
# (the hll_registers shape); the pairwise comparison then runs on the
# tiny sketch table (sources × n_perm), never on the data.
# --------------------------------------------------------------------------


def minhash_set_sketch(df: DataFrame, key: str, value: str,
                       n_perm: int = 8) -> DataFrame:
    """Per-key minhash signature of the DISTINCT-value set. No explicit
    distinct: min() is duplicate-insensitive, so the multiset stream
    reduces map-side without the dedup shuffle. n_perm <= 8 uses one
    sha256 digest's 8 disjoint 32-bit slices (matching the DuckDB
    oracle); the hash is materialized in its OWN projection so the 8
    aggregate expressions slice an attribute instead of re-evaluating
    sha256 per aggregate (the q_minhash_signature lesson)."""
    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    # one digest yields 8 permutations; production n_perm (64, 128)
    # salts additional digests — group 0 stays UNSALTED so the n_perm<=8
    # form matches the DuckDB oracle byte-for-byte
    n_groups = (n_perm + 7) // 8
    digests = [
        F.sha2(F.col(value) if g == 0
               else F.concat(F.col(value), F.lit(f"#{g}")), 256)
        .alias(f"_h{g}")
        for g in range(n_groups)]
    hashed = df.select(F.col(key), *digests)
    return hashed.groupBy(key).agg(
        *[F.min(F.substring(f"_h{i // 8}", (i % 8) * 8 + 1, 8))
          .alias(f"mh{i}") for i in range(n_perm)])


def sketch_pairwise_jaccard(sketch: DataFrame, key: str,
                            n_perm: int = 8) -> DataFrame:
    """All key pairs (a < b) with the Jaccard estimate = fraction of
    agreeing signature coordinates. The sketch table is tiny (keys ×
    n_perm), so the pair join broadcasts."""
    a = sketch.select(F.col(key).alias("key_a"),
                      *[F.col(f"mh{i}").alias(f"a{i}")
                        for i in range(n_perm)])
    b = sketch.select(F.col(key).alias("key_b"),
                      *[F.col(f"mh{i}").alias(f"b{i}")
                        for i in range(n_perm)])
    agree = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
                for i in range(n_perm))
    return (a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
            .select("key_a", "key_b",
                    (agree / F.lit(float(n_perm))).alias("est_jaccard")))
