"""Training-data mixing: domain-balanced deterministic sampling.

First-class parameterized form of the driver's mix_sample query
(VERDICT r4 #9 + ADVICE r4 overflow fix): give every source (domain) an
equal token budget, convert the budget into a per-source keep-rate, and
keep each document by a deterministic per-doc uniform draw keyed on
(doc_id, epoch).

Reproducibility contract:
  * the keep-RATES are a pure function of the corpus (per-source token
    mass), so re-running any epoch on the same corpus recomputes the
    same rates — auditable mixing recipes;
  * the per-doc DRAW is pure integer arithmetic on (doc_id, epoch), so
    epoch e always selects the same documents, and different epochs
    select fresh (deterministic) subsets — the standard multi-epoch
    mixing seam (each training epoch resamples over-represented
    domains instead of repeating one fixed subset).

Overflow discipline (ADVICE r4): the r4 draw doc_id·2654435761
silently wrapped int64 for doc_id >= ~3.47e9 (pmod of the wrapped
value changes the draw) while DuckDB raises on BIGINT overflow — the
cross-engine contract broke exactly at production id ranges. Every
multiplication here is bounded first: key < 2^31, so
key·2654435761 < 5.71e18 < 2^63-1 on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIX_HASH = 2654435761        # Knuth multiplicative constant (2^32 scale)
MIX_MOD = 4294967296         # 2^32
_KEY_MOD = 2147483648        # 2^31 — bound BEFORE multiplying (overflow)
EPOCH_PRIME = 1000000007     # epoch offset; epoch*prime + 2^31 << 2^63


def mix_draw(doc_id: Column, epoch: int = 0) -> Column:
    """Deterministic uniform in [0,1): Knuth multiplicative hash of a
    2^31-bounded (doc_id, epoch) key. Same integer arithmetic is
    expressible in ANSI SQL (see queries.SQL_MIX_SAMPLE)."""
    key = F.pmod(F.pmod(doc_id, F.lit(_KEY_MOD))
                 + F.lit(epoch * EPOCH_PRIME), F.lit(_KEY_MOD))
    return (F.pmod(key * MIX_HASH, F.lit(MIX_MOD)).cast("double")
            / MIX_MOD)


def mix_rates(toks: DataFrame) -> DataFrame:
    """(source, tok) rows -> (source, sample_rate): equal token share
    per source, capped at 1. The unbounded window runs over the tiny
    per-source aggregate (n_sources rows), never the corpus."""
    per_src = toks.groupBy("source").agg(
        F.sum("tok").cast("double").alias("src_tok"))
    w = Window.partitionBy()
    return per_src.select(
        "source",
        F.round(F.least(F.lit(1.0),
                        (F.sum("src_tok").over(w)
                         / F.count("*").over(w) / F.col("src_tok")),
                        ), 6).alias("sample_rate"))


def mix_sample(docs: DataFrame, epoch: int = 0,
               token_col: Column | None = None) -> DataFrame:
    """Domain-balanced sample of (doc_id, source, text) docs for one
    mixing epoch. token_col: per-doc token-count expression — default
    is the cheap estimate (operators/chunking.token_count_col); pass
    functions/wordpiece's real count column for budget-exact mixing
    (same plan, pricier map side).

    Scale shape: one map-side token count, one tiny per-source agg,
    broadcast of the rates back onto the corpus, then a stateless
    filter. No corpus-sized shuffle beyond the per-source partial agg."""
    if token_col is None:
        from axora_spark.operators.chunking import token_count_col
        token_col = token_count_col(F.col("text"))
    toks = docs.select("doc_id", "source", token_col.alias("tok"))
    rates = mix_rates(toks)
    return (toks.join(F.broadcast(rates), "source")
            .filter(mix_draw(F.col("doc_id"), epoch)
                    < F.col("sample_rate"))
            .select("doc_id", "source", "sample_rate"))
