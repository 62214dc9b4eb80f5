"""Streaming twin of the HLL distinct sketch (functions/sketch.py).

The register aggregation — max rho per (key, bucket) — IS the sketch's
whole state, and max is monotone-mergeable, so the streaming form is
exactly the batch groupBy run in update mode: each micro-batch can only
raise registers, never lower them, and a restart that replays rows is
idempotent by construction. The estimate is finalized on READ from the
register table (hll_finalize), the same split a production session uses
when it keeps a distinct-URL/host register table in the catalog and
queries the estimate continuously.

Equivalence contract (tests/test_streaming.py): registers streamed over
the parquet corpus + finalize == the one-shot batch hll_estimate, bit
for bit — the sketch is micro-batch-slicing invariant because max is
associative/commutative/idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from axora_spark.functions.sketch import hll_finalize, hll_registers


def hll_register_stream(stream: DataFrame, key: str, value: str,
                        m: int = 16) -> DataFrame:
    """(key, bucket, m_reg) streaming aggregation — write with
    outputMode('update') or 'complete'; every emitted row is a register
    that only ever grows, so an at-least-once sink merging by
    (key, bucket, max) is exactly-once for the sketch."""
    return hll_registers(stream, key, value, m)


def hll_estimate_from_registers(registers: DataFrame, key: str,
                                m: int = 16) -> DataFrame:
    """Finalize the estimate from a (possibly streamed-and-merged)
    register table — read-side math over m rows per key."""
    return hll_finalize(registers, key, m)
