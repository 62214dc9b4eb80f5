"""Streaming twin of continuous crawl-trap detection
(operators/traps.py).

The trap profile's whole state is max-aggregates at (host, template,
bucket) grain — HLL registers for the distinct-URL volume signal plus
max depth / max params — and max is monotone-mergeable, so the
streaming form is exactly the batch trap_profile_state groupBy run in
update mode: a micro-batch can only raise registers, replays are
idempotent, and an at-least-once sink merging by max is exactly-once.
Families are flagged on READ (detect_traps_from_state), the split a
long-running crawl uses: discovered URLs stream into the state table,
the frontier gate reads the flagged families each wave.

Equivalence contract (tests/test_traps.py): state streamed in
single-file micro-batches + finalize == the one-shot batch
trap_profile_state + finalize, bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from axora_spark.operators.traps import (detect_traps_from_state,
                                         trap_profile_state)


def trap_state_stream(urls: DataFrame, url_col: str = "url",
                      m: int = 64) -> DataFrame:
    """(host, template, bucket, m_reg, max_depth, max_params) streaming
    aggregation — write with outputMode('update'|'complete')."""
    return trap_profile_state(urls, url_col, m)


def traps_from_state(state: DataFrame, min_urls: int = 64,
                     max_depth: int = 8, max_params: int = 3,
                     m: int = 64) -> DataFrame:
    """Flag families from a streamed-and-merged state table."""
    return detect_traps_from_state(state, min_urls, max_depth,
                                   max_params, m)
