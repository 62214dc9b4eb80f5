"""localCheckpoint storage management.

`DataFrame.unpersist()` routes through the CacheManager and is a
**silent no-op** for localCheckpoint storage: the checkpoint persists
the backing RDD (RDD-level storage), not a CacheManager entry, so every
r3/r4 "unpersist the superseded checkpoint" call was releasing nothing
(measured: getPersistentRDDs() kept growing by one per round). Found
while writing the r5 leak regression test
(tests/test_neardup.py::test_iterated_dedup_releases_checkpoints).

The real release path is the analyzed plan's LogicalRDD -> its RDD ->
RDD.unpersist(). This module is the one place that knows that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release(df: DataFrame) -> None:
    """Free the storage behind a frame returned by localCheckpoint()
    (eager or lazy; lazy-and-never-materialized is a cheap no-op).
    Only call on frames whose data no other live frame still needs —
    a checkpoint's lineage is truncated, so dependents CANNOT
    recompute through a released checkpoint."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:
        # not a LogicalRDD (never checkpointed) or session gone —
        # nothing to free either way
        pass
