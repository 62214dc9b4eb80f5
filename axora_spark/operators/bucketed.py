"""Storage-bucketed seen table — the co-located-join fast path.

SCALE.md's J1 story maps the catalog's parquet tables onto Iceberg
`bucket(N, url_hash)` partitioning; this module DEMONSTRATES that plan in
the sandbox with Spark's native bucketed tables (`bucketBy(N, key)` +
`saveAsTable`): a frontier ⋈ seen anti-join where the seen side — the
10^10-row side at production scale — is read pre-partitioned from disk
and never re-shuffled. Only the (much smaller) per-wave frontier pays an
Exchange, sized to the table's bucket count.

Why this matters at 100 TB: the seen set is the largest table in the
system and is re-joined EVERY wave. Without storage bucketing each wave
shuffles the whole seen set; with it, the shuffle cost per wave is
O(frontier), independent of accumulated crawl history. The same call
sites swap to Iceberg's `bucket(N, url_hash)` partition transform +
storage-partitioned joins on a real cluster (the Spark session-catalog
bucketing metadata used here is the sandbox stand-in, as SnapshotCatalog
is for snapshots).

Sort-merge is the right join family here (not SHUFFLE_HASH as in the
dynamic-frontier path, operators/frontier.py): the bucketed files are
written sorted within buckets, so the seen side streams from disk in
join order with no hash table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_seen(df: DataFrame, table: str, n_buckets: int = 32,
                        key: str = "url_hash") -> None:
    """Persist the seen set as a bucketed+sorted table. Overwrites.

    On a cluster: one-time cost (plus per-wave fast-appends of newly-seen
    keys into the same bucket layout); every subsequent wave's anti-join
    reads the buckets back co-partitioned."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet")
     .saveAsTable(table))


def bucketed_anti_join_seen(spark: SparkSession, frontier: DataFrame,
                            table: str, key: str = "url_hash") -> DataFrame:
    """frontier LEFT ANTI ⋈ bucketed seen on `key`: the seen scan comes
    back `Bucketed: true` with no Exchange above it — only the frontier
    side shuffles (to the bucket count). Plan-gated in
    tests/test_bucketed.py."""
    seen = spark.table(table).select(key)
    return frontier.join(seen, on=key, how="left_anti")
