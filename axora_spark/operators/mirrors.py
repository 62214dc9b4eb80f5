"""Cross-host mirror detection: which host PAIRS serve the same
content? The host-level complement of document near-dup — a crawler
that finds alpha.example.org mirroring beta.example.org should crawl
one and skip the other (Bharat & Broder, "Mirror, mirror on the Web",
WWW 1999: host-pair similarity from shared content fingerprints).

Scale shape: the naive formulation self-joins the corpus on
content fingerprint — quadratic blow-up on boilerplate fingerprints
shared by every host. This implementation instead:
  1. dedups to (host, fingerprint) — one keyed aggregate;
  2. groups by fingerprint into a SORTED host list, CAPPED at
     max_hosts_per_fp (a fingerprint on 10k hosts is boilerplate, not
     a mirror signal — the same per-bucket-cap trade as LSH candidate
     pairs; over-cap fingerprints are EXCLUDED from pairing — they
     contribute no mirror evidence and no count; ADVICE r5 corrected
     an earlier claim that they were counted);
  3. explodes each list into its O(cap²) ordered pairs and counts per
     pair — a keyed aggregate over pair rows.
The pair fan-out is bounded per fingerprint by the cap, so no hot key
can explode the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_mirrors(docs: DataFrame, host_col: str = "host",
                   fp_col: str = "fingerprint", min_shared: int = 8,
                   min_ratio: float = 0.5,
                   max_hosts_per_fp: int = 64) -> DataFrame:
    """(host_a < host_b, shared, n_a, n_b, ratio) for host pairs with
    >= min_shared common fingerprints and ratio = shared /
    min(|a|, |b|) >= min_ratio — 'b mirrors a' when most of the
    smaller host's content also lives on the larger."""
    hf = docs.select(F.col(host_col).alias("host"),
                     F.col(fp_col).alias("fp")).distinct()
    per_host = hf.groupBy("host").agg(F.count("*").alias("n_docs"))
    by_fp = (hf.groupBy("fp")
             .agg(F.array_sort(F.collect_set("host")).alias("hosts"))
             .filter((F.size("hosts") >= 2)
                     & (F.size("hosts") <= max_hosts_per_fp)))
    # ordered pairs from the sorted list: (i, j) with i < j
    pairs = (by_fp.select(
        F.explode(F.expr(
            "flatten(transform(hosts, (x, i) -> "
            "transform(slice(hosts, i + 2, size(hosts)), "
            "y -> struct(x as a, y as b))))")).alias("p"))
        .select(F.col("p.a").alias("host_a"),
                F.col("p.b").alias("host_b")))
    shared = pairs.groupBy("host_a", "host_b").agg(
        F.count("*").alias("shared"))
    na = per_host.select(F.col("host").alias("host_a"),
                         F.col("n_docs").alias("n_a"))
    nb = per_host.select(F.col("host").alias("host_b"),
                         F.col("n_docs").alias("n_b"))
    out = (shared.join(na, "host_a").join(nb, "host_b")
           .withColumn("ratio",
                       F.col("shared")
                       / F.least("n_a", "n_b").cast("double"))
           .filter((F.col("shared") >= min_shared)
                   & (F.col("ratio") >= min_ratio)))
    return out.select("host_a", "host_b", "shared", "n_a", "n_b",
                      F.round("ratio", 6).alias("ratio"))
