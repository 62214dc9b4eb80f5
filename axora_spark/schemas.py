"""All table schemas (SURVEY.md §1). One place, imported everywhere."""

from __future__ import annotations

from pyspark.sql import types as T

# D1 — URL frontier (Iceberg-like `frontier` table; bucket key = url_hash)
FRONTIER = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("priority", T.DoubleType(), False),
    T.StructField("discovered_wave", T.IntegerType(), False),
    T.StructField("status", T.StringType(), False),  # pending/admitted/deferred/fetched
])

# D2 — URL-seen set (reference: BoltDB bucket, crawler/boltdb.go:58-83)
SEEN = T.StructType([
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("wave", T.IntegerType(), False),
])

# Accumulated link graph (priority_mode="pagerank": authority-first
# admission, VERDICT r4 #5) — url_hash endpoints keep rows 20 bytes
LINKS = T.StructType([
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("src", T.LongType(), False),
    T.StructField("dst", T.LongType(), False),
])

# Committed link-authority rank table (priority_mode="pagerank") —
# overwritten on rank-recompute waves (cfg.rank_every), joined onto the
# frontier every wave
RANKS = T.StructType([
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("rank", T.DoubleType(), False),
])

# Continuous trap-detection state (cfg.trap_detect): the family profile
# at (host, template, bucket) register grain — every column is a max,
# so per-wave merge (union + groupBy max) is idempotent under replay;
# deliberately OUTSIDE crash rollback (a superset state only re-flags
# the same families, and replayed waves re-derive identical rows)
TRAP_STATE = T.StructType([
    T.StructField("host", T.StringType(), True),
    T.StructField("template", T.StringType(), True),
    T.StructField("bucket", T.LongType(), False),
    T.StructField("m_reg", T.IntegerType(), False),
    T.StructField("max_depth", T.IntegerType(), False),
    T.StructField("max_params", T.IntegerType(), False),
])

# Latency-adaptive politeness observation rows (operators/adaptive.py):
# host × wave grain — per-URL latency collapsed map-side. The crawl loop
# does NOT accumulate these (that table would grow hosts × waves over a
# long session); it folds each wave's rows into FETCH_STATE below. The
# log shape remains the input contract of the analytics-side
# latency_budgets operator (q_adaptive_budgets).
FETCH_OBS = T.StructType([
    T.StructField("host", T.StringType(), True),
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("sum_ms", T.LongType(), True),
    T.StructField("n", T.LongType(), False),
])

# Incrementally-folded EWMA latency state: ONE row per observed host
# however long the session runs (the trap_state lesson); the wave loop
# overwrites it each wave and lineage rollback makes replays fold once
FETCH_STATE = T.StructType([
    T.StructField("host", T.StringType(), True),
    T.StructField("est_ms", T.DoubleType(), False),
    T.StructField("n_waves", T.IntegerType(), False),
])

# Admission log: the deterministic crawl order (W4)
ADMITTED = T.StructType([
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("depth", T.IntegerType(), False),
])

# D4 — fetched page (synthetic fixture corpus in this sandbox)
FETCHED = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("http_status", T.IntegerType(), False),
    T.StructField("body_md", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("metas", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType(), True),
        T.StructField("property", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ])), True),
    T.StructField("out_links", T.ArrayType(T.StringType()), True),
])

# D5 — interleaved text+media span documents (authoritative input_hint shape)
SPAN = T.StructType([
    T.StructField("kind", T.StringType(), False),       # 'text' | 'media'
    T.StructField("text", T.StringType(), False),       # '' for media spans
    T.StructField("media_ref", T.StringType(), False),  # '' for text spans
    T.StructField("offset", T.IntegerType(), False),    # 0-based span order
])

# P1 — ContentMetadata projection (crawler/text_extraction.go:24-41, mapped
# at :66-79). fingerprint = sha256 hex of the span-concatenated text (the
# reference delegates to trafilatura's fingerprint — documented divergence,
# SEMANTICS.md); raw_metadata = every meta key → content (the reference's
# map[string]interface{} stringified, SURVEY.md §1.2).
METADATA = T.StructType([
    T.StructField("title", T.StringType(), True),
    T.StructField("author", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("site_name", T.StringType(), True),
    T.StructField("published_date", T.TimestampType(), True),
    T.StructField("modified_date", T.TimestampType(), True),
    T.StructField("language", T.StringType(), True),
    T.StructField("tags", T.ArrayType(T.StringType()), True),
    T.StructField("categories", T.ArrayType(T.StringType()), True),
    T.StructField("image_url", T.StringType(), True),
    T.StructField("license", T.StringType(), True),
    T.StructField("id", T.StringType(), True),
    T.StructField("fingerprint", T.StringType(), True),
    T.StructField("excerpt", T.StringType(), True),
    T.StructField("comments_count", T.IntegerType(), True),
    T.StructField("raw_metadata", T.MapType(T.StringType(), T.StringType()),
                  True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("spans", T.ArrayType(SPAN), False),
    T.StructField("metadata", METADATA, True),  # null on pre-parsed corpora
])

# D6 — chunks
CHUNKS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("chunk_index", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("token_count", T.IntegerType(), False),
])

# D7 — vector sink (MERGE key = content_hash; qdrantdb/crawl_vector.go:42-45)
VECTORS = T.StructType([
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("text", T.StringType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
])

# Incremental near-dup ingest (cfg.near_dup_ingest): the append-only
# minhash-signature store and the per-wave dup audit log
SIGS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("sig", T.ArrayType(T.StringType()), False),
])

DUP_LOG = T.StructType([
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("dup_of", T.StringType(), False),
    T.StructField("est_jaccard", T.DoubleType(), False),
])

# streaming/dedup.py — no wave column (micro-batch ids are not stable
# across checkpoint replays, so they must not be part of the contents)
STREAM_DUP_LOG = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("dup_of", T.StringType(), False),
    T.StructField("est_jaccard", T.DoubleType(), False),
])

# Lineage (north_rule: per-partition lineage + metrics, resumable)
LINEAGE = T.StructType([
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("table", T.StringType(), False),
    T.StructField("snapshot_id", T.LongType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_partitions", T.IntegerType(), False),
])

METRICS = T.StructType([
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("candidates", T.LongType(), False),
    T.StructField("admitted", T.LongType(), False),
    T.StructField("deferred", T.LongType(), False),
    T.StructField("deduped", T.LongType(), False),
])

# Synthetic link graph fixture (FIXTURES.md §3)
LINK_GRAPH = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("metas", FETCHED["metas"].dataType, True),
    T.StructField("body_md", T.StringType(), True),
    T.StructField("out_links", T.ArrayType(T.StringType()), True),
])

# Raw-HTML fixture corpus (the default crawl input: the engine derives
# title/metas/out_links/body_md itself via operators.html — X3/X4/X5)
HTML_GRAPH = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), False),
    T.StructField("body_html", T.StringType(), True),
])
