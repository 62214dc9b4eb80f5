"""axora_spark — a PySpark-native distributed URL-frontier + fetch-scheduler
engine with the capabilities of the Go reference crawler (Chandra179/axora),
re-expressed Spark-first.

Layout:
    session      SparkSession builder (Arrow, AQE, UTC, shuffle sizing)
    config       CrawlConfig: seeds, whitelist, politeness budget, depth
    schemas      every StructType (frontier, seen, documents, chunks, ...)
    catalog      snapshot-versioned parquet table store (Iceberg-like:
                 append / overwrite / merge-into / time-travel / lineage)
    functions/   pure column-expression function library (quality score,
                 url parts, hashing, cosine) — JVM-side, codegen'd
    operators/   dataflow operators: filters, frontier dedup/anti-join,
                 politeness scheduler, chunkers, dedup family (minhash/
                 simhash/exact), similarity search
    sources/     seed-list source, synthetic fetch (fixture corpus)
    plans/       the wave-loop crawl driver (BFS plan), lineage, resume
    oracle       pure-Python deterministic re-simulation of the reference
                 crawl rules (the correctness oracle)
    datagen      deterministic synthetic link graph + span documents
"""

__version__ = "0.1.0"
