"""C5 — embedding stage + X9 cosine similarity.

The reference batches 32 chunks per POST to a TEI service serving
BAAI/bge-base-en-v1.5 (768-dim) and skips failed batches
(chunking.go:71-93, pkg/embedding/mpnetbasev2.go:27-65). This sandbox is
network-free: the stand-in is a deterministic hash embedding — a unit
vector seeded from sha256(text) — computed inside `mapInPandas` so the
Arrow batch IS the request batch (SURVEY.md §2.8 C5). A real deployment
swaps `_hash_embed_batch` for the model call; the plan shape is identical.

X9 cosine: the reference hand-rolls dot/norm with a 10-iteration Newton
sqrt (pkg/embedding/client.go:19-48) — an approximation we document but do
not replicate; ours is exact IEEE (SURVEY.md §2.7 X9), expressed natively
with zip_with/aggregate so it is JVM-side and DuckDB-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 768


def hash_embedding_py(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic unit vector from sha256(text) (FIXTURES.md §5)."""
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dim).astype(np.float32)
    n = np.linalg.norm(v)
    return v / (n if n > 0 else 1.0)


def _hash_embed_batch(texts: pd.Series, dim: int) -> list:
    return [hash_embedding_py(t or "", dim).tolist() for t in texts]


def with_embeddings(df: DataFrame, text_col: str = "text",
                    out_col: str = "embedding",
                    dim: int = EMBED_DIM) -> DataFrame:
    """Append an embedding column via mapInPandas (batch = Arrow batch)."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = _hash_embed_batch(pdf[text_col], dim)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Exact cosine over two array<float> columns — native HOFs, no UDF."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)
