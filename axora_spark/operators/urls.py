"""URL column operators: canonicalize (X2), absolutize (X1), hash, host.

Vectorized pandas UDFs over Arrow batches (input_hint mandate: no per-row
Python UDFs). The pure-Python core lives in functions/urlnorm.py and is
shared with the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from axora_spark.functions import urlnorm

# return types as DataType objects (not DDL strings): module import must not
# require an active SparkSession


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(urlnorm.canonicalize, na_action="ignore").fillna("")


@F.pandas_udf(T.StringType())
def absolutize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    out = [urlnorm.absolutize(b or "", h or "") for b, h in zip(base, href)]
    return pd.Series(out, index=base.index)


@F.pandas_udf(T.StringType())
def skip_norm_path_udf(urls: pd.Series) -> pd.Series:
    return urls.map(urlnorm.skip_norm_path, na_action="ignore").fillna("")


def url_hash(canonical_url: Column | str) -> Column:
    """Dedup/bucketing key. Spark-native xxhash64 replaces the reference's
    FNV-1a (crawler/boltdb.go:58-67) — the invariant is set membership of
    canonical URLs, not specific hash values (SURVEY.md §2.3 J1)."""
    return F.xxhash64(canonical_url)


def host_col(url: Column | str) -> Column:
    """Host, lowercased — native parse_url, stays in codegen."""
    return F.lower(F.parse_url(url, F.lit("HOST")))
