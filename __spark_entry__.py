"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the crawl engine's frontier-admission plan
                (canonicalize-shaped URL synth → F1/F3 filters → U1 dedup →
                W1 salted politeness admission) over the sf0.001 documents
                table as the URL universe.
queries()     — one entry per implemented operator (SURVEY.md §2 + the
                training-data op family); backed by axora_spark.queries.
oracle_sql()  — exactly-matching DuckDB SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    import sys
    sys.path.insert(0, "/root/repo")
    from axora_spark.queries import q_politeness_rank
    return q_politeness_rank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import sys
    sys.path.insert(0, "/root/repo")
    from axora_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import sys
    sys.path.insert(0, "/root/repo")
    from axora_spark.queries import ORACLES
    return dict(ORACLES)
