"""Extra benchmark harness for the optimization round (bench.py is FROZEN
for measurement; this file exists for per-query isolation runs, guide
section 1.4).

Same methodology as bench.py (noop sink materializes every column, fresh
plan per rep, min over reps, UDF-worker warmup) but over an arbitrary
subset of queries so a single query's number is not polluted by suite
contention.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
  AXORA_BENCH_REPS=3 python bench_extra.py pagerank hostrank
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from axora_spark.session import get_spark  # noqa: E402
from axora_spark.queries import QUERIES  # noqa: E402


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    reps = int(os.environ.get("AXORA_BENCH_REPS", "2"))
    spark = get_spark("axora-bench-extra", cores=int(cpus))

    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def _warm(s: pd.Series) -> pd.Series:
        return s.astype("int32")

    spark.range(10_000).repartition(int(cpus)) \
        .select(_warm(F.col("id").cast("int"))) \
        .write.mode("overwrite").format("noop").save()

    per_query: dict[str, float] = {}
    for name in names:
        secs = []
        for _ in range(reps):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            QUERIES[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            secs.append(time.time() - t0)
        per_query[name] = round(min(secs), 3)
        print(f"# {name}: {min(secs):.3f}s {['%.2f' % s for s in secs]}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "reps": reps,
                      "queries": per_query}))


if __name__ == "__main__":
    main()
