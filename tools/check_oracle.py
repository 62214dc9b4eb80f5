"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, schema-ish, and
order-insensitive values.

Both result sets are fetched THROUGH PANDAS — the same path the driver uses
— so type artifacts survive into the comparison (e.g. DuckDB HUGEINT →
pandas float64 renders 36 as 36.0 and must mismatch a Spark int 36, exactly
as the driver's value hash would).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys


def norm_value(v):
    """Mirror the driver's pandas-level value semantics: floats rounded to
    6 places (NaN sentinel), numpy scalars unwrapped WITHOUT changing their
    int-vs-float class, lists/arrays recursed."""
    import numpy as np

    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(round(f, 6))
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return repr(v)


def normalize_pdf(pdf):
    cols = sorted(pdf.columns)
    out = []
    for _, r in pdf.iterrows():
        out.append("|".join(norm_value(r[c]) for c in cols))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import duckdb

    from axora_spark.queries import ORACLES, QUERIES
    from axora_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in ORACLES:
                print(f"ok   {name}: {len(spdf)} rows (rows-only, no oracle)")
                continue
            dpdf = con.sql(ORACLES[name]).df()
            if sorted(spdf.columns) != sorted(dpdf.columns):
                failures.append((name, "cols"))
                print(f"FAIL {name}: column mismatch "
                      f"{sorted(spdf.columns)} vs {sorted(dpdf.columns)}")
                continue
            a, b = normalize_pdf(spdf), normalize_pdf(dpdf)
            if len(a) != len(b):
                failures.append((name, f"rowcount {len(a)} != {len(b)}"))
                print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
                da = [x for x in a if x not in set(b)][:3]
                db = [x for x in b if x not in set(a)][:3]
                print("  spark-only:", da)
                print("  duck-only :", db)
            elif a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y]
                failures.append((name, f"values differ, e.g. {diff[:1]}"))
                print(f"FAIL {name}: {len(diff)} differing rows")
                for x, y in diff[:3]:
                    print("  spark:", x[:180])
                    print("  duck :", y[:180])
            else:
                print(f"ok   {name}: {len(a)} rows")
        except Exception as e:
            failures.append((name, str(e)[:200]))
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")

    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
