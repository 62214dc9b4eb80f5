"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, schema-ish, and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
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
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
            rel = con.sql(ORACLES[name])
            dcols = rel.columns
            drows = [dict(zip(dcols, t)) for t in rel.fetchall()]
            if sorted(scols) != sorted(dcols):
                failures.append((name, f"cols {sorted(scols)} != {sorted(dcols)}"))
                print(f"FAIL {name}: column mismatch {sorted(scols)} vs {sorted(dcols)}")
                continue
            a, b = normalize(srows, scols), normalize(drows, dcols)
            if len(a) != len(b):
                failures.append((name, f"rowcount {len(a)} != {len(b)}"))
                print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
                da = [x for x in a if x not in set(b)][:3]
                db = [x for x in b if x not in set(a)][:3]
                print("  spark-only:", da)
                print("  duck-only :", db)
            elif a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                failures.append((name, f"values differ, e.g. {diff[:1]}"))
                print(f"FAIL {name}: {len([1 for x,y in zip(a,b) if x!=y])} differing rows")
                for x, y in diff:
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
