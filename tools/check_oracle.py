"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, schema-ish, and
order-insensitive values.

Both result sets are fetched THROUGH PANDAS — the same path the driver uses
— so type artifacts survive into the comparison (e.g. DuckDB HUGEINT →
pandas float64 renders 36 as 36.0 and must mismatch a Spark int 36, exactly
as the driver's value hash would).

Usage: python tools/check_oracle.py [sf_dir] [query ...] [--json OUT]

--json OUT writes the full-registry evidence artifact (VERDICT r4 #4:
the driver's 50-row rotation stopped evidencing all 56 queries; this
file does, every round): {"sf_dir":..., "results": {name: {"status":
"match"|"rows-only"|"FAIL ...", "rows": N}}}.
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
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_oracle.py [sf_dir] [query ...] "
                     "[--json OUT]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

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
    results = {}
    n_run = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in ORACLES:
                print(f"ok   {name}: {len(spdf)} rows (rows-only, no oracle)")
                results[name] = {"status": "rows-only", "rows": len(spdf)}
                continue
            dpdf = con.sql(ORACLES[name]).df()
            results[name] = {"status": "match", "rows": len(spdf)}
            if sorted(spdf.columns) != sorted(dpdf.columns):
                results[name] = {"status": "FAIL cols", "rows": len(spdf)}
                failures.append((name, "cols"))
                print(f"FAIL {name}: column mismatch "
                      f"{sorted(spdf.columns)} vs {sorted(dpdf.columns)}")
                continue
            a, b = normalize_pdf(spdf), normalize_pdf(dpdf)
            if len(a) != len(b):
                results[name] = {"status": f"FAIL rowcount {len(a)}!={len(b)}",
                                 "rows": len(a)}
                failures.append((name, f"rowcount {len(a)} != {len(b)}"))
                print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
                da = [x for x in a if x not in set(b)][:3]
                db = [x for x in b if x not in set(a)][:3]
                print("  spark-only:", da)
                print("  duck-only :", db)
            elif a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y]
                results[name] = {"status": f"FAIL {len(diff)} rows differ",
                                 "rows": len(a)}
                failures.append((name, f"values differ, e.g. {diff[:1]}"))
                print(f"FAIL {name}: {len(diff)} differing rows")
                for x, y in diff[:3]:
                    print("  spark:", x[:180])
                    print("  duck :", y[:180])
            else:
                print(f"ok   {name}: {len(a)} rows")
        except Exception as e:
            results[name] = {"status": f"ERR {type(e).__name__}", "rows": -1}
            failures.append((name, str(e)[:200]))
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")

    if json_out:
        import json as _json
        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "n_registered": len(QUERIES),
                        "n_run": n_run, "n_fail": len(failures),
                        "results": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{n_run - len(failures)}/{n_run} match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
