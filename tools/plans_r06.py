"""Dump FULL .explain("formatted") output for named queries into
plans/r06/<name>_<tag>.txt — the optimization round's before/after plan
evidence (OPTIMIZATION_r06.md cites these files).

Usage: python tools/plans_r06.py <tag> [query ...]     (default: all)
Runs at sf0.001 (plan SHAPE is the content, not sizes).
"""

from __future__ import annotations

import io
import os
import sys


def main():
    # import the package next to THIS file (lets a detached HEAD
    # worktree dump the pre-change plans with its own code)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = sys.argv[1]
    names = sys.argv[2:]
    from axora_spark.queries import QUERIES
    from axora_spark.session import get_spark
    if not names:
        names = list(QUERIES)
    spark = get_spark("plans-r06", cores=8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    outdir = "/root/repo/plans/r06"
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(f"{name}: {len(txt.splitlines())} plan lines, "
              f"{txt.count('Scan parquet')} parquet scans -> {path}")


if __name__ == "__main__":
    main()
