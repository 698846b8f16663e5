"""Dump .explain("formatted") for catalog queries to files.

Usage: python tools/capture_plans.py --tree /root/repo --suffix after \
           --out-dir /root/repo/plans/r12 query [query ...]

The judge checks plan claims against plans/r12/<query>_{before,after}.txt;
run this once on the round-start tree (suffix before) and once on the
optimized tree (suffix after).
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="/root/repo")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.tree)
    import __spark_entry__ as entry_mod
    from chilekids_etl_pipeline_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
