"""Idle A/B timer for individual catalog queries.

Runs each named query at the given sf dir: one warm-up execution, then
N timed executions (default 3), printing min/median wall seconds. Use
for persist/repartition A/Bs where the committed BENCH_DETAIL numbers
need an idle-machine measurement.

Usage: python tools/time_queries.py [--sf DIR] [--n N] query [query ...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time


def time_query(spark, fn, sf_dir: str, n: int) -> list[float]:
    walls = []
    for i in range(n + 1):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        wall = time.monotonic() - t0
        if i > 0:  # first run is warm-up (codegen JIT, file listing)
            walls.append(wall)
    return walls


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--baseline", action="store_true",
                    help="also time each query's DuckDB oracle "
                         "(skip queries whose oracle is scale-infeasible)")
    ap.add_argument("--json-out", help="write the per-query record here")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from chilekids_etl_pipeline_spark.session import get_spark

    spark = get_spark("time-queries")
    qs = entry_mod.queries()
    con = None
    if args.baseline:
        import glob
        import os

        import duckdb

        con = duckdb.connect()
        for p in glob.glob(f"{args.sf}/*.parquet"):
            t = os.path.basename(p).removesuffix(".parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        oracles = entry_mod.oracle_sql()
    record: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        walls = time_query(spark, qs[name], args.sf, args.n)
        rec = {"median": round(statistics.median(walls), 4),
               "min": round(min(walls), 4)}
        if con is not None and name in oracles:
            bwalls = []
            for i in range(args.n + 1):
                t0 = time.monotonic()
                con.execute(
                    f"COPY ({oracles[name]}) TO '/dev/null' (FORMAT csv)"
                )
                if i > 0:
                    bwalls.append(time.monotonic() - t0)
            rec["baseline"] = round(statistics.median(bwalls), 4)
            rec["vs_baseline"] = (
                round(rec["median"] / rec["baseline"], 4)
                if rec["baseline"] > 0 else None
            )
        record[name] = rec
        print(f"{name}: " + " ".join(f"{k}={v}" for k, v in rec.items())
              + f" runs={['%.3f' % w for w in walls]}")
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump({"sf_dir": args.sf, "n": args.n, "queries": record},
                      f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
