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
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from chilekids_etl_pipeline_spark.session import get_spark

    spark = get_spark("time-queries")
    qs = entry_mod.queries()
    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        walls = time_query(spark, qs[name], args.sf, args.n)
        print(
            f"{name}: min={min(walls):.3f}s "
            f"median={statistics.median(walls):.3f}s runs={['%.3f' % w for w in walls]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
