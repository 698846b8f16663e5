"""Per-stage empirical profile of one or more catalog queries (guide §1.1).

Runs each named query exactly like bench.run_query (noop sink, warm-ups
first), then pulls the completed stages of the timed run from the local
Spark UI REST API and prints, per stage: executor run time, shuffle
read/write bytes, input bytes, task count and max/median task time —
the "where is the time actually going" table the optimization guide's
empirical loop starts from.

Usage: python tools/profile_query.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read().decode())


def profile(spark, fn, sf_dir: str, ui: str, label: str) -> dict:
    sc = spark.sparkContext
    # warm-ups (codegen, file listing)
    for _ in range(2):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    app_id = sc.applicationId
    before_ids = {
        s["stageId"]
        for s in _api(ui, f"applications/{app_id}/stages?status=complete")
    }
    sc.setJobDescription(f"profile:{label}")
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobDescription(None)
    stages = [
        s
        for s in _api(ui, f"applications/{app_id}/stages?status=complete")
        if s["stageId"] not in before_ids
    ]
    rows = []
    for s in sorted(stages, key=lambda s: -s["executorRunTime"]):
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "runtime_s": round(s["executorRunTime"] / 1000, 2),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "input_mb": round(s["inputBytes"] / 1048576, 1),
                "sh_read_mb": round(s["shuffleReadBytes"] / 1048576, 1),
                "sh_write_mb": round(s["shuffleWriteBytes"] / 1048576, 1),
                "fetch_wait_s": round(
                    s.get("shuffleFetchWaitTime", 0) / 1000, 2
                ),
                "spill_mb": round(s["diskBytesSpilled"] / 1048576, 1),
            }
        )
    return {"query": label, "wall_s": round(wall, 3), "stages": rows}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json-out")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from chilekids_etl_pipeline_spark.session import get_spark

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    qs = entry_mod.queries()
    out = []
    for name in args.queries:
        rec = profile(spark, qs[name], args.sf, ui, name)
        out.append(rec)
        print(f"\n== {name}: wall {rec['wall_s']} s ==")
        hdr = (
            f"{'stage':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} "
            f"{'in_MB':>7} {'shR_MB':>7} {'shW_MB':>7} {'wait_s':>6} "
            f"{'spill':>6}  name"
        )
        print(hdr)
        for r in rec["stages"]:
            print(
                f"{r['stage']:>5} {r['tasks']:>5} {r['runtime_s']:>7} "
                f"{r['cpu_s']:>7} {r['input_mb']:>7} {r['sh_read_mb']:>7} "
                f"{r['sh_write_mb']:>7} {r['fetch_wait_s']:>6} "
                f"{r['spill_mb']:>6}  {r['name']}"
            )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
