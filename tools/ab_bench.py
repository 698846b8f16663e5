"""Alternating A/B of the 14 bench headliners across two repo trees.

The r9 verdict's open question: the sf0.1 headline moved 10.86 -> 17.74 s
round-over-round, but driver-to-driver comparisons confound code changes
with ambient VM drift. The only clean separation is an ALTERNATING A/B on
the same idle VM: tree A, tree B, tree A, ... each in a fresh subprocess
(own JVM — both trees ship the same package name, so they can never share
an interpreter), timing each headliner exactly like bench.run_query
(2 warm-ups, median of 3) and skipping the DuckDB baseline entirely.

Usage:
  python tools/ab_bench.py /root/repo /root/repo/.r8tree --rounds 3 \
      --out AB_r8_vs_r10.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_volume",
    "financials_monthly",
    "changed_records",
    "events_sessionize",
    "top_orders_per_customer",
    "dedup_minhash_lsh",
    "knn_topk_cosine",
    "dedup_exact",
    "text_quality",
    "elt_end_to_end",
    "staging_records",
    "ann_ivf_cosine",
]

_CHILD = r"""
import json, os, statistics, sys, time
tree, sf_dir, out_path, names_json = sys.argv[1:5]
names = json.loads(names_json)
sys.path.insert(0, tree)
import __spark_entry__ as entry_mod
from chilekids_etl_pipeline_spark.session import get_spark
spark = get_spark("ab-bench")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()
out = {}
for name in names:
    fn = qs[name]
    for _ in range(2):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(walls), 4)
with open(out_path, "w") as f:
    json.dump(out, f)
"""


def run_tree(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    try:
        # capture output so a child failure raises with its stderr
        # attached instead of a bare CalledProcessError (r10 advice);
        # prepend the tree to any inherited PYTHONPATH rather than
        # clobbering it
        inherited = os.environ.get("PYTHONPATH")
        pypath = tree if not inherited else tree + os.pathsep + inherited
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, tree, sf_dir, out_path,
             json.dumps(names)],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": pypath},
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"ab_bench child for tree {tree!r} exited "
                f"{proc.returncode}; stderr tail:\n"
                + proc.stderr[-4000:]
            )
        with open(out_path) as f:
            return json.load(f)
    finally:
        os.unlink(out_path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.queries or HEADLINE

    runs: dict[str, list[dict[str, float]]] = {"a": [], "b": []}
    for i in range(args.rounds):
        for label, tree in (("a", args.tree_a), ("b", args.tree_b)):
            res = run_tree(tree, sf_dir, names)
            runs[label].append(res)
            print(f"round {i + 1} {label} ({tree}): "
                  f"total={sum(res.values()):.2f}s", file=sys.stderr)

    med = {
        label: {
            n: round(statistics.median(r[n] for r in runs[label]), 4)
            for n in names
        }
        for label in ("a", "b")
    }
    record = {
        "sf_dir": sf_dir,
        "rounds": args.rounds,
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "runs": runs,
        "median": med,
        "total_a": round(sum(med["a"].values()), 4),
        "total_b": round(sum(med["b"].values()), 4),
        "delta_b_minus_a": {
            n: round(med["b"][n] - med["a"][n], 4) for n in names
        },
    }
    line = json.dumps(record)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
