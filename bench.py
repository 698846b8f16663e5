"""Benchmark headline queries; print ONE JSON line.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query gets one warm-up run (JIT, code-gen,
file-listing caches) and one timed run, executed with the noop sink so the
full plan runs without driver-side collection.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_volume",
    "financials_monthly",
    "changed_records",
    "events_sessionize",
    "top_orders_per_customer",
]
# appended as they land in the catalog
OPTIONAL = [
    "dedup_minhash_lsh",
    "knn_topk_cosine",
    "dedup_exact",
    "text_quality",
    "elt_end_to_end",
    "staging_records",
    "ann_ivf_cosine",
]


def run_query(fn, spark, sf_dir) -> float:
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry_mod
    from chilekids_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    names = HEADLINE + [n for n in OPTIONAL if n in qs]
    timings: dict[str, float] = {}
    for name in names:
        timings[name] = round(run_query(qs[name], spark, sf_dir), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
