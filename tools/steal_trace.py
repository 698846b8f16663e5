"""Sample hypervisor CPU steal from /proc/stat while a benchmark runs.

r12 established that this host sits behind a noisy hypervisor (steal
sampled 0-34% in multi-minute windows), which makes distant bench runs
incomparable. Every committed bench record should carry its steal trace
so contaminated windows can be identified after the fact.

Usage (background, alongside a bench):
  python tools/steal_trace.py --out STEAL_xxx.json --interval 10 &
  ... run bench ...
  kill -INT <pid>     # flushes the trace and exits
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import time


def _cpu_line() -> list[int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return [int(x) for x in parts[1:]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--interval", type=float, default=10.0)
    args = ap.parse_args()

    samples: list[dict] = []
    stop = {"flag": False}

    def _finish(*_a):
        stop["flag"] = True

    signal.signal(signal.SIGINT, _finish)
    signal.signal(signal.SIGTERM, _finish)

    prev = _cpu_line()
    t_start = time.time()
    while not stop["flag"]:
        time.sleep(args.interval)
        cur = _cpu_line()
        delta = [c - p for c, p in zip(cur, prev)]
        total = sum(delta)
        # /proc/stat cpu fields: user nice system idle iowait irq softirq steal
        steal = delta[7] if len(delta) > 7 else 0
        busy = total - delta[3] - (delta[4] if len(delta) > 4 else 0)
        samples.append(
            {
                "t": round(time.time() - t_start, 1),
                "steal_pct": round(100.0 * steal / total, 2) if total else 0.0,
                "busy_pct": round(100.0 * busy / total, 2) if total else 0.0,
            }
        )
        prev = cur
        # flush continuously so a hard kill still leaves a usable trace
        with open(args.out, "w") as f:
            json.dump(
                {
                    "interval_s": args.interval,
                    "n": len(samples),
                    "steal_avg": round(
                        sum(s["steal_pct"] for s in samples) / len(samples), 2
                    ),
                    "steal_max": max(s["steal_pct"] for s in samples),
                    "samples": samples,
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
