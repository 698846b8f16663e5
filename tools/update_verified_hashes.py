"""Record impl hashes for externally-verified keys (VERIFIED_IMPLS.json).

A green row in CORRECTNESS_r{N}.json vouches for the implementation as
it existed when the round-N gate ran — not for the name forever. This
tool pins that: run it at ROUND START, right after a new correctness
artifact lands and BEFORE touching any query implementation, so each
newly-green key's current source+oracle hash is recorded as "the code
that was verified". plans.externally_verified() then treats a key as
verified only while its present hash matches; editing a verified entry
rotates it back into the external gate window automatically.

Usage:
  python tools/update_verified_hashes.py            # add newly-green keys
  python tools/update_verified_hashes.py --drop K   # force K unverified
  python tools/update_verified_hashes.py --rebuild  # re-record all green
                                                    # (ONLY at round start)

Default mode never overwrites an existing recorded hash — a changed
implementation must earn a fresh green row, at which point the next
round-start run records its new hash.

ROUND-START PITFALL (bit r10): when a round edits many already-recorded
keys and the driver's gate re-verifies them, their recorded hashes are
STALE at the next round start — and default mode will not refresh them,
leaving dozens of genuinely-re-verified keys counted as unverified. At
round start (working tree identical to the tree the gate ran on) the
correct mode is --rebuild, which re-records every green key's hash from
the current source. Default mode now detects this case and says so: it
prints a warning listing latest-green keys whose recorded hash no longer
matches, instead of silently under-counting. Only use --rebuild at round
start — mid-round it would launder unverified edits into verified ones.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
OUT = REPO_ROOT / "VERIFIED_IMPLS.json"


def _n_artifacts() -> int:
    return len(list(REPO_ROOT.glob("CORRECTNESS_r*.json")))


def _latest_green() -> set[str]:
    """Green rows of the NEWEST artifact only — a pending (dropped) key
    re-earns its hash only from a gate run that post-dates the drop."""
    arts = sorted(REPO_ROOT.glob("CORRECTNESS_r*.json"))
    if not arts:
        return set()
    data = json.loads(arts[-1].read_text())
    out = set()
    for key, row in data.items():
        if not isinstance(row, dict) or row.get("err") is not None:
            continue
        flags = {k: v for k, v in row.items() if k.endswith("_match")}
        if (flags.get("rows_match") is True
                and flags.get("schema_match") is True
                and all(v is True for v in flags.values())):
            out.add(key)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--drop", nargs="*", default=[])
    args = ap.parse_args()

    sys.path.insert(0, str(REPO_ROOT))
    from chilekids_etl_pipeline_spark import plans

    plans.load_all()
    green = plans._externally_verified()
    existing: dict = {}
    if OUT.exists():
        existing = json.loads(OUT.read_text())
    if args.rebuild:
        # re-record hashes from scratch (e.g. after a fingerprint-scheme
        # change) but NEVER forget pending re-verification drops
        existing = {"_pending": existing.get("_pending", {})}
    # pending: key -> artifact count at drop time; the key stays
    # unverified until a LATER round's artifact shows it green again
    pending: dict[str, int] = dict(existing.get("_pending", {}))
    out = {k: v for k, v in existing.items() if not k.startswith("_")}

    latest = _latest_green()
    n_arts = _n_artifacts()
    cleared = [
        k for k, n in pending.items() if n_arts > n and k in latest
    ]
    for k in cleared:
        pending.pop(k)

    added = []
    for key in sorted(green):
        if key in out or key in pending or key not in plans.QUERIES:
            continue
        out[key] = plans.impl_hash(key)
        added.append(key)
    stale = sorted(
        k for k in latest
        if k in out and k in plans.QUERIES
        and out[k] != plans.impl_hash(k)
    )
    if stale and not args.rebuild:
        print(
            f"WARNING: {len(stale)} keys are green in the LATEST artifact "
            f"but their recorded hash mismatches the current source: "
            f"{stale}\n  If this is ROUND START (tree == the tree the gate "
            f"ran on), re-run with --rebuild to refresh them; otherwise "
            f"they were edited after the gate and must re-earn their rows."
        )
    for key in args.drop:
        out.pop(key, None)
        pending[key] = n_arts
    out = dict(sorted(out.items()))
    if pending:
        out["_pending"] = dict(sorted(pending.items()))
    OUT.write_text(json.dumps(out, indent=1) + "\n")
    print(f"recorded {len(added)} new ({added}), dropped {args.drop}, "
          f"pending {sorted(pending)}, cleared {cleared}, "
          f"total {len([k for k in out if not k.startswith('_')])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
