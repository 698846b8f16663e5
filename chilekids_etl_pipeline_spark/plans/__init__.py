from .registry import QUERIES, register, queries, oracle_sql  # noqa: F401


def _externally_verified() -> set[str]:
    """Union of fully-green rows across the committed CORRECTNESS_r*.json
    artifacts (the external gate's own records). Green = no error and
    every *_match flag recorded is True, requiring at least rows+schema.
    Missing artifacts → empty set (fresh checkout: keep import order)."""
    import json
    from pathlib import Path

    green: set[str] = set()
    repo_root = Path(__file__).resolve().parent.parent.parent
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            flags = {k: v for k, v in row.items() if k.endswith("_match")}
            if (
                flags.get("rows_match") is True
                and flags.get("schema_match") is True
                and all(v is True for v in flags.values())
            ):
                green.add(key)
    return green


def load_all() -> None:
    """Import every plan module, then rotate the registry so externally-
    unverified entries come FIRST.

    External correctness tooling samples the first ~50 registry entries
    in insertion order, so the ordering decides which queries get an
    external verdict each round. Rather than hand-ordering module
    imports (module granularity let already-verified keys squat in the
    window), the rotation is derived from the committed
    CORRECTNESS_r*.json artifacts: keys without a green row sort first
    (stable in registration order, oldest first), verified keys last.
    tests/test_registry_order.py pins the resulting saturation
    invariant."""
    from . import llmdata3, elt, llmdata4, analytics4, llmdata5, analytics5, marts, analytics, analytics2, analytics3, staging, scale, tpch, llmdata, llmdata2  # noqa: F401

    # Round-4 batch 3 — newest entries register last so that when the
    # unverified set outgrows the window, the overflow is the newest work.
    from . import llmdata6, analytics6, llmdata7, analytics7, llmdata8, analytics8, analytics9, llmdata9  # noqa: F401

    verified = _externally_verified()
    ordered = {
        k: QUERIES[k] for k in QUERIES if k not in verified
    }
    ordered.update({k: QUERIES[k] for k in QUERIES if k in verified})
    QUERIES.clear()
    QUERIES.update(ordered)
