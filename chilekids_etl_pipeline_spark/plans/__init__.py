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


def impl_hash(name: str) -> str:
    """Fingerprint of what an external green row actually verified: the
    entry's undecorated function source plus its resolved oracle SQL
    (templates shared between both dialects flow through the oracle
    string, so template edits change the hash too)."""
    import hashlib
    import inspect

    e = QUERIES[name]
    src = inspect.getsource(e.raw_fn) if e.raw_fn is not None else ""
    oracle = e.oracle() if callable(e.oracle) else (e.oracle or "")
    return hashlib.md5((src + "\n--\n" + oracle).encode()).hexdigest()


def _verified_impl_hashes() -> dict[str, str]:
    """Committed key → impl_hash map (tools/update_verified_hashes.py),
    recorded when each key's green row landed. Missing file → empty."""
    import json
    from pathlib import Path

    path = (
        Path(__file__).resolve().parent.parent.parent
        / "VERIFIED_IMPLS.json"
    )
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        return {}
    # "_pending" (and any future _meta keys) are bookkeeping, not hashes
    return {k: v for k, v in data.items() if not k.startswith("_")}


def externally_verified() -> set[str]:
    """Keys whose green external row still vouches for the CURRENT
    implementation: green in a committed CORRECTNESS_r*.json AND the
    committed impl hash matches the present source+oracle. Editing a
    verified entry's implementation (or its oracle template) changes the
    hash, drops the key from this set, and rotates it back into the
    external gate window for re-verification — a green row is evidence
    about the code that was verified, not the name."""
    green = _externally_verified()
    hashes = _verified_impl_hashes()
    if not hashes:
        # bootstrap / fresh checkout without the hash file: fall back to
        # name-level verification rather than forcing a full re-rotation
        return green
    return {
        k for k in green
        if k in QUERIES and hashes.get(k) == impl_hash(k)
    }


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

    # Round-5 batch — registers after every older unverified key so the
    # gate window drains oldest-first.
    from . import lakehouse, llmdata10  # noqa: F401

    verified = externally_verified()
    ordered = {
        k: QUERIES[k] for k in QUERIES if k not in verified
    }
    ordered.update({k: QUERIES[k] for k in QUERIES if k in verified})
    QUERIES.clear()
    QUERIES.update(ordered)
