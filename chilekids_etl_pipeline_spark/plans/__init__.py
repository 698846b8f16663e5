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


_PKG_PREFIX = "chilekids_etl_pipeline_spark"
_NORM_CACHE: dict[int, str] = {}


def _normalized_source(obj) -> str:
    """AST-normalized source of a callable: comments vanish in the
    parse, docstrings are stripped, formatting is canonicalized — so
    documentation edits never revoke a verification, while any
    code-semantic edit does."""
    import ast
    import inspect
    import textwrap

    key = id(obj)
    if key in _NORM_CACHE:
        return _NORM_CACHE[key]
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(obj)))
    except (OSError, TypeError, SyntaxError):
        return ""
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    out = ast.unparse(tree)
    _NORM_CACHE[key] = out
    return out


def _dependency_sources(fn) -> list[str]:
    """Normalized sources (and constant values) of everything the entry
    transitively references inside this package: the registered function
    itself, module-level helpers it calls (including cross-module ones
    like functions/sketch.py builders — where Spark-only dialect
    branches live), and referenced module-level constants (rendered
    template strings, tuning numbers). This closes the gap where a
    Spark-branch edit in a shared builder left the old fn-source+oracle
    fingerprint unchanged."""
    import ast
    import inspect
    import sys
    import textwrap

    out: dict[str, str] = {}
    seen: set[int] = set()

    def visit(f) -> None:
        if id(f) in seen:
            return
        seen.add(id(f))
        try:
            src = inspect.getsource(f)
        except (OSError, TypeError):
            return
        qual = f"{getattr(f, '__module__', '?')}.{getattr(f, '__qualname__', '?')}"
        out[qual] = _normalized_source(f)
        module = sys.modules.get(getattr(f, "__module__", ""), None)
        if module is None:
            return
        try:
            tree = ast.parse(textwrap.dedent(src))
        except SyntaxError:
            return
        names = sorted(
            {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
        )
        for nm in names:
            obj = getattr(module, nm, None)
            if obj is None:
                continue
            mod = getattr(obj, "__module__", None)
            if callable(obj) and isinstance(mod, str) and mod.startswith(
                _PKG_PREFIX
            ):
                visit(obj)
            elif isinstance(obj, (str, int, float, tuple, frozenset)):
                out[f"{module.__name__}:{nm}"] = repr(obj)

    visit(fn)
    return [f"{k}\n{v}" for k, v in sorted(out.items())]


def impl_hash(name: str) -> str:
    """Fingerprint of what an external green row actually verified: the
    entry's dependency-closure source (AST-normalized — see
    _dependency_sources) plus its resolved oracle SQL. Editing any code
    the entry executes, in its own module or a shared helper module,
    changes the hash and revokes the verification; comment and
    docstring edits do not."""
    import hashlib

    e = QUERIES[name]
    parts = _dependency_sources(e.raw_fn) if e.raw_fn is not None else []
    oracle = e.oracle() if callable(e.oracle) else (e.oracle or "")
    blob = "\n====\n".join(parts) + "\n--oracle--\n" + oracle
    return hashlib.md5(blob.encode()).hexdigest()


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
    from . import lakehouse, llmdata10, analytics10  # noqa: F401

    # Round-6 batch.
    from . import streamverify, llmdata11, analytics11  # noqa: F401

    # Round-7 batch. streamverify (above) also registers the round-7
    # replay gates for the sketch and quality-gate streaming modules.
    from . import llmdata12, analytics12, llmdata13, analytics13  # noqa: F401
    from . import llmdata14, analytics14, llmdata15, analytics15  # noqa: F401
    from . import llmdata16, analytics16, llmdata17, analytics17  # noqa: F401
    from . import analytics18, analytics19, llmdata18  # noqa: F401
    from . import llmdata19, analytics20, analytics21, llmdata20  # noqa: F401

    # Round-10 batch: IVF-PQ/ADC scoring + b-bit minhash estimation.
    from . import llmdata21  # noqa: F401

    verified = externally_verified()
    ordered = {
        k: QUERIES[k] for k in QUERIES if k not in verified
    }
    ordered.update({k: QUERIES[k] for k in QUERIES if k in verified})
    QUERIES.clear()
    QUERIES.update(ordered)
