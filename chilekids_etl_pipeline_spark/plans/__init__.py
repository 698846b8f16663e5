from .registry import QUERIES, register, queries, oracle_sql  # noqa: F401


def load_all() -> None:
    """Import every plan module so registration side effects run.

    Import order IS registry insertion order, and external correctness
    tooling samples the first entries in insertion order — so modules whose
    queries have not yet been externally verified are imported first
    (llmdata3 and elt, whose raw_quarantine/scd2_history registered after
    the round-3 window), with modules fully verified in earlier rounds
    registering last. New round-N modules register LAST and rotate to the
    front in round N+1 (tests/test_registry_order.py enforces this from
    the union of green CORRECTNESS_r*.json rows).
    """
    from . import llmdata3, elt, llmdata4, analytics4, llmdata5, analytics5, marts, analytics, analytics2, analytics3, staging, scale, tpch, llmdata, llmdata2  # noqa: F401
