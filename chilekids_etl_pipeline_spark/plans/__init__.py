from .registry import QUERIES, register, queries, oracle_sql  # noqa: F401


def load_all() -> None:
    """Import every plan module so registration side effects run.

    Import order IS registry insertion order, and external correctness
    tooling samples the first entries in insertion order — so modules whose
    queries have not yet been externally verified are imported first
    (tpch, llmdata2, scale, staging, then llmdata), with the modules fully
    verified in earlier rounds (elt, marts, analytics*) registering last.
    """
    from . import tpch, llmdata2, scale, staging, llmdata, elt, marts, analytics, analytics2, analytics3, llmdata3  # noqa: F401
