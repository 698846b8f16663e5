from .registry import QUERIES, register, queries, oracle_sql  # noqa: F401


def load_all() -> None:
    """Import every plan module so registration side effects run."""
    from . import elt, marts, analytics, analytics2, analytics3, llmdata, llmdata2, staging, scale, tpch  # noqa: F401
