"""Query catalog: name → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here; the driver
contract (__spark_entry__.py) is a thin view over this registry. Oracle SQL
is DuckDB dialect over the pre-registered parquet views.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    fn: QueryFn
    # DuckDB SQL, a zero-arg callable producing it (for oracles composed
    # from other entries' SQL, resolved only after every module has
    # registered), or None → rows-only check.
    oracle: str | Callable[[], str] | None
    # the undecorated implementation, kept so the verified-impl hash
    # (plans/__init__.py) can fingerprint the source that was actually
    # externally verified
    raw_fn: Callable | None = None


QUERIES: dict[str, Entry] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..session import ensure_session_confs

            return fn(ensure_session_confs(spark), sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = Entry(fn=wrapped, oracle=oracle, raw_fn=fn)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: e.oracle() if callable(e.oracle) else e.oracle
        for name, e in QUERIES.items()
        if e.oracle is not None
    }
