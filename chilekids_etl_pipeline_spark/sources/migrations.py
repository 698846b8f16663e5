"""Versioned schema migrations for parquet-dir tables (the alembic role).

The reference manages warehouse DDL with alembic (alembic/versions/ —
table creation, audit-trigger install, mart views), where each revision
knows its id and upgrades the live schema in order. A lake table has no
server to run DDL against; schema evolution is transform-on-read +
rewrite (or, on Delta/Iceberg, a metadata-only ALTER — see note on
``apply_migrations``). This module is the bookkeeping that makes those
rewrites safe and reproducible:

- a ``Migration`` = (version id, DataFrame→DataFrame upgrade);
- ``apply_migrations`` applies the pending suffix in declared order,
  atomically swapping the rewritten table and recording progress in a
  ``_schema_version.json`` sidecar AFTER each successful swap — so a
  crash mid-run resumes at the incomplete migration, and re-running is
  a no-op (alembic's ``upgrade head`` contract);
- column helpers (`add_column`, `rename_column`, `widen_type`) cover
  the migration vocabulary that is metadata-only on a real table
  format — keeping the transform declarative keeps that door open.

The swap reuses the crash-window discipline of the streaming upsert
sink (write tmp → rename target→old → rename tmp→target → drop old,
with dangling-``.old`` recovery on entry).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION_FILE = "_schema_version.json"


@dataclass(frozen=True)
class Migration:
    version: str
    upgrade: Callable[[DataFrame], DataFrame]
    description: str = ""


def add_column(name: str, default_sql: str):
    """Upgrade step: add ``name`` with a SQL default expression (the
    ``ALTER TABLE ADD COLUMN ... DEFAULT`` analog)."""

    def up(df: DataFrame) -> DataFrame:
        if name in df.columns:
            raise ValueError(f"column {name} already exists")
        return df.withColumn(name, F.expr(default_sql))

    return up


def rename_column(old: str, new: str):
    def up(df: DataFrame) -> DataFrame:
        if old not in df.columns:
            raise ValueError(f"column {old} not found")
        return df.withColumnRenamed(old, new)

    return up


def widen_type(name: str, dtype: str):
    """Upgrade step: cast a column to a wider type (int→bigint,
    decimal(p,s)→decimal(p',s'), ...). Narrowing is the caller's own
    risk — the cast is applied as-is."""

    def up(df: DataFrame) -> DataFrame:
        if name not in df.columns:
            raise ValueError(f"column {name} not found")
        return df.withColumn(name, F.col(name).cast(dtype))

    return up


def compose(*steps: Callable[[DataFrame], DataFrame]):
    def up(df: DataFrame) -> DataFrame:
        for s in steps:
            df = s(df)
        return df

    return up


def table_version(table_dir: str) -> str | None:
    """Current schema version of a table dir (None = never migrated)."""
    path = os.path.join(table_dir, VERSION_FILE)
    try:
        with open(path) as f:
            return json.load(f)["version"]
    except (OSError, ValueError, KeyError):
        return None


def _write_version(table_dir: str, version: str, applied: list[str]) -> None:
    path = os.path.join(table_dir, VERSION_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "applied": applied}, f)
    os.replace(tmp, path)  # atomic on POSIX


def apply_migrations(
    spark: SparkSession,
    table_dir: str,
    migrations: list[Migration],
    to_version: str | None = None,
) -> list[str]:
    """Apply the pending suffix of ``migrations`` to a parquet table.

    Contract (alembic ``upgrade [target]``):
    - declared order is the migration order; the sidecar records the
      last applied version, and only LATER migrations run;
    - each migration is applied and swapped atomically before its
      version is recorded, so a crash leaves the table at a recorded
      version and a re-run resumes exactly where it stopped;
    - ``to_version`` stops after that version (partial upgrade);
    - returns the versions applied in this call.

    On a transactional table format most steps here are metadata-only
    DDL (ALTER TABLE ADD/RENAME COLUMN); the parquet rewrite is the
    portable stand-in, same trade as the upsert sink's parquet swap.
    """
    versions = [m.version for m in migrations]
    if len(set(versions)) != len(versions):
        raise ValueError("duplicate migration versions")
    if to_version is not None and to_version not in versions:
        raise ValueError(
            f"unknown to_version {to_version!r}; known: {versions}"
        )

    def resolve_start(current: str | None) -> int:
        if current is not None and current not in versions:
            raise ValueError(
                f"table at unknown version {current!r}; known: {versions}"
            )
        return versions.index(current) + 1 if current is not None else 0

    old = table_dir + ".old"
    tmp = table_dir + ".tmp"
    # recover a crash between the two swap renames (target missing,
    # pre-crash state in .old) — same discipline as the upsert sink
    if not os.path.exists(table_dir) and os.path.exists(old):
        os.rename(old, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)

    start = resolve_start(table_version(table_dir))
    if to_version is not None:
        target_idx = versions.index(to_version)
        if target_idx == start - 1:
            return []  # already exactly at the target: no-op
        if target_idx < start - 1:
            raise ValueError(
                f"to_version {to_version!r} is below the table's current "
                f"version {versions[start - 1]!r}; downgrades are not "
                "supported"
            )
    applied_before = versions[:start]

    applied_now: list[str] = []
    for m in migrations[start:]:
        df = spark.read.parquet(table_dir)
        upgraded = m.upgrade(df)
        shutil.rmtree(tmp, ignore_errors=True)
        upgraded.write.mode("overwrite").parquet(tmp)
        # stamp the NEW version inside tmp BEFORE the swap: whichever
        # directory survives a crash carries its own correct version,
        # so resume never re-applies (or skips) a migration
        _write_version(
            tmp, m.version, applied_before + applied_now + [m.version]
        )
        os.rename(table_dir, old)
        os.rename(tmp, table_dir)
        shutil.rmtree(old, ignore_errors=True)
        applied_now.append(m.version)
        if to_version is not None and m.version == to_version:
            break
    return applied_now
