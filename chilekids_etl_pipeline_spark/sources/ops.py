"""Ops utilities: archive snapshot upload + environment preflight.

The reference ships two operational helpers around its pipeline:

- ``upload_to_supabase_storage`` (src/db.py:143-161): PUT a file's bytes
  to an object-storage bucket path with key/bearer headers, raising when
  the storage target isn't configured; the sheet extract archives its
  daily CSV through it (src/sheets.py:60-68) and a failed upload is a
  logged WARNING, never a pipeline failure.
- ``run_check_env`` (main.py:220-245): the ``check`` CLI command — verify
  the config file exists, required settings are set, and a trivial
  round-trip query succeeds, reporting each check independently.

Both are re-expressed vendor-neutrally (the vendor API shape is an
implementation detail of the reference's deployment; the BEHAVIOR is
generic object-storage archiving and preflight): the upload takes an
injectable PUT transport like sources/sheets.py's fetch/push seams, and
the env check takes the checks as data. On a Spark deployment the archive
payload is typically a bounded snapshot CSV (df_to_csv_bytes guards the
collect) and the round-trip probe is ``spark.sql("SELECT 1")``.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Mapping
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sheets import FetchPolicy


def df_to_csv_bytes(df: DataFrame, max_rows: int = 100_000) -> bytes:
    """Bounded snapshot serialization: header + stringified rows as CSV
    bytes (the reference's ``df.to_csv`` archive payload). Same guarded
    collect as df_to_sheet_values — archiving big data through a
    driver-side CSV is a mistake this turns into an explicit error."""
    import csv
    import io

    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"refusing to archive {n} rows as driver-side CSV "
            f"(limit {max_rows}); write parquet via sources.sinks instead"
        )
    cols = df.columns
    str_df = df.select(
        [F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in cols]
    )
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(cols)
    for row in str_df.collect():
        w.writerow([row[c] for c in cols])
    return buf.getvalue().encode("utf-8")


def upload_archive(
    base_url: str,
    bucket: str,
    path: str,
    file_bytes: bytes,
    *,
    transport: Callable[[str, dict, bytes], dict],
    key_provider: Callable[[], str | None],
    content_type: str = "application/octet-stream",
    policy: FetchPolicy = FetchPolicy(),
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, Any]:
    """PUT an archive object to ``{base_url}/{bucket}/{path}``.

    Reference parity (src/db.py:143-161): raises RuntimeError when the
    storage target isn't configured (no base_url / no key) BEFORE any
    network attempt; the auth key rides as both an api-key header and a
    bearer token; the body is raw bytes with an explicit content type.
    The transport is injectable and transient failures retry under the
    same 5-attempt backoff contract as the sheets seams (the reference's
    unretried upload is its weakest ops edge — its caller compensates by
    swallowing failures; retrying here keeps archive loss rare without
    changing the caller contract)."""
    if not base_url:
        raise RuntimeError("archive storage not configured: no base_url")
    url = f"{base_url.rstrip('/')}/{bucket}/{path}"
    for attempt in range(1, policy.max_attempts + 1):
        try:
            key = key_provider()
            if not key:
                raise RuntimeError(
                    "archive storage not configured: no service key"
                )
            headers = {
                "apikey": key,
                "Authorization": f"Bearer {key}",
                "Content-Type": content_type,
            }
            return transport(url, headers, file_bytes)
        except RuntimeError:
            raise  # missing configuration is not transient
        except Exception:
            if attempt >= policy.max_attempts:
                raise
            sleep(policy.delay(attempt))
    raise AssertionError("unreachable")  # pragma: no cover


def archive_df_csv(
    df: DataFrame,
    base_url: str,
    bucket: str,
    path: str,
    max_rows: int = 100_000,
    **upload_kwargs: Any,
) -> dict[str, Any]:
    """df_to_csv_bytes + upload_archive: the reference's daily sheet-CSV
    archive hop (src/sheets.py:56-68) as one injectable call."""
    return upload_archive(
        base_url,
        bucket,
        path,
        df_to_csv_bytes(df, max_rows=max_rows),
        content_type="text/csv",
        **upload_kwargs,
    )


@dataclass(frozen=True)
class CheckResult:
    name: str
    ok: bool
    detail: str = ""


def check_env(
    spark: SparkSession | None,
    *,
    required_settings: Mapping[str, str | None],
    config_files: tuple[str, ...] = (),
    probe: Callable[[], bool] | None = None,
) -> list[CheckResult]:
    """The ``check`` command (main.py:220-245): report—not raise—each
    precondition independently, so an operator sees EVERY failed check in
    one run. Checks, in reference order: each config file exists, each
    required setting is non-empty, and the engine round-trips a trivial
    query (``SELECT 1`` — the asyncpg probe's Spark analog; an injected
    ``probe`` overrides it for other backends)."""
    import os

    results: list[CheckResult] = []
    for f in config_files:
        results.append(
            CheckResult(f"config:{f}", os.path.exists(f),
                        "" if os.path.exists(f) else "not found")
        )
    for name, value in required_settings.items():
        ok = bool(value and str(value).strip())
        results.append(
            CheckResult(f"setting:{name}", ok, "" if ok else "not set")
        )
    if probe is None and spark is not None:
        def probe() -> bool:  # noqa: PLR0206
            return spark.sql("SELECT 1 AS val").first().val == 1
    if probe is not None:
        try:
            ok = bool(probe())
            results.append(
                CheckResult("connection", ok, "" if ok else "probe returned false")
            )
        except Exception as e:  # noqa: BLE001 — reported, not raised
            results.append(CheckResult("connection", False, str(e)[:200]))
    return results
