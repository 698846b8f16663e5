"""Sheets-style tabular ingestion: values payload → typed raw DataFrame.

Mirrors the reference's Google Sheets extract semantics
(src/sheets.py:16-60, main.py:166-217) without the network dependency:

- a "values" payload is a list of rows, first row = headers (the API's
  ``{"values": [[...], ...]}`` shape);
- rows are padded to the header width (the A:AF range always returns
  ragged rows for trailing blanks);
- blank rows are dropped;
- an explicit primary key is detected case-insensitively among
  ``pk / id / row_id / uuid``; otherwise a deterministic fallback id is
  derived from the row content hash + row number;
- every record carries its canonical payload hash for downstream
  incremental processing.

The actual HTTP fetch is out of scope for this engine (no network in the
runtime); ``fetch_google_sheets`` is a stub with the reference's signature
so callers can wire a real client in.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ID_KEY_CANDIDATES = ("pk", "id", "row_id", "uuid")


def values_to_records(values: list[list[Any]]) -> list[dict[str, Any]]:
    """Header row + data rows → list of dicts, padded and blank-filtered."""
    if not values:
        return []
    headers = [str(h).strip() for h in values[0]]
    records = []
    for row in values[1:]:
        if not any(str(c).strip() for c in row):
            continue
        padded = list(row) + [""] * (len(headers) - len(row))
        records.append({h: padded[i] for i, h in enumerate(headers) if h})
    return records


def detect_id_key(record: dict[str, Any]) -> str | None:
    keys_norm = {k.lower().strip(): k for k in record}
    for cand in ID_KEY_CANDIDATES:
        if cand in keys_norm:
            return keys_norm[cand]
    return None


def records_to_raw_df(spark: SparkSession, records: list[dict[str, Any]], source: str = "sheets") -> DataFrame:
    """Records → raw-layer DataFrame (id, source, payload json, payload_hash).

    Hashing runs driver-side here because the payload is already local (a
    sheet is small); the distributed path for bulk data is
    ``operators.incremental.with_payload_hash`` over a payload column.
    """
    rows = []
    for i, rec in enumerate(records):
        payload_str = json.dumps(rec, ensure_ascii=False, sort_keys=True, separators=(",", ":"))
        h = hashlib.md5(payload_str.encode()).hexdigest()
        id_key = detect_id_key(rec)
        if id_key and str(rec[id_key]).strip():
            raw_id = str(rec[id_key]).strip()
        else:
            raw_id = f"sheet_auto_{h[:12]}_{i}"
        rows.append((raw_id, source, payload_str, h))
    df = spark.createDataFrame(rows, "id string, source string, payload string, payload_hash string")
    return df.withColumn("extracted_at", F.current_timestamp())


def load_sheet_values(spark: SparkSession, path: str, source: str = "sheets") -> DataFrame:
    """Read a local JSON file in the Sheets API response shape."""
    with open(path) as f:
        data = json.load(f)
    return records_to_raw_df(spark, values_to_records(data.get("values", [])), source)


def df_to_sheet_values(df: DataFrame, max_rows: int = 100_000) -> dict[str, Any]:
    """DataFrame → Sheets API values payload (src/sheets.py:71 analog).

    The export direction: header row followed by stringified data rows,
    ready for a ``spreadsheets.values.update`` body. Guarded collect —
    sheets are small by nature; exporting big data through this path is a
    mistake the guard turns into an explicit error instead of a driver OOM.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"refusing to export {n} rows to a sheet (limit {max_rows}); "
            "write parquet via sources.sinks instead"
        )
    cols = df.columns
    str_df = df.select([F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in cols])
    return {"values": [cols] + [[row[c] for c in cols] for row in str_df.collect()]}


async def fetch_google_sheets(spreadsheet_id: str, range_name: str = "Sheet1!A:AF"):
    """Network fetch stub (reference: src/sheets.py:16). Wire a real client
    (google-api-python-client / aiohttp) in a deployment with network."""
    raise NotImplementedError(
        "network fetch not available in this runtime; "
        "use load_sheet_values() on an exported JSON payload"
    )
