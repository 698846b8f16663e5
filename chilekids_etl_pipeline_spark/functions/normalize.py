"""Messy-field normalization as pure SQL column expressions.

The reference implements these row-at-a-time in Python
(reference: src/transform.py:18-117 — ``_to_timestamptz``, ``_to_decimal``,
``_to_int``, ``_clean_numeric_string``, ``_fix_separators``). Here each
parser is a *SQL expression builder* so that:

1. Spark evaluates it JVM-side inside whole-stage codegen (no Python
   boundary — this is what makes normalization viable at 100 TB), and
2. the identical expression string doubles as the DuckDB oracle, proving
   semantic parity.

Only the dialect-shared SQL subset is used (trim/replace/regexp_replace
with ``[.]``-style classes instead of backslash escapes, like/length,
try_cast, floor/ceil, chr). Timestamp parsing needs per-dialect format
strings, so it has two builders.

Money-parsing semantics (mirroring src/transform.py:43-86):
- empty/NULL → NULL
- ``(x)`` → negative
- strip currency symbols ``$ € ₽``, NBSP, spaces
- both ``,`` and ``.`` present: the later one is the decimal point, the
  other is a thousands separator
- lone ``,``: decimal point iff exactly one comma with ≤3 digits after it,
  else thousands separator
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cleaned(col: str) -> tuple[str, str]:
    """Return (negativity-test SQL, cleaned-digits SQL) for a string col."""
    s0 = f"trim({col})"
    neg = f"({s0} LIKE '(%' AND {s0} LIKE '%)')"
    s1 = f"CASE WHEN {neg} THEN trim(substr({s0}, 2, length({s0}) - 2)) ELSE {s0} END"
    s2 = (
        "replace(replace(replace(replace(replace("
        f"{s1}, '$', ''), '€', ''), '₽', ''), chr(160), ''), ' ', '')"
    )
    return neg, s2


def money_sql(col: str, scale: int = 4) -> str:
    """SQL expr parsing a messy money string → decimal(18, scale) or NULL."""
    neg, s2 = _cleaned(col)
    has_dot = f"({s2} LIKE '%.%')"
    has_comma = f"({s2} LIKE '%,%')"
    # greedy '^.*X' strips through the LAST X → tail after last separator
    tail_dot = f"regexp_replace({s2}, '^.*[.]', '')"
    tail_comma = f"regexp_replace({s2}, '^.*[,]', '')"
    comma_count = f"(length({s2}) - length(replace({s2}, ',', '')))"
    fixed = f"""CASE
        WHEN {has_dot} AND {has_comma} THEN
            CASE WHEN length({tail_dot}) < length({tail_comma})
                 THEN replace({s2}, ',', '')
                 ELSE replace(replace({s2}, '.', ''), ',', '.') END
        WHEN {has_comma} THEN
            CASE WHEN {comma_count} = 1 AND length({tail_comma}) <= 3
                 THEN replace({s2}, ',', '.')
                 ELSE replace({s2}, ',', '') END
        ELSE {s2} END"""
    parsed = f"try_cast({fixed} AS decimal(18, {scale}))"
    return f"""CASE
        WHEN {col} IS NULL OR trim({col}) = '' OR {s2} = '' THEN NULL
        WHEN {neg} THEN -({parsed})
        ELSE {parsed} END"""


def int_sql(col: str) -> str:
    """SQL expr: messy string → BIGINT, truncating toward zero.

    floor/ceil instead of a direct cast because DuckDB rounds on
    decimal→int casts while Spark truncates (reference truncates,
    src/transform.py:89-105).
    """
    d = money_sql(col, scale=4)
    return f"""CASE WHEN ({d}) IS NULL THEN NULL
        WHEN ({d}) >= 0 THEN cast(floor({d}) AS bigint)
        ELSE cast(ceil({d}) AS bigint) END"""


# Reference format list: src/transform.py:28-34 (ISO first via dateutil,
# then dd.mm.yyyy [hh:mm:ss], yyyy-mm-dd, mm/dd/yyyy, dd/mm/yyyy).
_SPARK_FORMATS = [
    None,  # ISO / default parser
    "dd.MM.yyyy HH:mm:ss",
    "dd.MM.yyyy",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "dd/MM/yyyy",
]
_DUCKDB_FORMATS = [
    None,
    "%d.%m.%Y %H:%M:%S",
    "%d.%m.%Y",
    "%Y-%m-%d",
    "%m/%d/%Y",
    "%d/%m/%Y",
]


def ts_sql_spark(col: str) -> str:
    attempts = []
    for fmt in _SPARK_FORMATS:
        if fmt is None:
            attempts.append(f"try_to_timestamp({col})")
        else:
            attempts.append(f"try_to_timestamp({col}, '{fmt}')")
    return f"coalesce({', '.join(attempts)})"


def ts_sql_duckdb(col: str) -> str:
    attempts = []
    for fmt in _DUCKDB_FORMATS:
        if fmt is None:
            attempts.append(f"try_cast({col} AS timestamp)")
        else:
            attempts.append(f"try_strptime({col}, '{fmt}')")
    return f"coalesce({', '.join(attempts)})"


# --- Spark Column wrappers -------------------------------------------------


def parse_money(col: str, scale: int = 4) -> Column:
    return F.expr(money_sql(col, scale))


def parse_int(col: str) -> Column:
    return F.expr(int_sql(col))


def parse_timestamp_multi(col: str) -> Column:
    return F.expr(ts_sql_spark(col))
