"""Golden-case tests for the normalization column expressions.

Mirrors the reference's normalization unit suite (tests/test_transform.py):
money strings with currency symbols, parentheses negatives, NBSP and space
thousands separators, comma/dot disambiguation; multi-format dates; int
truncation toward zero.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from chilekids_etl_pipeline_spark.functions.normalize import (
    int_sql,
    money_sql,
    ts_sql_spark,
)

MONEY_CASES = [
    ("1234.56", Decimal("1234.56")),
    ("1,234.56", Decimal("1234.56")),
    ("1.234,56", Decimal("1234.56")),
    ("1 234,56", Decimal("1234.56")),
    ("$1,234.56", Decimal("1234.56")),
    ("(100)", Decimal("-100")),
    ("(1 500,25)", Decimal("-1500.25")),
    ("₽999", Decimal("999")),
    ("€12,5", Decimal("12.5")),
    ("1,234", Decimal("1.234")),  # single comma, 3 trailing digits → decimal
    ("12,345", Decimal("12.345")),
    ("100,1234", Decimal("1001234")),  # >3 trailing digits → thousands
    ("\xa01\xa0000,10", Decimal("1000.10")),
    ("", None),
    ("abc", None),
    ("1.2.3", None),
    ("-45.6", Decimal("-45.6")),
]


def _run_expr(spark, values, expr_sql):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, s string")
    df.createOrReplaceTempView("_norm_t")
    rows = spark.sql(f"SELECT {expr_sql} AS out FROM _norm_t ORDER BY i").collect()
    return [r.out for r in rows]


def test_money_golden(spark):
    outs = _run_expr(spark, [c for c, _ in MONEY_CASES], money_sql("s"))
    for (raw, want), got in zip(MONEY_CASES, outs):
        if want is None:
            assert got is None, f"{raw!r} → {got}"
        else:
            assert got == want, f"{raw!r} → {got}, want {want}"


def test_int_truncates_toward_zero(spark):
    cases = [("2.7", 2), ("-2.7", -2), ("(3.9)", -3), ("1 000", 1000), ("x", None)]
    outs = _run_expr(spark, [c for c, _ in cases], int_sql("s"))
    for (raw, want), got in zip(cases, outs):
        assert got == want, f"{raw!r} → {got}, want {want}"


@pytest.mark.parametrize(
    "raw,want",
    [
        ("15.01.2024", "2024-01-15 00:00:00"),
        ("2024-01-15", "2024-01-15 00:00:00"),
        ("01/15/2024", "2024-01-15 00:00:00"),  # US format tried first
        ("15/01/2024", "2024-01-15 00:00:00"),
        ("15.01.2024 10:30:00", "2024-01-15 10:30:00"),
        ("2024-01-15T10:30:00", "2024-01-15 10:30:00"),
        ("garbage", None),
    ],
)
def test_timestamp_multi_format(spark, raw, want):
    (got,) = _run_expr(spark, [raw], ts_sql_spark("s"))
    assert (str(got) if got is not None else None) == want
