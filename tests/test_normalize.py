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


# --- reference-model fuzz of the money parser ------------------------------
#
# The timestamp chain and the _get key-variant fallback were fuzzed against
# Python models of the reference in round 3 (test_sheets_to_staging.py) and
# that found a real parity bug; the money parser's separator disambiguation
# carries the same cross-engine risk, so it gets the same treatment: a
# faithful Python model of the reference's _clean_numeric_string +
# _fix_separators + Decimal coercion (src/transform.py:43-83), pinned
# against the Spark column expression on arbitrary messy strings.

from decimal import ROUND_HALF_UP, InvalidOperation

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_money_model(val: str, scale: int = 4) -> Decimal | None:
    """Python model of the reference's string→Decimal money coercion.

    Mirrors src/transform.py:43-66: strip; '(x)' = negative (inner
    re-stripped); remove currency symbols, NBSP and spaces; then the
    separator rules — both ',' and '.': later one wins as decimal point
    (the other removed); lone ',': <=3 trailing digits = decimal point,
    else thousands; finally Decimal(), None on parse failure. Quantized
    HALF_UP to the SQL expression's output scale (Spark's decimal cast
    rounding), which the reference's downstream NUMERIC column applies
    on insert."""
    s = val.strip()
    neg = False
    if s.startswith("(") and s.endswith(")") and len(s) >= 2:
        neg = True
        s = s[1:-1].strip()
    for ch in ("$", "€", "₽", "\xa0", " "):
        s = s.replace(ch, "")
    if s == "":
        return None
    if "," in s and "." in s:
        if s.rfind(".") > s.rfind(","):
            s = s.replace(",", "")
        else:
            s = s.replace(".", "").replace(",", ".")
    elif "," in s:
        parts = s.split(",")
        if len(parts) == 2 and len(parts[1]) <= 3:
            s = s.replace(",", ".")
        else:
            s = s.replace(",", "")
    try:
        result = Decimal(s)
    except (InvalidOperation, ValueError):
        return None
    if not result.is_finite():
        return None  # 'NaN'/'Inf' words can't arise from the char set
    q = result.quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)
    if len(q.as_tuple().digits) > 18:
        return None  # beyond decimal(18,4): the SQL try_cast yields NULL
    return -q if neg else q


_MONEY_FUZZ_CHARS = st.sampled_from(list("0123456789.,$€₽()\xa0 -abc"))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(_MONEY_FUZZ_CHARS, min_size=0, max_size=14), min_size=1, max_size=10))
def test_money_parser_matches_reference_model_on_fuzz(spark, values):
    outs = _run_expr(spark, values, money_sql("s"))
    for raw, got in zip(values, outs):
        want = _ref_money_model(raw)
        assert got == want, f"{raw!r}: spark={got!r} ref_model={want!r}"
