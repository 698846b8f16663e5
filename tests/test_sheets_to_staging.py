"""The reference's actual end-to-end path, through our engine: a Sheets
values payload → raw layer (ids + content hashes) → full staging
normalization — plus a hypothesis fuzz of the money parser against DuckDB
(same SQL template, both engines, arbitrary messy strings)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chilekids_etl_pipeline_spark.operators.staging import normalize_staging
from chilekids_etl_pipeline_spark.sources.sheets import records_to_raw_df, values_to_records


VALUES = [
    ["Date", "Тип", "Client", "Категория", "Total RUB", "Месяц", "pk"],
    ["01.02.2023", "Доход", "ООО Ромашка", "Software", "1 234,56", "2", "r-1"],
    ["2023-03-05", "Расход", "ИП Иванов", "Rent", "($2,500.00)", "3", "r-2"],
    ["03/04/2023", "Income", "Acme", "", "999", "4", ""],
    ["", "", "", "", "", "", ""],  # blank row → dropped
    ["05.06.2023 10:30:00", "Прочее", "Client X", "Misc", "", "6", "r-4"],
]


def test_sheet_values_through_staging(spark):
    records = values_to_records(VALUES)
    assert len(records) == 4  # blank row dropped
    raw = records_to_raw_df(spark, records)
    staged = normalize_staging(raw, "payload")
    rows = {r.id: r for r in staged.collect()}

    assert set(rows) == {"r-1", "r-2", "r-4"} | {
        k for k in rows if k.startswith("sheet_auto_")
    }
    r1 = rows["r-1"]
    assert str(r1.date) == "2023-02-01 00:00:00"
    assert r1.type == "Доход"
    assert r1.client == "ООО Ромашка"
    assert r1.category == "Software"
    assert float(r1.total_rub) == 1234.56
    assert r1.month == 2
    assert r1.financial_missing_total is False

    r2 = rows["r-2"]
    assert float(r2.total_rub) == -2500.0  # (x) negative, $ + thousands comma
    assert str(r2.date) == "2023-03-05 00:00:00"

    auto = next(r for k, r in rows.items() if k.startswith("sheet_auto_"))
    assert float(auto.total_rub) == 999.0
    assert str(auto.date) == "2023-03-04 00:00:00"  # MM/dd/yyyy
    # reference keeps '' for str columns (models.py:63 empty_string_to_none
    # applies only to year/month/quarter); numeric '' → NULL via the parsers
    assert auto.category == ""

    r4 = rows["r-4"]
    assert str(r4.date) == "2023-06-05 10:30:00"
    assert r4.total_rub is None
    assert r4.financial_missing_total is False  # 'Прочее' is not financial


def test_change_stamp_synthesis_and_pk_assignment(spark):
    """Where extracted_at/updated_by ORIGINATE: the reference stamps them
    sheet-side on every edit (gas/last_change.gs — local-time
    'dd.MM.yyyy HH:mm:ss' in Asia/Yekaterinburg + editor email), and
    pk_master.gs backfills 'sa_000NNN' keys for rows whose required
    columns are non-empty. This pins the engine-side synthesis of both:
    the stamp converts to the correct UTC instant (Yekaterinburg = UTC+5,
    no DST), and PK assignment continues after the highest existing
    suffix, numbers new keys consecutively, skips ineligible rows, and
    never touches existing keys."""
    import pyspark.sql.functions as F

    from chilekids_etl_pipeline_spark.sources.sheets import (
        assign_pks,
        change_stamp_to_utc,
    )

    stamps = spark.createDataFrame(
        [("15.03.2023 14:30:00",), ("01.01.2024 00:00:00",), (None,)],
        "last_change string",
    ).select(change_stamp_to_utc(F.col("last_change")).alias("ts"))
    got = [str(r.ts) for r in stamps.collect()]
    # 14:30 Yekaterinburg == 09:30 UTC; midnight == 19:00 prev day UTC
    assert got[0] == "2023-03-15 09:30:00"
    assert got[1] == "2023-12-31 19:00:00"
    assert got[2] == "None"  # no stamp → null; caller supplies extract time

    df = spark.createDataFrame(
        [
            ("sa_000007", "a", "b"),   # existing key: untouched
            ("", "c", "d"),            # blank key, eligible → new key
            (None, "e", "f"),          # null key, eligible → new key
            (None, "", "g"),           # required col blank → stays keyless
        ],
        "pk string, col_a string, col_b string",
    )
    out = assign_pks(df, required_cols=("col_a", "col_b"))
    rows = {r.col_a: r.pk for r in out.collect()}
    assert rows["a"] == "sa_000007"
    assert rows[""] is None
    new = sorted([rows["c"], rows["e"]])
    assert new == ["sa_000008", "sa_000009"]  # consecutive after the max


def test_sheet_service_identity_assignment(spark):
    """SheetService.gs runIdentityAssignment parity: missing PKs get a
    UUID-shaped key (deterministic here, from the row content hash —
    idempotent where GAS mints random v4s), created_at stamps only on
    newly keyed rows, existing keys and stamps are untouched, and a
    missing PK column raises like the script's alert."""
    import re

    import pytest as _pytest

    from chilekids_etl_pipeline_spark.sources.sheets import assign_identity

    df = spark.createDataFrame(
        [
            ("11111111-2222-4333-8444-555555555555", "2024-01-01", "a"),
            (None, None, "b"),
            ("", None, "c"),
        ],
        "PK string, created_at string, col_a string",
    )
    out = assign_identity(df, now="05.02.2024 10:00:00")
    rows = {r.col_a: r for r in out.collect()}
    assert rows["a"].PK == "11111111-2222-4333-8444-555555555555"
    assert rows["a"].created_at == "2024-01-01"  # existing stamp kept
    uuid_re = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$"
    )
    for k in ("b", "c"):
        assert uuid_re.match(rows[k].PK), rows[k].PK
        assert rows[k].created_at == "05.02.2024 10:00:00"
    assert rows["b"].PK != rows["c"].PK  # content-derived, row-distinct
    # idempotent: a second pass changes nothing
    again = {r.col_a: r.PK for r in assign_identity(out, now="x").collect()}
    assert again == {k: r.PK for k, r in rows.items()}
    with _pytest.raises(KeyError):
        assign_identity(df.drop("PK"))


def test_sheet_service_on_edit_stamping(spark):
    """SheetService.gs onEdit parity: edited rows get updated_at/by and a
    refreshed content_hash; an edited keyless row is auto-keyed +
    created_at-stamped; untouched rows keep every value; and a frame
    with no updated_at column passes through unchanged (the script's
    early return)."""
    import pyspark.sql.functions as F

    from chilekids_etl_pipeline_spark.sources.sheets import (
        row_content_hash,
        stamp_edit_metadata,
    )

    df = spark.createDataFrame(
        [
            ("k1", "old-created", "old-upd", "old-by", "old-hash", "a", 1),
            (None, None, "old-upd", "old-by", None, "b", 2),
            ("k3", "c3", "u3", "by3", "h3", "c", 3),
        ],
        "PK string, created_at string, updated_at string, "
        "updated_by string, content_hash string, col_a string, row int",
    )
    out = stamp_edit_metadata(
        df, edited=F.col("row") <= 2, editor="e@x", now="NOW"
    )
    rows = {r.col_a: r for r in out.collect()}
    assert rows["a"].updated_at == "NOW" and rows["a"].updated_by == "e@x"
    assert rows["a"].PK == "k1" and rows["a"].created_at == "old-created"
    expected_hash = {
        r.col_a: r.h
        for r in df.select(
            "col_a", row_content_hash(df).alias("h")
        ).collect()
    }
    assert rows["a"].content_hash == expected_hash["a"]
    # keyless edited row: auto-keyed + created stamped
    assert rows["b"].PK and rows["b"].created_at == "NOW"
    # untouched row: every value survives
    assert (rows["c"].PK, rows["c"].created_at, rows["c"].updated_at,
            rows["c"].updated_by, rows["c"].content_hash) == (
        "k3", "c3", "u3", "by3", "h3")
    # no tracking column → unchanged frame
    no_track = df.drop("updated_at")
    same = stamp_edit_metadata(no_track, edited=F.lit(True), now="NOW")
    assert same is no_track


NOVEL_VALUES = [
    # headers no variant list enumerates: resolvable only via the reference's
    # normalized (lowercase, space-stripped) arbitrary-key fallback
    # (transform.py:108-115)
    ["DATE", "TYPE ", "CLIENT", "Total rub ", "MONTH", "pk"],
    ["01.02.2023", "Income", "Acme", "1 234,56", "2", "n-1"],
    ["2023-03-05", "Expense", "Globex", "not-a-number", "x", "n-2"],
]


def test_novel_cased_headers_resolve_via_fallback(spark):
    records = values_to_records(NOVEL_VALUES)
    raw = records_to_raw_df(spark, records)
    rows = {r.id: r for r in normalize_staging(raw, "payload").collect()}

    n1 = rows["n-1"]
    assert str(n1.date) == "2023-02-01 00:00:00"
    assert n1.type == "Income"
    assert n1.client == "Acme"
    assert float(n1.total_rub) == 1234.56
    assert n1.month == 2
    assert n1.parse_failed_cols == ""

    # row-level validation: raw values present but unparseable are named
    n2 = rows["n-2"]
    assert n2.total_rub is None
    assert n2.month is None
    assert n2.financial_missing_total is True
    assert set(n2.parse_failed_cols.split(",")) == {"total_rub", "month"}


def test_exact_variant_wins_over_normalized_fallback(spark):
    # reference probes every exact variant before any normalized key; a
    # payload carrying both must resolve to the exact one
    df = spark.createDataFrame(
        [("1", '{"Total RUB": "100", "TOTAL rub": "999"}')], "id string, payload string"
    )
    row = normalize_staging(df, "payload").collect()[0]
    assert float(row.total_rub) == 100.0


_TS_STYLES = [
    lambda d, m, y, hh: f"{y}-{m:02d}-{d:02d}",
    lambda d, m, y, hh: f"{y}-{m:02d}-{d:02d} {hh:02d}:30:05",
    lambda d, m, y, hh: f"{d:02d}.{m:02d}.{y}",
    lambda d, m, y, hh: f"{d:02d}.{m:02d}.{y} {hh:02d}:15:00",
    lambda d, m, y, hh: f"{m:02d}/{d:02d}/{y}",
    lambda d, m, y, hh: f"{d:02d}/{m:02d}/{y}",
    lambda d, m, y, hh: f"{y}-{m:02d}-{d:02d}T{hh:02d}:00:00",
    lambda d, m, y, hh: f" {y}-{m:02d}-{d:02d} ",
    lambda d, m, y, hh: f"{d}.{m}.{y}",
    lambda d, m, y, hh: "not a date",
    lambda d, m, y, hh: "",
]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=35),  # day incl. invalid 32-35
            st.integers(min_value=1, max_value=15),  # month incl. invalid 13-15
            st.integers(min_value=1999, max_value=2031),
            st.integers(min_value=0, max_value=23),
            st.integers(min_value=0, max_value=len(_TS_STYLES) - 1),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_timestamp_parser_matches_duckdb_on_fuzz(spark, tuples):
    """Both engines evaluate their multi-format timestamp chain on the same
    strings (valid, ambiguous day/month, out-of-range, garbage); results
    must agree exactly, including NULLs for unparseable values."""
    from chilekids_etl_pipeline_spark.functions.normalize import (
        ts_sql_duckdb,
        ts_sql_spark,
    )

    values = [_TS_STYLES[si](d, m, y, hh) for d, m, y, hh, si in tuples]
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [
        None if r.v is None else str(r.v)
        for r in df.selectExpr(f"({ts_sql_spark('s')}) AS v").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = [
        None if row[0] is None else str(row[0])
        for row in con.execute(f"SELECT ({ts_sql_duckdb('s')}) FROM t").fetchall()
    ]
    assert got == want, list(zip(values, got, want))


def _model_get(payload: dict, variants: list[str]) -> str | None:
    """Python model of the reference's key-variant lookup (_get,
    transform.py:108-115) under our documented null-handling: exact
    variants probed in order (skipping null values — see the divergence
    note in operators/staging.py), then the normalized
    (lower, space-stripped) arbitrary-key map, last key wins, probed per
    normalized variant name."""
    for v in variants:
        if payload.get(v) is not None:
            return payload[v]
    nm = {}
    for k, val in payload.items():
        nm[k.lower().replace(" ", "")] = val
    seen = []
    for v in variants:
        nk = v.lower().replace(" ", "")
        if nk not in seen:
            seen.append(nk)
    for nk in seen:
        if nm.get(nk) is not None:
            return nm[nk]
    return None


_CASE_STYLES = ["exact", "upper", "lower", "title", "spaced"]


def _mutate(key: str, style: str) -> str:
    if style == "upper":
        return key.upper()
    if style == "lower":
        return key.lower()
    if style == "title":
        return key.title()
    if style == "spaced":
        return key + " "
    return key


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["type", "client", "category", "task", "vendor"]),
            st.integers(min_value=0, max_value=4),  # variant index (mod len)
            st.sampled_from(_CASE_STYLES),
            st.text(st.sampled_from(list("abcXYZ ")), min_size=1, max_size=6),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_staging_fallback_matches_get_model_on_fuzz(spark, entries):
    """Fuzz the gated fallback path: payloads built from case-mutated
    header variants must extract exactly what the reference's _get model
    extracts — for every string staging column, both when the gate stays
    off (all keys enumerated) and when it fires (novel casings)."""
    import json as _json

    from chilekids_etl_pipeline_spark.operators.staging import STAGING_COLUMNS

    cols = {name: variants for name, typ, variants in STAGING_COLUMNS if typ == "str"}
    payload: dict[str, str] = {}
    for col, vi, style, val in entries:
        variants = cols[col]
        key = _mutate(variants[vi % len(variants)], style)
        payload[key] = val

    df = spark.createDataFrame(
        [("r1", _json.dumps(payload))], "id string, payload string"
    )
    row = normalize_staging(df, "payload").collect()[0]
    for col, variants in cols.items():
        assert getattr(row, col) == _model_get(payload, variants), (
            col,
            payload,
        )


MONEY_CHARS = st.sampled_from(list("0123456789.,$€₽()  -abc"))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(MONEY_CHARS, min_size=0, max_size=14), min_size=1, max_size=8))
def test_money_parser_matches_duckdb_on_fuzz(spark, values):
    """Both engines evaluate their money_sql template on the same strings;
    results must agree exactly (incl. NULLs and negatives)."""
    from chilekids_etl_pipeline_spark.functions.normalize import money_sql

    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [
        None if r.v is None else float(r.v)
        for r in df.selectExpr(f"cast(({money_sql('s')}) AS double) AS v").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = [
        None if row[0] is None else float(row[0])
        for row in con.execute(
            f"SELECT cast(({money_sql('s', dialect='duckdb')}) AS double) FROM t"
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(MONEY_CHARS, min_size=0, max_size=14), min_size=1, max_size=8))
def test_int_parser_matches_duckdb_on_fuzz(spark, values):
    """Completes the parser-fuzz triad: the int coercion (messy string →
    bigint truncated toward zero, via the money parse) must agree between
    engines on arbitrary messy strings, including NULLs and negatives."""
    from chilekids_etl_pipeline_spark.functions.normalize import int_sql

    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r.v for r in df.selectExpr(f"({int_sql('s')}) AS v").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = [
        row[0]
        for row in con.execute(
            f"SELECT ({int_sql('s', dialect='duckdb')}) FROM t"
        ).fetchall()
    ]
    assert got == want, list(zip(values, got, want))
