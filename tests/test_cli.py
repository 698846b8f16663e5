"""CLI orchestrator parity (__main__.py vs reference main.py:249-301).

Offline end-to-end: ``load`` ingests a local Sheets-API-shaped payload
into the raw layer (PK detection, hash-fallback ids, insert-if-absent),
``run`` moves changed records through normalize into the staging upsert
(with --test limiting and example output), ``check`` reports every
precondition. All against tmp parquet dirs — no network, no Postgres.
"""

from __future__ import annotations

import json

import pytest

from chilekids_etl_pipeline_spark.__main__ import (
    main,
    run_check_env,
    run_incremental_elt,
    run_load_sheets,
)

VALUES = {
    "values": [
        ["id", "Date", "Type", "Client", "Category", "Total RUB"],
        ["r1", "01.02.2024", "Income", "Acme", "ads", "1 200,50"],
        ["r2", "2024-02-03", "Expense", "Globex", "rent", "$300"],
        ["", "2024-02-04", "Expense", "Initech", "misc", "42"],  # no pk
    ]
}


@pytest.fixture()
def values_file(tmp_path):
    p = tmp_path / "sheet.json"
    p.write_text(json.dumps(VALUES))
    return str(p)


def test_load_then_run_then_check(spark, tmp_path, values_file):
    raw_dir = str(tmp_path / "raw")
    staging_dir = str(tmp_path / "staging")

    n = run_load_sheets(
        "SHEET123", "Sheet1!A:AF", values_json=values_file, raw_dir=raw_dir
    )
    assert n == 3
    raw = spark.read.parquet(raw_dir)
    ids = {r.id for r in raw.select("id").collect()}
    assert {"r1", "r2"} <= ids
    assert any(i.startswith("sheet_auto_") for i in ids)  # hash-fallback pk

    # reload is the ON CONFLICT DO NOTHING analog: nothing appended
    n2 = run_load_sheets(
        "SHEET123", "Sheet1!A:AF", values_json=values_file, raw_dir=raw_dir
    )
    assert n2 == 0
    assert spark.read.parquet(raw_dir).count() == 3

    up = run_incremental_elt(
        raw_dir, staging_dir, test_mode=True, source="google_sheets"
    )
    assert up == 3
    staged = spark.read.parquet(staging_dir)
    rows = {r.raw_id: r for r in staged.collect()}
    assert set(rows) >= {"r1", "r2"}
    assert rows["r1"].client == "Acme"
    assert rows["r1"].total_rub == 1200.5
    assert rows["r2"].total_rub == 300.0  # '$300' money-cleaned
    assert rows["r1"].source_type == "live"

    # incremental: second run finds nothing changed
    assert run_incremental_elt(raw_dir, staging_dir) == 0

    assert run_check_env(raw_dir, config_files=()) is True


def test_run_without_raw_dir_is_a_noop(tmp_path):
    assert run_incremental_elt(
        str(tmp_path / "nope"), str(tmp_path / "staging")
    ) == 0


def test_load_without_transport_surfaces_refusal(tmp_path):
    rc = main([
        "load", "SHEET123", "--raw-dir", str(tmp_path / "raw"),
    ])
    assert rc == 1  # fatal: network fetch not available in this runtime


def test_main_check_exit_codes(tmp_path, values_file):
    raw_dir = str(tmp_path / "raw")
    assert main(["check", "--raw-dir", raw_dir,
                 "--config-file", str(tmp_path / "missing.env")]) == 1
    run_load_sheets("S", "R", values_json=values_file, raw_dir=raw_dir)
    cfg = tmp_path / "app.env"
    cfg.write_text("x=1")
    assert main(["check", "--raw-dir", raw_dir,
                 "--config-file", str(cfg)]) == 0


def test_run_quarantines_parse_failures(spark, tmp_path):
    """The reference drops records that fail normalization instead of
    upserting them (transform.py per-record except -> continue); the CLI
    routes them to a quarantine parquet so the payload-hash anti-join
    can't make malformed rows permanent staging rows (r7 advisor)."""
    raw_dir = str(tmp_path / "raw")
    staging_dir = str(tmp_path / "staging")
    bad = {
        "values": [
            ["id", "Date", "Type", "Client", "Category", "Total RUB"],
            ["ok1", "01.02.2024", "Income", "Acme", "ads", "10"],
            ["bad1", "01.02.2024", "Income", "Evil", "ads", "not-money"],
        ]
    }
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    run_load_sheets("S", "R", values_json=str(p), raw_dir=raw_dir)

    up = run_incremental_elt(raw_dir, staging_dir)
    assert up == 1  # only the clean row is upserted
    staged_ids = {r.raw_id for r in
                  spark.read.parquet(staging_dir).collect()}
    assert staged_ids == {"ok1"}
    quar = spark.read.parquet(staging_dir + "_quarantine").collect()
    assert {r.raw_id for r in quar} == {"bad1"}
    assert quar[0].parse_failed_cols == "total_rub"

    # Reruns must not re-offer quarantined rows: without the quarantine
    # payload-hash anti-join, every run re-selects bad1, re-appends a
    # duplicate quarantine row, and the "no new records" exit never
    # fires while malformed raw rows exist (r8 advisor, medium).
    assert run_incremental_elt(raw_dir, staging_dir) == 0
    quar2 = spark.read.parquet(staging_dir + "_quarantine").collect()
    assert len(quar2) == 1  # still exactly one quarantine row


def test_legacy_layout_same_second_rerun_not_skipped(spark, tmp_path,
                                                     values_file):
    """A pre-_sink_id-layout staging target (only _batch_id present) must
    still get the max(_batch_id)+1 bump: _merge injects _sink_id there,
    so its replay guard would otherwise silently skip a same-second
    rerun (r8 advisor, low)."""
    from pyspark.sql import functions as F

    raw_dir = str(tmp_path / "raw")
    staging_dir = str(tmp_path / "staging")
    run_load_sheets("S", "R", values_json=values_file, raw_dir=raw_dir)
    assert run_incremental_elt(raw_dir, staging_dir) == 3

    # strip _sink_id to simulate the legacy layout
    legacy = spark.read.parquet(staging_dir).drop("_sink_id")
    legacy.write.mode("overwrite").parquet(str(tmp_path / "legacy"))
    spark.read.parquet(str(tmp_path / "legacy")).write.mode(
        "overwrite"
    ).parquet(staging_dir)
    old_max = spark.read.parquet(staging_dir).agg(
        F.max("_batch_id")
    ).first()[0]

    extra = {
        "values": [
            ["id", "Date", "Type", "Client", "Category", "Total RUB"],
            ["r9", "05.02.2024", "Income", "Hooli", "ads", "7"],
        ]
    }
    p = tmp_path / "extra.json"
    p.write_text(json.dumps(extra))
    run_load_sheets("S", "R", values_json=str(p), raw_dir=raw_dir)
    assert run_incremental_elt(raw_dir, staging_dir) == 1
    staged = spark.read.parquet(staging_dir)
    assert {r.raw_id for r in staged.collect()} >= {"r1", "r2", "r9"}
    new_max = staged.agg(F.max("_batch_id")).first()[0]
    assert new_max > old_max


def test_run_twice_same_second_applies_both_batches(spark, tmp_path,
                                                    values_file):
    """Two CLI runs inside one wall-clock second must both apply: the
    batch id outranks max(_batch_id) already in the target, so the
    replay guard (applied >= batch_id) can't silently skip the second
    run (r7 advisor)."""
    raw_dir = str(tmp_path / "raw")
    staging_dir = str(tmp_path / "staging")
    run_load_sheets("S", "R", values_json=values_file, raw_dir=raw_dir)
    assert run_incremental_elt(raw_dir, staging_dir) == 3

    extra = {
        "values": [
            ["id", "Date", "Type", "Client", "Category", "Total RUB"],
            ["r9", "05.02.2024", "Income", "Hooli", "ads", "7"],
        ]
    }
    p = tmp_path / "extra.json"
    p.write_text(json.dumps(extra))
    run_load_sheets("S", "R", values_json=str(p), raw_dir=raw_dir)
    # immediately after the first run — almost surely the same second
    assert run_incremental_elt(raw_dir, staging_dir) == 1
    staged = spark.read.parquet(staging_dir)
    assert {r.raw_id for r in staged.collect()} >= {"r1", "r2", "r9"}
    # ids strictly increase across the two runs
    bids = sorted({r._batch_id for r in staged.collect()})
    assert len(bids) == 2 and bids[0] < bids[1]
