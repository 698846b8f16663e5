"""Schema-migration bookkeeping (sources/migrations.py) — the alembic
contract on a parquet-dir table: ordered apply, resume-exactly-once
across crashes, partial upgrade, idempotent re-run."""

from __future__ import annotations

import os

import pytest

from chilekids_etl_pipeline_spark.sources.migrations import (
    Migration,
    add_column,
    apply_migrations,
    compose,
    rename_column,
    table_version,
    widen_type,
)


def _seed(spark, path: str) -> None:
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id int, name string, amount int"
    ).write.mode("overwrite").parquet(path)


def _migs() -> list[Migration]:
    return [
        Migration("001_add_total_rub", add_column("total_rub", "cast(amount * 90 AS bigint)")),
        Migration("002_rename_name", rename_column("name", "client_name")),
        Migration(
            "003_widen_and_flag",
            compose(widen_type("id", "bigint"), add_column("is_active", "true")),
        ),
    ]


def test_full_upgrade_applies_in_order(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    assert table_version(t) is None
    applied = apply_migrations(spark, t, _migs())
    assert applied == ["001_add_total_rub", "002_rename_name", "003_widen_and_flag"]
    assert table_version(t) == "003_widen_and_flag"
    df = spark.read.parquet(t)
    assert set(df.columns) == {"id", "client_name", "amount", "total_rub", "is_active"}
    assert dict(df.dtypes)["id"] == "bigint"
    rows = {r.id: r for r in df.collect()}
    assert rows[1].total_rub == 900 and rows[2].client_name == "b"


def test_rerun_is_noop_and_new_tail_applies(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    migs = _migs()
    assert apply_migrations(spark, t, migs[:1]) == ["001_add_total_rub"]
    # re-run with the full list: only the pending tail runs
    assert apply_migrations(spark, t, migs) == [
        "002_rename_name",
        "003_widen_and_flag",
    ]
    assert apply_migrations(spark, t, migs) == []


def test_partial_upgrade_stops_at_target(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    applied = apply_migrations(spark, t, _migs(), to_version="002_rename_name")
    assert applied == ["001_add_total_rub", "002_rename_name"]
    assert table_version(t) == "002_rename_name"
    assert "is_active" not in spark.read.parquet(t).columns


def test_crash_between_swap_renames_recovers(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    apply_migrations(spark, t, _migs()[:1])
    # simulate the crash window: target renamed away, tmp never moved in
    os.rename(t, t + ".old")
    applied = apply_migrations(spark, t, _migs())
    # recovery restored the version-001 table, so only 002+003 ran
    assert applied == ["002_rename_name", "003_widen_and_flag"]
    assert table_version(t) == "003_widen_and_flag"
    assert not os.path.exists(t + ".old")


def test_unknown_version_and_duplicates_rejected(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    apply_migrations(spark, t, _migs())
    with pytest.raises(ValueError, match="unknown version"):
        apply_migrations(spark, t, _migs()[:2])  # table is ahead of list
    dup = [_migs()[0], _migs()[0]]
    with pytest.raises(ValueError, match="duplicate"):
        apply_migrations(spark, str(tmp_path / "t2"), dup)


def test_version_sidecar_invisible_to_parquet_reader(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    apply_migrations(spark, t, _migs()[:1])
    # underscore-prefixed sidecar is metadata to Spark's file index
    assert spark.read.parquet(t).count() == 2


def test_to_version_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    with pytest.raises(ValueError, match="unknown to_version"):
        apply_migrations(spark, t, _migs(), to_version="002_renam_name")
    apply_migrations(spark, t, _migs(), to_version="002_rename_name")
    # target == current: no-op, not a full upgrade
    assert apply_migrations(spark, t, _migs(), to_version="002_rename_name") == []
    with pytest.raises(ValueError, match="downgrade"):
        apply_migrations(spark, t, _migs(), to_version="001_add_total_rub")
    assert table_version(t) == "002_rename_name"
