"""Offline tests for sources/ops.py — the archive-upload and env-check
parity helpers (reference src/db.py:143-161, main.py:220-245)."""

from __future__ import annotations

import pytest

from chilekids_etl_pipeline_spark.sources.ops import (
    CheckResult,
    archive_df_csv,
    check_env,
    df_to_csv_bytes,
    upload_archive,
)


class PutTransport:
    def __init__(self, n_failures: int = 0):
        self.n_failures = n_failures
        self.calls: list[tuple[str, dict, bytes]] = []

    def __call__(self, url, headers, body):
        self.calls.append((url, headers, body))
        if len(self.calls) <= self.n_failures:
            raise ConnectionError(f"put boom #{len(self.calls)}")
        return {"Key": url.split("/", 3)[-1]}


def test_upload_unconfigured_raises_before_network():
    t = PutTransport()
    with pytest.raises(RuntimeError, match="no base_url"):
        upload_archive("", "archives", "x.csv", b"x",
                       transport=t, key_provider=lambda: "k")
    with pytest.raises(RuntimeError, match="no service key"):
        upload_archive("https://s.example", "archives", "x.csv", b"x",
                       transport=t, key_provider=lambda: None)
    assert t.calls == []


def test_upload_headers_url_and_retry():
    t = PutTransport(n_failures=2)
    sleeps: list[float] = []
    resp = upload_archive(
        "https://s.example/storage/v1/object/",
        "archives",
        "2026-08-14/snap.csv",
        b"a,b\n1,2\n",
        transport=t,
        key_provider=lambda: "svc-key",
        content_type="text/csv",
        sleep=sleeps.append,
    )
    assert resp["Key"].endswith("archives/2026-08-14/snap.csv")
    assert len(t.calls) == 3 and sleeps == [4.0, 4.0]
    url, headers, body = t.calls[-1]
    # reference header shape: apikey + bearer of the same service key
    assert url == "https://s.example/storage/v1/object/archives/2026-08-14/snap.csv"
    assert headers["apikey"] == "svc-key"
    assert headers["Authorization"] == "Bearer svc-key"
    assert headers["Content-Type"] == "text/csv"
    assert body == b"a,b\n1,2\n"


def test_csv_bytes_and_archive_df(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id int, name string"
    )
    data = df_to_csv_bytes(df.orderBy("id"))
    assert data == b"id,name\n1,a\n2,\n"
    with pytest.raises(ValueError, match="refusing to archive"):
        df_to_csv_bytes(df, max_rows=1)
    t = PutTransport()
    archive_df_csv(
        df.orderBy("id"), "https://s.example", "archives", "d/s.csv",
        transport=t, key_provider=lambda: "k",
    )
    assert t.calls[0][1]["Content-Type"] == "text/csv"
    assert t.calls[0][2].startswith(b"id,name\n")


def test_check_env_reports_every_check(spark, tmp_path):
    cfg = tmp_path / ".env"
    cfg.write_text("X=1")
    results = check_env(
        spark,
        required_settings={"POSTGRES_URI": "postgres://x", "EMPTY": ""},
        config_files=(str(cfg), str(tmp_path / "missing.env")),
    )
    by_name = {r.name: r for r in results}
    assert by_name[f"config:{cfg}"].ok
    assert not by_name[f"config:{tmp_path / 'missing.env'}"].ok
    assert by_name["setting:POSTGRES_URI"].ok
    assert not by_name["setting:EMPTY"].ok
    assert by_name["connection"].ok  # spark SELECT 1 round-trip
    # a failing probe is REPORTED, not raised (main.py:242 catches)
    results = check_env(
        None,
        required_settings={},
        probe=lambda: (_ for _ in ()).throw(OSError("db down")),
    )
    assert results == [CheckResult("connection", False, "db down")]
