"""Offline tests of the live-fetch seam (sources/sheets.py).

The reference fetches with aiohttp under tenacity
@retry(stop_after_attempt(5), wait_exponential(multiplier=1, min=4,
max=10)), resolving the access token inside the retried function
(src/sheets.py:15-28, src/db.py:132-140). These tests pin that contract
against an injected fake transport: retry count, backoff schedule,
per-attempt token refresh, api-key fallback, no-auth empty return,
exhaustion re-raise, and the A:AF response shaping (header pad to 32 /
truncate / row pad).

No Spark session needed — the seam is pure Python until records hit
records_to_raw_df.
"""

from __future__ import annotations

import pytest

from chilekids_etl_pipeline_spark.sources.sheets import (
    SHEETS_EXPECTED_COLS,
    FetchPolicy,
    api_values_to_records,
    fetch_sheet_values,
)

PAYLOAD = {"values": [["pk", "name"], ["1", "a"], ["2", "b"]]}


class FlakyTransport:
    """Fails the first n_failures calls, then returns payload."""

    def __init__(self, n_failures: int, payload=PAYLOAD):
        self.n_failures = n_failures
        self.payload = payload
        self.calls: list[tuple[str, dict | None, dict | None]] = []

    def __call__(self, url, headers, params):
        self.calls.append((url, headers, params))
        if len(self.calls) <= self.n_failures:
            raise ConnectionError(f"boom #{len(self.calls)}")
        return self.payload


def test_retry_until_success_with_tenacity_backoff_schedule():
    transport = FlakyTransport(n_failures=4)
    sleeps: list[float] = []
    records = fetch_sheet_values(
        "sheet1",
        transport=transport,
        token_provider=lambda: "tok",
        sleep=sleeps.append,
    )
    assert [r["pk"] for r in records] == ["1", "2"]
    assert len(transport.calls) == 5
    # wait_exponential(multiplier=1, min=4, max=10): 2,4,8,16 clamped
    # to [4,10] → 4,4,8,10 between the five attempts (tenacity's
    # 2**attempt_number schedule, reaching the cap on the 4th retry)
    assert sleeps == [4.0, 4.0, 8.0, 10.0]


def test_exhausted_retries_reraise_and_backoff_caps_at_max():
    transport = FlakyTransport(n_failures=99)
    sleeps: list[float] = []
    policy = FetchPolicy(max_attempts=7)
    with pytest.raises(ConnectionError, match="boom #7"):
        fetch_sheet_values(
            "sheet1",
            transport=transport,
            token_provider=lambda: "tok",
            policy=policy,
            sleep=sleeps.append,
        )
    assert len(transport.calls) == 7
    # retries 4+ hit the 10 s cap: 4,4,8,10,10,10
    assert sleeps == [4.0, 4.0, 8.0, 10.0, 10.0, 10.0]


def test_token_refreshed_each_attempt():
    """The reference mints a fresh service-account token per attempt
    because get_google_access_token() runs inside the retried function —
    a token that expires mid-retry-storm is replaced, not reused."""
    tokens = iter(["t1", "t2", "t3"])
    served: list[str] = []

    def token_provider():
        return next(tokens)

    transport = FlakyTransport(n_failures=2)
    fetch_sheet_values(
        "sheet1",
        transport=transport,
        token_provider=token_provider,
        sleep=lambda s: None,
    )
    served = [h["Authorization"] for _, h, _ in transport.calls]
    assert served == ["Bearer t1", "Bearer t2", "Bearer t3"]


def test_api_key_fallback_when_no_token():
    transport = FlakyTransport(n_failures=0)
    fetch_sheet_values(
        "sheet1",
        transport=transport,
        token_provider=lambda: None,
        api_key="k123",
        sleep=lambda s: None,
    )
    (url, headers, params) = transport.calls[0]
    assert headers is None
    assert params == {"key": "k123"}
    assert url.endswith("/spreadsheets/sheet1/values/Sheet1!A:AF")


def test_no_auth_returns_empty_without_calling_transport():
    transport = FlakyTransport(n_failures=0)
    out = fetch_sheet_values("sheet1", transport=transport)
    assert out == []
    assert transport.calls == []


def test_missing_values_key_is_empty_sheet_not_error():
    transport = FlakyTransport(n_failures=0, payload={"error": {"code": 403}})
    out = fetch_sheet_values(
        "sheet1", transport=transport, token_provider=lambda: "tok"
    )
    assert out == []
    assert len(transport.calls) == 1  # no retry on a decoded response


def test_header_pad_truncate_and_row_pad():
    # 2 named headers → padded with Column_3..Column_32; short rows padded
    values = [["a", "b"], ["1"], ["2", "3", "extra-cell"]]
    recs = api_values_to_records(values)
    assert len(recs[0]) == SHEETS_EXPECTED_COLS
    assert recs[0]["a"] == "1" and recs[0]["b"] == ""
    assert recs[0]["Column_3"] == ""
    # the reference zips row against the 32 headers; an extra cell beyond
    # the named headers lands in the first padded column
    assert recs[1]["Column_3"] == "extra-cell"
    # >32 headers truncate; a row within the truncated width shapes fine,
    # but a 40-cell row against the 32-column header raises (the
    # reference's strict zip would too — src/sheets.py:53)
    wide = [[f"h{i}" for i in range(40)], ["x"] * 32]
    recs = api_values_to_records(wide)
    assert len(recs[0]) == SHEETS_EXPECTED_COLS
    assert "h32" not in recs[0] and "h31" in recs[0]
    with pytest.raises(ValueError, match="wider than the 32-column header"):
        api_values_to_records([[f"h{i}" for i in range(40)], ["x"] * 40])


def test_auth_failure_is_retried_like_transport_failure():
    """Token minting sits inside the retried block (the reference runs
    get_google_access_token() inside the tenacity-wrapped function), so
    a transient auth outage backs off and retries instead of raising on
    the first attempt."""
    mints = {"n": 0}

    def flaky_token():
        mints["n"] += 1
        if mints["n"] <= 2:
            raise TimeoutError("metadata server timeout")
        return "tok"

    transport = FlakyTransport(n_failures=0)
    sleeps: list[float] = []
    records = fetch_sheet_values(
        "sheet1",
        transport=transport,
        token_provider=flaky_token,
        sleep=sleeps.append,
    )
    assert [r["pk"] for r in records] == ["1", "2"]
    assert mints["n"] == 3
    assert sleeps == [4.0, 4.0]
    # and exhaustion re-raises the auth error, not a transport one
    def always_fails():
        raise TimeoutError("still down")

    with pytest.raises(TimeoutError):
        fetch_sheet_values(
            "sheet1",
            transport=transport,
            token_provider=always_fails,
            sleep=lambda s: None,
        )


def test_wide_row_raises_strict_zip_parity():
    """A data row wider than the padded 32-column header raises, matching
    the reference's dict(zip(..., strict=True)) — never silently
    truncated to fit (src/sheets.py:53)."""
    wide = {"values": [["pk", "name"], ["1"] + ["x"] * SHEETS_EXPECTED_COLS]}
    with pytest.raises(ValueError, match="wider than the 32-column header"):
        api_values_to_records(wide["values"])
    # a row exactly at the padded width is fine
    ok = {"values": [["pk"], ["v"] * SHEETS_EXPECTED_COLS]}
    recs = api_values_to_records(ok["values"])
    assert len(recs) == 1 and recs[0]["pk"] == "v"


class FlakyPostTransport:
    def __init__(self, n_failures: int):
        self.n_failures = n_failures
        self.calls: list[tuple[str, dict, dict]] = []

    def __call__(self, url, headers, body):
        self.calls.append((url, headers, body))
        if len(self.calls) <= self.n_failures:
            raise ConnectionError(f"post boom #{len(self.calls)}")
        return {"updates": {"updatedRows": len(body["values"])}}


def test_push_appends_header_plus_rows_with_retry():
    from chilekids_etl_pipeline_spark.sources.sheets import push_sheet_values

    payload = {"values": [["pk", "name"], ["1", "a"], ["2", "b"]]}
    transport = FlakyPostTransport(n_failures=2)
    sleeps: list[float] = []
    tokens = iter(["t1", "t2", "t3"])
    resp = push_sheet_values(
        payload,
        "sheet1",
        "Expenses",
        transport=transport,
        token_provider=lambda: next(tokens),
        sleep=sleeps.append,
    )
    assert resp == {"updates": {"updatedRows": 3}}
    assert len(transport.calls) == 3
    assert sleeps == [4.0, 4.0]
    url, headers, body = transport.calls[-1]
    # append endpoint + RAW input mode (src/sheets.py:76)
    assert url.endswith("/values/Expenses!A1:append?valueInputOption=RAW")
    # token refreshed per attempt; JSON content type
    assert [h["Authorization"] for _, h, _ in transport.calls] == [
        "Bearer t1", "Bearer t2", "Bearer t3"
    ]
    assert headers["Content-Type"] == "application/json"
    assert body == {"values": [["pk", "name"], ["1", "a"], ["2", "b"]]}


def test_push_missing_token_fails_fast_without_retry():
    from chilekids_etl_pipeline_spark.sources.sheets import push_sheet_values

    transport = FlakyPostTransport(n_failures=0)
    with pytest.raises(RuntimeError, match="missing Google access token"):
        push_sheet_values(
            {"values": [["pk"]]},
            "sheet1",
            transport=transport,
            token_provider=lambda: None,
            sleep=lambda s: (_ for _ in ()).throw(AssertionError("no sleep")),
        )
    assert transport.calls == []  # auth absence never reaches the wire


def test_push_exhausts_and_reraises():
    from chilekids_etl_pipeline_spark.sources.sheets import push_sheet_values

    transport = FlakyPostTransport(n_failures=99)
    sleeps: list[float] = []
    with pytest.raises(ConnectionError, match="post boom #5"):
        push_sheet_values(
            {"values": [["pk"]]},
            "sheet1",
            transport=transport,
            token_provider=lambda: "tok",
            sleep=sleeps.append,
        )
    assert len(transport.calls) == 5
    assert sleeps == [4.0, 4.0, 8.0, 10.0]
