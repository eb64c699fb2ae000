"""Offline tests for the SEC EDGAR HTTP source (SURVEY.md §2.1 S1/S2).

Exercises the injectable transport in sources/sec_client.py against the
reference behavior (reference sec_client.py:27-50: retry x3 on 429/5xx
with backoff 1.6**(attempt+1), 0.2 s pacing on success, blanket retry on
any exception, final RuntimeError) and the ticker->CIK map shaping
(reference seed_companies.py:6-22: UPPER(ticker), zfill(10) CIK).
No network access occurs anywhere in this module.
"""

from __future__ import annotations

import json

import pytest

from sec_xbrl_finwarehouse_spark.sources.sec_client import (
    COMPANYFACTS_URL,
    SecClient,
    get_ticker_cik_map,
)


class FakeTransport:
    """Scripted transport: pops one (status, body) response per call."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []  # (url, headers, timeout)

    def __call__(self, url, headers, timeout):
        self.calls.append((url, headers, timeout))
        item = self.responses.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


class SleepRecorder:
    def __init__(self):
        self.sleeps = []

    def __call__(self, seconds):
        self.sleeps.append(seconds)


FACTS = {"cik": 320193, "facts": {"us-gaap": {}}}
FACTS_BODY = json.dumps(FACTS).encode()


def make_client(transport, sleeper=None):
    return SecClient(
        "Test test@example.com", transport=transport, sleeper=sleeper or SleepRecorder()
    )


def test_success_returns_json_and_paces():
    transport = FakeTransport([(200, FACTS_BODY)])
    sleeper = SleepRecorder()
    client = make_client(transport, sleeper)
    out = client.get_company_facts("320193")
    assert out == FACTS
    # exactly one request, one 0.2 s pacing sleep (reference sec_client.py:36)
    assert len(transport.calls) == 1
    assert sleeper.sleeps == [0.2]


def test_url_is_zero_padded_cik():
    transport = FakeTransport([(200, FACTS_BODY)])
    client = make_client(transport)
    client.get_company_facts("320193")
    url = transport.calls[0][0]
    assert url == COMPANYFACTS_URL.format(cik="0000320193")


def test_user_agent_required_and_sent():
    with pytest.raises(ValueError):
        SecClient("")
    transport = FakeTransport([(200, FACTS_BODY)])
    client = make_client(transport)
    client.get_company_facts("1")
    headers = transport.calls[0][1]
    assert headers["User-Agent"] == "Test test@example.com"
    assert headers["Accept"] == "application/json"


def test_429_retries_with_backoff_sequence():
    transport = FakeTransport([(429, b""), (429, b""), (200, FACTS_BODY)])
    sleeper = SleepRecorder()
    client = make_client(transport, sleeper)
    out = client.get_company_facts("1", retries=3, backoff=1.6)
    assert out == FACTS
    assert len(transport.calls) == 3
    # backoff 1.6**(attempt+1) per retryable status, then the 0.2 s pacing
    assert sleeper.sleeps == pytest.approx([1.6**1, 1.6**2, 0.2])


@pytest.mark.parametrize("status", [500, 502, 503, 504])
def test_5xx_is_retryable(status):
    transport = FakeTransport([(status, b""), (200, FACTS_BODY)])
    client = make_client(transport)
    assert client.get_company_facts("1") == FACTS
    assert len(transport.calls) == 2


def test_exhausted_retries_raise_runtime_error():
    transport = FakeTransport([(429, b"")] * 3)
    sleeper = SleepRecorder()
    client = make_client(transport, sleeper)
    with pytest.raises(RuntimeError, match="CIK=1"):
        client.get_company_facts("1", retries=3)
    assert len(transport.calls) == 3
    assert sleeper.sleeps == pytest.approx([1.6**1, 1.6**2, 1.6**3])


def test_non_retryable_4xx_blanket_retried_then_raises():
    """Reference catches its own raise_for_status and retries anyway
    (sec_client.py:44-49); mirror that: 404 x3 -> RuntimeError citing 404."""
    transport = FakeTransport([(404, b"nope")] * 3)
    client = make_client(transport)
    with pytest.raises(RuntimeError, match="HTTP 404"):
        client.get_company_facts("999", retries=3)
    assert len(transport.calls) == 3


def test_transport_exception_is_retried():
    transport = FakeTransport([OSError("conn reset"), (200, FACTS_BODY)])
    sleeper = SleepRecorder()
    client = make_client(transport, sleeper)
    assert client.get_company_facts("1") == FACTS
    assert sleeper.sleeps == pytest.approx([1.6**1, 0.2])


TICKERS_BODY = json.dumps(
    {
        "0": {"cik_str": 320193, "ticker": "aapl", "title": "Apple Inc."},
        "1": {"cik_str": 789019, "ticker": "MSFT", "title": "MICROSOFT CORP"},
    }
).encode()


def test_ticker_map_upper_and_zfill():
    transport = FakeTransport([(200, TICKERS_BODY)])
    out = get_ticker_cik_map("Test test@example.com", transport=transport)
    assert out == {
        "AAPL": {"cik": "0000320193", "name": "Apple Inc."},
        "MSFT": {"cik": "0000789019", "name": "MICROSOFT CORP"},
    }


def test_ticker_map_non_200_raises():
    transport = FakeTransport([(503, b"")])
    with pytest.raises(RuntimeError, match="HTTP 503"):
        get_ticker_cik_map("Test test@example.com", transport=transport)
