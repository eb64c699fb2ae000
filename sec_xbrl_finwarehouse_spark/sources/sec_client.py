"""SEC EDGAR HTTP source (driver-side; SURVEY.md §2.1 S1/S2).

Re-expresses src/sec_xbrl_finwarehouse/sec_client.py (retry x3 on
429/5xx, exponential backoff ``1.6 ** (attempt+1)``, 0.2 s pacing,
mandatory User-Agent) and scripts/seed_companies.py:6-22 (ticker->CIK
map). stdlib urllib so the engine has no extra dependency; the corpus
is small (one JSON per company) so fetching stays on the driver --
at larger corpora, distribute CIK partitions and run this client in
``mapInPandas`` with a per-partition rate limiter.

Network access is never exercised by the test suite; the transport is
injectable for offline testing.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from typing import Any

COMPANYFACTS_URL = "https://data.sec.gov/api/xbrl/companyfacts/CIK{cik}.json"
TICKER_CIK_URL = "https://www.sec.gov/files/company_tickers.json"
RETRYABLE = {429, 500, 502, 503, 504}

# transport: url, headers, timeout -> (status_code, body_bytes)
Transport = Callable[[str, dict[str, str], int], tuple[int, bytes]]


def _urllib_transport(url: str, headers: dict[str, str], timeout: int) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class SecClient:
    """Fetch companyfacts JSON with retry/backoff/pacing (sec_client.py:10-50)."""

    def __init__(
        self,
        user_agent: str,
        timeout: int = 30,
        transport: Transport = _urllib_transport,
        sleeper: Callable[[float], None] = time.sleep,
    ):
        if not user_agent:
            raise ValueError("SEC requires a User-Agent like 'Name email@domain.com'")
        self.headers = {
            "User-Agent": user_agent,
            "Accept": "application/json",
            "Accept-Encoding": "identity",
        }
        self.timeout = timeout
        self._transport = transport
        self._sleep = sleeper

    def get_company_facts(
        self, cik: str, retries: int = 3, backoff: float = 1.6
    ) -> dict[str, Any]:
        cik10 = str(cik).zfill(10)
        url = COMPANYFACTS_URL.format(cik=cik10)
        last_err: Exception | None = None
        for attempt in range(retries):
            try:
                status, body = self._transport(url, self.headers, self.timeout)
                if status == 200:
                    self._sleep(0.2)  # gentle pacing (sec_client.py:36)
                    return json.loads(body)
                if status in RETRYABLE:
                    self._sleep(backoff ** (attempt + 1))
                    continue
                raise RuntimeError(f"HTTP {status} for {url}")
            except Exception as e:  # noqa: BLE001 - mirror blanket retry
                last_err = e
                self._sleep(backoff ** (attempt + 1))
        raise RuntimeError(f"Failed to fetch SEC company facts for CIK={cik}: {last_err}")


def get_ticker_cik_map(
    user_agent: str, transport: Transport = _urllib_transport, timeout: int = 30
) -> dict[str, dict[str, str]]:
    """UPPER(ticker) -> {cik: 10-digit, name} (seed_companies.py:6-22)."""
    status, body = transport(
        TICKER_CIK_URL, {"User-Agent": user_agent, "Accept": "application/json"}, timeout
    )
    if status != 200:
        raise RuntimeError(f"HTTP {status} for {TICKER_CIK_URL}")
    data = json.loads(body)
    return {
        row["ticker"].upper(): {"cik": str(row["cik_str"]).zfill(10), "name": row["title"]}
        for row in data.values()
    }
