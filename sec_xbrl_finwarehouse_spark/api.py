"""HTTP serving shell for the three reference endpoints (VERDICT r4
item 6; reference src/sec_xbrl_finwarehouse/api.py:1-119).

The reference serves FastAPI routes over Postgres; this module is the
same surface over the Spark marts: route -> parameter validation ->
:mod:`.plans.api_queries` builder -> :mod:`.serving` shape -> JSON.
It is a plain WSGI application (stdlib only -- FastAPI is not in this
container), so it runs under ``wsgiref`` for local serving, any real
WSGI server in production, and plain function calls in offline tests.

Fidelity notes:

* ``GET /company/{ticker}`` -> 200 {"cik","ticker","name"} or
  404 {"detail": "Ticker not found"} (api.py:6-19).
* ``GET /ratios/{ticker}?limit=`` -> 200 {"ticker","years":[...]};
  404 on unknown ticker (api.py:28-29); limit validated ge=1 le=50
  (api.py:22) -> 422 on violation, matching FastAPI's Query contract
  (FastAPI REJECTS out-of-range params rather than clamping; the
  builder's clamp stays as defense in depth for library callers).
* ``GET /screener?...`` -> 200 {"results":[...]}; min_roe /
  min_fcf_margin / min_net_margin float, year int, limit ge=1 le=200
  (api.py:63-69) -> 422 on any unparsable/out-of-range value.

The serving DataFrames are passed in once at app construction (the
Spark analog of the reference's connection pool); every request reuses
the same session and the already-analyzed mart frames, so per-request
cost is one LIMITed job, never a scan of anything unbounded.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any
from urllib.parse import parse_qs

from pyspark.sql import DataFrame

from . import serving
from .plans import api_queries


class _Unprocessable(ValueError):
    """Maps to FastAPI's 422 validation response."""


def _query_int(qs: dict, name: str, default: int, ge: int, le: int) -> int:
    raw = qs.get(name, [None])[0]
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError as e:
        raise _Unprocessable(f"{name}: value is not a valid integer") from e
    if not (ge <= val <= le):
        raise _Unprocessable(f"{name}: must be between {ge} and {le}")
    return val


def _query_float(qs: dict, name: str) -> float | None:
    raw = qs.get(name, [None])[0]
    if raw is None:
        return None
    try:
        return float(raw)
    except ValueError as e:
        raise _Unprocessable(f"{name}: value is not a valid float") from e


def _query_opt_int(qs: dict, name: str) -> int | None:
    raw = qs.get(name, [None])[0]
    if raw is None:
        return None
    try:
        return int(raw)
    except ValueError as e:
        raise _Unprocessable(f"{name}: value is not a valid integer") from e


def create_app(companies: DataFrame, ratios: DataFrame) -> Callable:
    """WSGI app over the serving marts (companies dim + ratios_annual)."""

    def handle(path: str, qs: dict) -> tuple[int, dict[str, Any]]:
        parts = [p for p in path.split("/") if p]
        if len(parts) == 2 and parts[0] == "company":
            return 200, serving.collect_response(
                api_queries.company_profile(companies, parts[1]),
                serving.shape_company,
            )
        if len(parts) == 2 and parts[0] == "ratios":
            ticker = parts[1]
            limit = _query_int(qs, "limit", default=10, ge=1, le=50)
            # reference 404s on unknown ticker BEFORE querying ratios
            # (api.py:28-29); an empty point lookup is that same signal
            serving.collect_response(
                api_queries.company_profile(companies, ticker),
                serving.shape_company,
            )
            return 200, serving.collect_response(
                api_queries.company_ratios(companies, ratios, ticker, limit),
                serving.shape_ratios, ticker,
            )
        if len(parts) == 1 and parts[0] == "screener":
            return 200, serving.collect_response(
                api_queries.screener(
                    ratios, companies,
                    min_roe=_query_float(qs, "min_roe"),
                    min_fcf_margin=_query_float(qs, "min_fcf_margin"),
                    min_net_margin=_query_float(qs, "min_net_margin"),
                    year=_query_opt_int(qs, "year"),
                    limit=_query_int(qs, "limit", default=25, ge=1, le=200),
                ),
                serving.shape_screener,
            )
        raise LookupError("Not Found")

    def app(environ, start_response):
        try:
            status, payload = handle(
                environ.get("PATH_INFO", "/"),
                parse_qs(environ.get("QUERY_STRING", "")),
            )
        except _Unprocessable as e:
            status, payload = 422, {"detail": str(e)}
        except serving.NotFound as e:
            status, payload = 404, {"detail": str(e)}
        except LookupError:
            status, payload = 404, {"detail": "Not Found"}
        body = json.dumps(payload).encode()
        start_response(
            f"{status} {'OK' if status == 200 else 'ERROR'}",
            [("Content-Type", "application/json"),
             ("Content-Length", str(len(body)))],
        )
        return [body]

    return app


def serve(companies: DataFrame, ratios: DataFrame,
          host: str = "127.0.0.1", port: int = 8000) -> None:
    """Run the app under stdlib wsgiref (local/dev serving; put any real
    WSGI server in front for production)."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, create_app(companies, ratios)) as srv:
        srv.serve_forever()
