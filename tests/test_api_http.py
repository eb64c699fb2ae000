"""Offline tests for the WSGI serving shell (VERDICT r4 item 6) against
the golden shapes the serving tests hold (reference api.py:6-119).
Requests are plain WSGI calls -- no sockets, no server process."""

from __future__ import annotations

import json

import pytest

from sec_xbrl_finwarehouse_spark.api import create_app


@pytest.fixture(scope="module")
def app(spark):
    companies = spark.createDataFrame(
        [
            {"cik": "0000000001", "ticker": "AAA", "name": "Alpha Co"},
            {"cik": "0000000002", "ticker": "BBB", "name": "Beta Co"},
        ]
    )

    def year(cik, fy, roe, fcf, net):
        return {
            "cik": cik, "fiscal_year": fy, "gross_margin": 0.5,
            "operating_margin": 0.2, "net_margin": net, "roa": 0.1,
            "roe": roe, "leverage": 2.0, "fcf_margin": fcf,
            "asset_turnover": 0.8,
        }

    ratios = spark.createDataFrame(
        [
            year("0000000001", 2020, 0.30, 0.10, 0.12),
            year("0000000001", 2021, 0.25, 0.11, 0.13),
            year("0000000002", 2021, 0.40, None, 0.20),
        ]
    )
    return create_app(companies, ratios)


def get(app, path_query: str):
    path, _, qs = path_query.partition("?")
    captured = {}

    def start_response(status, headers):
        captured["status"] = int(status.split()[0])
        captured["headers"] = dict(headers)

    chunks = app({"PATH_INFO": path, "QUERY_STRING": qs}, start_response)
    body = b"".join(chunks)
    assert captured["headers"]["Content-Type"] == "application/json"
    assert int(captured["headers"]["Content-Length"]) == len(body)
    return captured["status"], json.loads(body)


def test_company_endpoint_golden(app):
    status, body = get(app, "/company/aaa")
    assert status == 200
    assert body == {"cik": "0000000001", "ticker": "AAA", "name": "Alpha Co"}


def test_company_endpoint_404(app):
    status, body = get(app, "/company/ZZZ")
    assert status == 404
    assert body == {"detail": "Ticker not found"}


def test_ratios_endpoint_golden(app):
    status, body = get(app, "/ratios/aaa")
    assert status == 200
    assert body["ticker"] == "AAA"
    assert [y["fiscal_year"] for y in body["years"]] == [2021, 2020]
    assert body["years"][0]["roe"] == 0.25


def test_ratios_endpoint_limit(app):
    status, body = get(app, "/ratios/aaa?limit=1")
    assert status == 200
    assert [y["fiscal_year"] for y in body["years"]] == [2021]


def test_ratios_endpoint_404_unknown_ticker(app):
    status, body = get(app, "/ratios/NOPE")
    assert status == 404
    assert body == {"detail": "Ticker not found"}


@pytest.mark.parametrize("bad", ["0", "51", "xyz"])
def test_ratios_limit_validation_422(app, bad):
    status, body = get(app, f"/ratios/aaa?limit={bad}")
    assert status == 422
    assert "limit" in body["detail"]


def test_screener_endpoint_golden(app):
    status, body = get(app, "/screener?min_roe=0.2")
    assert status == 200
    assert [(r["ticker"], r["fiscal_year"]) for r in body["results"]] == [
        ("BBB", 2021), ("AAA", 2021), ("AAA", 2020),
    ]
    assert set(body["results"][0]) == {
        "ticker", "name", "fiscal_year", "roe", "fcf_margin", "net_margin",
    }


def test_screener_filters_and_year(app):
    status, body = get(app, "/screener?year=2020")
    assert status == 200
    assert [(r["ticker"], r["fiscal_year"]) for r in body["results"]] == [
        ("AAA", 2020),
    ]


def test_screener_validation_422(app):
    status, body = get(app, "/screener?min_roe=high")
    assert status == 422
    assert "min_roe" in body["detail"]
    status, body = get(app, "/screener?limit=500")
    assert status == 422


def test_unknown_route_404(app):
    status, body = get(app, "/nope/path")
    assert status == 404
    assert body == {"detail": "Not Found"}


def test_serve_over_real_socket(app, spark):
    """One end-to-end request through a real wsgiref server socket --
    proves serve()'s plumbing, not just the WSGI callable."""
    import json as _json
    import threading
    import urllib.request
    from wsgiref.simple_server import make_server

    srv = make_server("127.0.0.1", 0, app)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/company/bbb", timeout=30
    ) as resp:
        assert resp.status == 200
        body = _json.loads(resp.read())
    assert body == {"cik": "0000000002", "ticker": "BBB", "name": "Beta Co"}
    t.join(timeout=10)
    srv.server_close()
