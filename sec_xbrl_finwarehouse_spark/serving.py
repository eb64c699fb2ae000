"""S7: JSON response shaping -- mart rows -> the reference API's nested
response dicts (src/sec_xbrl_finwarehouse/api.py:19,45-61,107-119).

The query builders in :mod:`.plans.api_queries` return the exact row
sets the reference's SQL returns; this module is the thin serving edge
that shapes those rows into the endpoint payloads:

* ``GET /company/{ticker}``  -> {"cik", "ticker", "name"} or 404
* ``GET /ratios/{ticker}``   -> {"ticker", "years": [{...} per year]}
* ``GET /screener``          -> {"results": [{...} per row]}

Shaping happens driver-side on an already-LIMITed result (point lookup,
limit<=50 history, limit<=200 screener page), so collecting is the
correct move -- the distributed plan (TakeOrderedAndProject + broadcast
join) has reduced the data to a response page before any row reaches
Python. ``collect_response`` is the only place in the engine that
materializes rows outside a sink/test.

No web framework here on purpose: the reference's FastAPI layer maps
1:1 (route -> builder -> shape); any HTTP server can wrap these
functions without touching the engine.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Row


class NotFound(LookupError):
    """Maps to the reference's HTTPException(404) (api.py:17,29)."""


_RATIO_YEAR_FIELDS = (
    "fiscal_year", "gross_margin", "operating_margin", "net_margin",
    "roa", "roe", "leverage", "fcf_margin", "asset_turnover",
)
_SCREENER_FIELDS = (
    "ticker", "name", "fiscal_year", "roe", "fcf_margin", "net_margin",
)


def _dicts(rows: list[Row], fields: tuple[str, ...]) -> list[dict[str, Any]]:
    return [{f: r[f] for f in fields} for r in rows]


def shape_company(rows: list[Row]) -> dict[str, Any]:
    """api.py:13-19: single-row point lookup or 404."""
    if not rows:
        raise NotFound("Ticker not found")
    r = rows[0]
    return {"cik": r["cik"], "ticker": r["ticker"], "name": r["name"]}


def shape_ratios(ticker: str, rows: list[Row]) -> dict[str, Any]:
    """api.py:45-61: {"ticker", "years": [...]} -- rows arrive newest
    fiscal year first (the builder's ORDER BY), order is preserved."""
    return {
        "ticker": ticker.upper(),
        "years": _dicts(rows, _RATIO_YEAR_FIELDS),
    }


def shape_screener(rows: list[Row]) -> dict[str, Any]:
    """api.py:107-119: {"results": [...]} in ranked order."""
    return {"results": _dicts(rows, _SCREENER_FIELDS)}


def collect_response(df: DataFrame, shape, *args) -> dict[str, Any]:
    """Run a serving query and shape its page: the DataFrame is already
    LIMITed by the builder, so this collect moves one response page, not
    a table."""
    rows = df.collect()
    return shape(*args, rows) if args else shape(rows)
