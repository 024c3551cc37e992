"""Endpoint-core tests: golden JSON replay from the reference's
documented examples (/root/reference/SOLUTION.md:103-223) plus error
quirks Q4-Q7."""

from __future__ import annotations

from datetime import date

import pytest

from accounts_receivable_data_pipeline_api_spark.api.endpoints import ApiError, Endpoints


@pytest.fixture(scope="module")
def api(spark) -> Endpoints:
    return Endpoints.from_csv(spark)


def test_health(api):
    assert api.health() == {"status": "ok"}


def test_golden_past_due_page(api):
    resp = api.past_due(as_of=date(2025, 3, 1), limit=5, offset=0, sort="due_date.asc")
    assert resp["total"] == 28
    assert resp["limit"] == 5 and resp["offset"] == 0
    assert len(resp["items"]) == 5
    # First two items, byte-for-byte vs SOLUTION.md:113-136.
    assert resp["items"][0] == {
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
    assert resp["items"][1]["applied"] == "417.75"
    assert resp["items"][1]["outstanding"] == "782.25"


def test_golden_monthly_summary(api):
    assert api.monthly_summary("2024-11") == {
        "month": "2024-11",
        "currency": "USD",
        "sum_bill_total": "318565.14",
        "count_invoices": 143,
    }


def test_golden_monthly_summary_filtered(api):
    assert api.monthly_summary("2024-11", customer_name="Lens & Light") == {
        "month": "2024-11",
        "currency": "USD",
        "sum_bill_total": "4550.00",
        "count_invoices": 2,
    }


def test_golden_customer_contact(api):
    assert api.customer_contact("Lens & Light") == {
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


def test_bad_month_is_400(api):
    with pytest.raises(ApiError) as err:
        api.monthly_summary("2024-13-01")
    assert err.value.status_code == 400


def test_unknown_customer_is_404(api):
    with pytest.raises(ApiError) as err:
        api.customer_contact("No Such Co")
    assert err.value.status_code == 404


def test_unknown_invoice_is_404(api):
    with pytest.raises(ApiError) as err:
        api.get_invoice("NOPE-123")
    assert err.value.status_code == 404


def test_unknown_customer_id_is_404(api):
    with pytest.raises(ApiError) as err:
        api.get_customer(10_000_000)
    assert err.value.status_code == 404


def test_limit_bounds(api):
    with pytest.raises(ApiError):
        api.past_due(as_of=date(2025, 3, 1), limit=500)
    # /customers/contact has NO upper bound on limit (reference parity)
    resp = api.customer_contact("Lens & Light", limit=100000)
    assert resp["total"] == 1


def test_list_customers(api):
    rows = api.list_customers()
    assert len(rows) == 135
    names = [r["name"] for r in rows]
    assert names == sorted(names)


def test_invoice_lookup_roundtrip(api):
    inv = api.get_invoice("DF2024988")
    assert inv["customer_name"] == "Lens & Light"
    assert inv["bill_total"] == "3150.00"
    assert inv["invoice_date"] == "2024-11-19"
    cust = api.get_customer(inv["customer_id"])
    assert cust["name"] == "Lens & Light"
