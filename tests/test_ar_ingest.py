"""Ingest + golden endpoint tests against the reference's own CSV.

Goldens come from the reference's documented example responses
(/root/reference/SOLUTION.md:103-223) — effectively its only test
artifacts (SURVEY §5.1).
"""

from __future__ import annotations

from datetime import date
from decimal import Decimal

import pytest

from accounts_receivable_data_pipeline_api_spark.ar.ingest import DEFAULT_CSV, ingest
from accounts_receivable_data_pipeline_api_spark.ar import queries as q


@pytest.fixture(scope="module")
def result(spark):
    res = ingest(spark, DEFAULT_CSV)
    res.customers.cache().count()
    res.invoices.cache().count()
    return res


def test_ingest_stats(result):
    # Profiled facts: 3,107 rows, 135 customers (BASELINE.md).
    assert result.stats["n_rows"] == 3107
    assert result.stats["n_customers"] == 135
    assert result.stats["n_invoices"] + result.stats["n_errors"] == 3107
    assert result.stats["n_duplicate_invoices"] == 0


def test_customer_ids_first_seen(result):
    # First CSV row is Lens & Light -> id 1 (Q10).
    first = result.customers.orderBy("id").first()
    assert first["id"] == 1
    assert first["name"] == "Lens & Light"


def test_due_date_derivation(result):
    # 149 CSV rows have empty DueDate; all derivable via terms (F11).
    nulls = result.invoices.filter("due_date IS NULL").count()
    assert nulls == 0


def test_golden_monthly_summary(result):
    row = q.monthly_summary(result.invoices, result.customers, "2024-11").first()
    assert row["sum_bill_total"] == Decimal("318565.14")
    assert row["count_invoices"] == 143
    assert row["currency"] == "USD"


def test_golden_monthly_summary_customer(result):
    row = q.monthly_summary(
        result.invoices, result.customers, "2024-11", customer_name="lens & light"
    ).first()
    assert row["sum_bill_total"] == Decimal("4550.00")
    assert row["count_invoices"] == 2


def test_golden_past_due_total(result):
    page = q.past_due(
        result.invoices, result.customers, as_of=date(2025, 3, 1), limit=5
    )
    assert page.total == 28
    rows = page.items.collect()
    assert len(rows) == 5
    assert all(r["outstanding"] > 0 for r in rows)
    assert all(r["days_past_due"] >= 1 for r in rows)
    due = [r["due_date"] for r in rows]
    assert due == sorted(due)


def test_past_due_sort_fallback(result):
    asc = q.past_due(result.invoices, result.customers, date(2025, 3, 1), sort="bogus")
    desc = q.past_due(result.invoices, result.customers, date(2025, 3, 1), sort="due_date.desc")
    asc_first = asc.items.first()["due_date"]
    desc_first = desc.items.first()["due_date"]
    assert asc_first <= desc_first  # Q4: bogus falls back to asc


def test_contact_lookup(result):
    page = q.customer_contact(result.customers, result.invoices, "LENS & LIGHT")
    assert page.match_count == 1
    rows = page.contacts.collect()
    assert len(rows) == 1
    assert rows[0]["customer_name"] == "Lens & Light"
    assert rows[0]["contact_name"] == "Angela Scott"
    assert rows[0]["last_seen_invoice_date"] is not None


def test_contact_unknown_name(result):
    page = q.customer_contact(result.customers, result.invoices, "No Such Co")
    assert page.match_count == 0  # REST layer turns this into 404 (Q7)


def test_get_invoice_roundtrip(result):
    row = q.get_invoice(result.invoices, result.customers, "DF2024988").first()
    assert row is not None
    assert row["customer_name"] == "Lens & Light"
    assert row["bill_total"] == Decimal("3150.00")
    missing = q.get_invoice(result.invoices, result.customers, "NOPE").first()
    assert missing is None


HEADER = (
    "CustomerName,InvoiceNumber,InvoiceDate,CustomerPoNumber,BillTotal,Applied,"
    "Status,Currency,ContactName,ContactPhone,ContactEmail,CustomerTerms,DueDate"
)


def _row(name, inv, contact="", bill="100.00"):
    return f"{name},{inv},1/5/24,PO1,{bill},0,Open,USD,{contact},,,Net 30,"


def test_multifile_order(spark, tmp_path):
    """ROW_IDX must follow (lexicographic file, in-file row) order even
    when Spark's size-descending split packing visits files in the other
    order. The lexicographically FIRST file is deliberately the SMALLER
    one, so the bin-packer reads file b first — the old
    monotonically_increasing_id index would invert first-seen/last-wins
    here (round-2 VERDICT fix #3)."""
    d = tmp_path / "multi"
    d.mkdir()
    # a.csv: 2 rows; b.csv: 200 rows (larger => scheduled first by size)
    a_rows = [
        _row("Alpha Co", "INV-A1", contact=""),  # blank contact: backfill comes later
        _row("Dup Co", "INV-DUP", bill="111.00"),
    ]
    b_rows = (
        [_row("Alpha Co", "INV-B1", contact="From B")]
        + [_row("Beta Co", f"INV-B{i}", contact="Beta Contact") for i in range(2, 199)]
        + [_row("Dup Co", "INV-DUP", bill="222.00")]
    )
    (d / "a.csv").write_text("\n".join([HEADER, *a_rows]) + "\n")
    (d / "b.csv").write_text("\n".join([HEADER, *b_rows]) + "\n")

    res = ingest(spark, str(d))
    customers = {r["name"]: r for r in res.customers.collect()}
    # First-seen order (Q10): file a registers Alpha then Dup; Beta only in b.
    assert customers["Alpha Co"]["id"] == 1
    assert customers["Dup Co"]["id"] == 2
    assert customers["Beta Co"]["id"] == 3
    # Contact backfill: Alpha's first non-empty contact is in file b.
    assert customers["Alpha Co"]["contact_name"] == "From B"
    # Last-wins upsert (Q11): the b.csv duplicate (file-order later) wins.
    dup = res.invoices.filter("invoice_number = 'INV-DUP'").collect()
    assert len(dup) == 1
    assert dup[0]["bill_total"] == Decimal("222.00")
    assert res.stats["n_rows"] == len(a_rows) + len(b_rows)
