"""MERGE/upsert property tests (SURVEY §5.2 item 3): idempotency,
last-wins, id stability across batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.ar.ingest import (
    build_customers,
    build_invoices,
    read_raw_invoices,
    split_clean_quarantine,
)
from accounts_receivable_data_pipeline_api_spark.ar.merge import merge_invoices, upsert_latest

HEADER = "CustomerName,InvoiceNumber,InvoiceDate,CustomerPoNumber,BillTotal,Applied,Status,Currency,ContactName,ContactPhone,ContactEmail,CustomerTerms,DueDate"


def _facts(spark, csv_text, tmp_path, name):
    p = tmp_path / name
    p.write_text(csv_text)
    raw = read_raw_invoices(spark, str(p))
    clean, _ = split_clean_quarantine(raw)
    customers = build_customers(raw)
    return build_invoices(clean, customers)


def test_ingest_idempotent(spark, tmp_path):
    csv = (
        f"{HEADER}\n"
        "Acme,I-1,1/5/24,PO-1,100,0,Pending,USD,,,,Net 30,\n"
        "Bolt,I-2,1/6/24,PO-2,200,50,Pending,USD,,,,Net 7,\n"
    )
    batch = _facts(spark, csv, tmp_path, "a.csv")
    state1 = upsert_latest(batch)
    # merging the SAME batch again must be a no-op (SOLUTION.md:312-325)
    state2 = merge_invoices(state1, _facts(spark, csv, tmp_path, "b.csv"))
    a = sorted(map(tuple, state1.collect()))
    b = sorted(map(tuple, state2.collect()))
    assert a == b


def test_merge_updates_and_inserts(spark, tmp_path):
    csv1 = (
        f"{HEADER}\n"
        "Acme,I-1,1/5/24,PO-1,100,0,Pending,USD,,,,Net 30,\n"
        "Bolt,I-2,1/6/24,PO-2,200,50,Pending,USD,,,,Net 7,\n"
    )
    csv2 = (
        f"{HEADER}\n"
        "Acme,I-1,1/5/24,PO-1,100,100,Closed,USD,,,,Net 30,\n"  # update
        "Cork,I-3,1/8/24,PO-3,300,0,Pending,USD,,,,Net 15,\n"  # insert
    )
    state1 = upsert_latest(_facts(spark, csv1, tmp_path, "a.csv"))
    state2 = merge_invoices(state1, _facts(spark, csv2, tmp_path, "b.csv"))
    rows = {r["invoice_number"]: r for r in state2.collect()}
    assert set(rows) == {"I-1", "I-2", "I-3"}
    assert rows["I-1"]["status"] == "Closed"  # batch overrode existing
    assert str(rows["I-1"]["applied"]) == "100.00"
    assert rows["I-2"]["status"] == "Pending"  # untouched survives
    ids = {k: r["id"] for k, r in rows.items()}
    assert ids["I-1"] == 1  # existing key keeps its id
    assert ids["I-2"] == 2
    assert ids["I-3"] == 3  # new key continues after max id


def test_last_wins_within_batch(spark, tmp_path):
    csv = (
        f"{HEADER}\n"
        "Acme,I-1,1/5/24,PO-1,100,0,Pending,USD,,,,Net 30,\n"
        "Acme,I-1,1/6/24,PO-2,999,0,Pending,USD,,,,Net 30,\n"
    )
    state = upsert_latest(_facts(spark, csv, tmp_path, "a.csv"))
    rows = state.collect()
    assert len(rows) == 1
    assert str(rows[0]["bill_total"]) == "999.00"  # Q11: last occurrence wins
    assert rows[0]["id"] == 1  # id from first occurrence


def test_merge_batch_internal_dup(spark, tmp_path):
    csv1 = f"{HEADER}\nAcme,I-1,1/5/24,PO-1,100,0,Pending,USD,,,,Net 30,\n"
    csv2 = (
        f"{HEADER}\n"
        "Acme,I-1,1/6/24,PO-2,200,0,Pending,USD,,,,Net 30,\n"
        "Acme,I-1,1/7/24,PO-3,300,0,Pending,USD,,,,Net 30,\n"
    )
    state1 = upsert_latest(_facts(spark, csv1, tmp_path, "a.csv"))
    state2 = merge_invoices(state1, _facts(spark, csv2, tmp_path, "b.csv"))
    rows = state2.collect()
    assert len(rows) == 1
    assert str(rows[0]["bill_total"]) == "300.00"  # last within batch wins
    assert rows[0]["id"] == 1
