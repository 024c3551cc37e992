"""Sink tests (S3/S4/S5 write paths): partitioned fact write, overwrite
rebuild, partition pruning on read-back, keyset pagination."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.ar.ingest import DEFAULT_CSV, ingest, write_tables
from accounts_receivable_data_pipeline_api_spark.ar import queries as q


def test_write_tables_partitioned_and_pruned(spark, tmp_path):
    result = ingest(spark, DEFAULT_CSV)
    out = str(tmp_path / "warehouse")
    write_tables(result, out)

    # dim overwrite rebuild: second write replaces cleanly
    write_tables(result, out)

    customers = spark.read.parquet(f"{out}/customers")
    invoices = spark.read.parquet(f"{out}/invoices")
    assert customers.count() == 135
    assert invoices.count() == result.invoices.count()

    # month filter must prune to one hive partition
    pruned = invoices.filter(F.col("invoice_month") == "2024-11")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 143
    # partition pruning shows as a partition filter on the scan, and only
    # one of the ~20 month partitions is read
    n_files = pruned.select(F.input_file_name()).distinct().count()
    all_files = invoices.select(F.input_file_name()).distinct().count()
    assert n_files < all_files


def test_keyset_pagination_matches_offset(spark):
    result = ingest(spark, DEFAULT_CSV)
    as_of = date(2025, 3, 1)
    offset_page = q.past_due(
        result.invoices, result.customers, as_of, limit=10, offset=10
    ).items.collect()
    first_page = q.past_due(result.invoices, result.customers, as_of, limit=10).items.collect()
    last = first_page[-1]
    keyset_page = q.past_due_keyset(
        result.invoices,
        result.customers,
        as_of,
        after=(last["due_date"], last["invoice_number"]),
        limit=10,
    ).collect()
    assert [(r["invoice_number"], r["due_date"]) for r in keyset_page] == [
        (r["invoice_number"], r["due_date"]) for r in offset_page
    ]
