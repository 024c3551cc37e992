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


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8)
    write_bucketed(customer, "b_customer", "c_custkey", num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the test exercises the bucketed (non-broadcast) path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "b_orders", "b_customer", "o_custkey", "c_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        plain = load_table(spark, sf_dir, "orders").join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
