"""AR ingest: invoices CSV -> customers dim + invoices fact + quarantine.

Spark-first reimplementation of the reference pipeline's semantics
(/root/reference/scripts/ingest.py:104-214). The reference streams the
CSV row-by-row in one Python process; here the same semantics are
expressed as declarative DataFrame transforms so Catalyst/Tungsten
parallelize them:

- first-seen customer ids (Q10)      -> min(row_idx) per name + row_number
- contact backfill "first non-empty" -> min(struct(row_idx, contact)) agg
- row-level error quarantine (Q8)    -> validity predicate splitting the
                                        frame into clean/quarantine
- last-wins duplicate handling (Q11) -> row_number desc over row_idx
- stats counters (A8)                -> one aggregate pass

Order dependence (the one thing a distributed engine must make explicit,
SURVEY §7.4): every row is stamped with a file-order index at read time;
all "first/last" semantics are defined against that index, never against
partition order.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import money, nullif_blank, parse_mdy_date, terms_days_expr

RAW_COLUMNS = (
    "CustomerName",
    "InvoiceNumber",
    "InvoiceDate",
    "CustomerPoNumber",
    "BillTotal",
    "Applied",
    "Status",
    "Currency",
    "ContactName",
    "ContactPhone",
    "ContactEmail",
    "CustomerTerms",
    "DueDate",
)

ROW_IDX = "__row_idx"

# Default input: the reference repo's CSV (read-only test asset).
DEFAULT_CSV = "/root/reference/data/unicorn_inc.csv"


def read_raw_invoices(spark: SparkSession, path: str = DEFAULT_CSV) -> DataFrame:
    """All-string CSV read (S1) with a deterministic file-order row index.

    ``monotonically_increasing_id`` encodes (partition, offset); for a
    file-based scan the planner orders splits by (file, offset), so the
    id is monotone in file order — the property first-seen/last-wins
    semantics need. At 100 TB the same recipe holds per-file; cross-file
    order comes from the lexicographic file listing.
    """
    raw = spark.read.csv(path, header=True, inferSchema=False)
    return raw.withColumn(ROW_IDX, F.monotonically_increasing_id())


def _error_predicate(raw: DataFrame):
    """Rows the reference would quarantine (Q8): any scalar parse that
    raises. Decimal() raises on malformed money; strptime raises on
    malformed non-empty dates. Missing CustomerName (None) raises
    AttributeError on .strip()."""
    def bad_money(name: str):
        trimmed = F.trim(F.col(name))
        return trimmed.isNotNull() & (trimmed != "") & trimmed.try_cast("decimal(18,2)").isNull()

    def bad_date(name: str):
        head = F.split(F.trim(F.col(name)), " ").getItem(0)
        return (
            F.col(name).isNotNull()
            & (F.trim(F.col(name)) != "")
            & F.try_to_timestamp(head, F.lit("M/d/yy")).isNull()
        )

    return (
        F.col("CustomerName").isNull()
        | bad_money("BillTotal")
        | bad_money("Applied")
        | bad_date("InvoiceDate")
        | bad_date("DueDate")
    )


def split_clean_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    err = _error_predicate(raw)
    return raw.filter(~err), raw.filter(err)


def build_customers(raw: DataFrame) -> DataFrame:
    """Customers dim (A6/Q10). Built from ALL parsed rows — the reference
    registers a customer before invoice-field parsing, so a row that is
    later quarantined still contributes its name/contacts.

    One aggregate pass per name:
      - first_idx = min(row_idx)          -> first-seen ordering
      - contact_* = min(struct(row_idx, contact)) over non-blank rows
                                          -> "first non-empty wins" backfill
    then ids = row_number() ordered by first_idx. The global row_number
    is the single order-dependent step; it runs on the deduped dim
    (|customers| rows, not |rows|), which is the smallest frame in the
    job — acceptable even for a 10M-customer dim.
    """
    def first_nonblank(colname: str):
        value = nullif_blank(F.col(colname))
        pair = F.when(value.isNotNull(), F.struct(F.col(ROW_IDX).alias("i"), value.alias("v")))
        return F.min(pair).getField("v")

    named = raw.filter(F.col("CustomerName").isNotNull()).withColumn(
        "name", F.trim(F.col("CustomerName"))
    )
    dim = named.groupBy("name").agg(
        F.min(ROW_IDX).alias("__first_idx"),
        first_nonblank("ContactName").alias("contact_name"),
        first_nonblank("ContactPhone").alias("contact_phone"),
        first_nonblank("ContactEmail").alias("contact_email"),
    )
    w = Window.orderBy("__first_idx")
    return dim.withColumn("id", F.row_number().over(w).cast("long")).select(
        "id", "name", "contact_name", "contact_phone", "contact_email"
    )


def build_invoices(clean: DataFrame, customers: DataFrame) -> DataFrame:
    """Invoices fact from clean rows (J3 + F8-F12).

    Typed parses happen as column expressions; customer ids arrive via a
    broadcast join on the trimmed name (the reference's in-memory dict
    lookup, scripts/ingest.py:126-146). Keeps ALL rows including
    duplicate invoice_numbers — upsert/dedup is a separate concern
    (merge.upsert_latest), mirroring the parse/load split.
    """
    parsed = (
        clean.withColumn("name", F.trim(F.col("CustomerName")))
        .withColumn("invoice_number", F.trim(F.col("InvoiceNumber")))
        .withColumn("invoice_date", parse_mdy_date(F.col("InvoiceDate")))
        .withColumn("due_date_raw", parse_mdy_date(F.col("DueDate")))
        .withColumn("customer_po_number", F.trim(F.col("CustomerPoNumber")))
        .withColumn("bill_total", money(F.col("BillTotal")))
        .withColumn("applied", money(F.col("Applied")))
        .withColumn("status", nullif_blank(F.col("Status")))
        .withColumn("currency", nullif_blank(F.col("Currency")))
        .withColumn("customer_terms", nullif_blank(F.col("CustomerTerms")))
        .withColumn("terms_days", terms_days_expr(F.col("CustomerTerms")))
    )
    # F11: derive due_date from terms when absent.
    parsed = parsed.withColumn(
        "due_date",
        F.coalesce(
            F.col("due_date_raw"),
            F.when(
                F.col("invoice_date").isNotNull() & F.col("terms_days").isNotNull(),
                F.date_add(F.col("invoice_date"), F.col("terms_days")),
            ),
        ),
    )
    dim = F.broadcast(customers.select(F.col("id").alias("customer_id"), "name"))
    return parsed.join(dim, "name", "inner").select(
        ROW_IDX,
        "invoice_number",
        "customer_id",
        "invoice_date",
        "due_date",
        "customer_po_number",
        "bill_total",
        "applied",
        "status",
        "currency",
        "customer_terms",
        "terms_days",
    )


@dataclass
class IngestResult:
    customers: DataFrame
    invoices: DataFrame  # post-upsert (unique invoice_number, last-wins)
    quarantine: DataFrame
    stats: dict[str, Any]


def ingest(spark: SparkSession, path: str = DEFAULT_CSV) -> IngestResult:
    """Full pipeline: CSV -> dim + fact + quarantine + stats (A7/A8).

    Stats shape mirrors the reference's dict
    (/root/reference/scripts/ingest.py:204-213).
    """
    from .merge import upsert_latest

    raw = read_raw_invoices(spark, path)
    clean, quarantine = split_clean_quarantine(raw)
    customers = build_customers(raw)
    invoices_all = build_invoices(clean, customers)
    invoices = upsert_latest(invoices_all)

    n_rows = raw.count()
    counts = invoices_all.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("invoice_number").alias("nd"),
    ).first()
    n_invoices, n_distinct = counts["n"], counts["nd"]
    n_customers = customers.count()
    n_errors = quarantine.count()
    error_examples = [
        {"row_number": r[ROW_IDX] + 1, "row": {c: r[c] for c in RAW_COLUMNS}}
        for r in quarantine.orderBy(ROW_IDX).limit(5).collect()
    ]
    dup_examples = [
        f"Duplicate InvoiceNumber {r['invoice_number']!r}"
        for r in (
            invoices_all.groupBy("invoice_number")
            .count()
            .filter("count > 1")
            .orderBy("invoice_number")
            .limit(5)
            .collect()
        )
    ]
    stats = {
        "n_rows": n_rows,
        "n_customers": n_customers,
        "n_invoices": n_invoices,
        "n_errors": n_errors,
        "error_examples": error_examples,
        "n_duplicate_invoices": n_invoices - n_distinct,
        "duplicate_invoice_examples": dup_examples,
    }
    return IngestResult(customers, invoices, quarantine, stats)


def write_tables(result: IngestResult, out_dir: str) -> None:
    """Sinks (S3/S4): dim overwritten wholesale (deterministic rebuild);
    fact written partitioned by invoice month so month-window queries
    (P5) get partition pruning at scale."""
    result.customers.write.mode("overwrite").parquet(os.path.join(out_dir, "customers"))
    (
        result.invoices.withColumn("invoice_month", F.date_format("invoice_date", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("invoice_month")
        .parquet(os.path.join(out_dir, "invoices"))
    )
