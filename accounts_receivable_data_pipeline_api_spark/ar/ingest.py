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


# Bits reserved for the within-file row position in ROW_IDX: files are
# ordered in the high bits, rows within a file in the low 40 (supports
# ~1.1e12 rows per file).
_FILE_ORD_SHIFT = 40


def read_raw_invoices(spark: SparkSession, path: str = DEFAULT_CSV) -> DataFrame:
    """All-string CSV read (S1) with a deterministic file-order row index.

    ROW_IDX is derived from data, not from scan layout (round-2 fix —
    the previous ``monotonically_increasing_id`` claim was wrong: Spark
    bin-packs splits sorted by SIZE DESCENDING, not by file path, so the
    raw id is not file-order monotone on multi-file or multi-split
    input). The deterministic construction:

      1. ``_metadata.file_path`` + ``_metadata.file_block_start`` stamp
         each row with its file and byte-range; within one block rows
         are scanned sequentially, so a per-block
         ``monotonically_increasing_id`` orders rows inside the block.
      2. per-file position = row_number() over
         (partitionBy file, orderBy block_start, intra-block id) — a
         shuffle keyed by FILE, so at 100 TB each file's window runs in
         parallel across executors; no global single-partition sort.
      3. file ordinal = row_number over the lexicographically sorted
         DISTINCT file list (O(#files) rows, broadcast back) — "file
         order" is the explicit lexicographic listing, matching how the
         reference would `for f in sorted(glob(...))`.
      4. ROW_IDX = file_ordinal << 40 | per-file position (0-based), so
         a single-file read keeps ROW_IDX == CSV data-row offset, which
         the stats path relies on for 1-based row numbers
         (reference scripts/ingest.py:121-199).

    First-seen ids (Q10), contact backfill, and last-wins upsert (Q11)
    all order by this index, so their results are independent of
    partition count and split packing — pinned by
    tests/test_ar_ingest.py::test_multifile_order with size-inverted
    files.
    """
    raw = spark.read.csv(path, header=True, inferSchema=False)
    stamped = (
        raw.withColumn("__file", F.col("_metadata.file_path"))
        .withColumn("__block", F.col("_metadata.file_block_start"))
        .withColumn("__seq", F.monotonically_increasing_id())
    )
    in_file = Window.partitionBy("__file").orderBy("__block", "__seq")
    files = (
        stamped.select("__file")
        .distinct()
        .withColumn(
            "__file_ord",
            (F.row_number().over(Window.orderBy("__file")) - 1).cast("long"),
        )
    )
    return (
        stamped.withColumn("__pos", (F.row_number().over(in_file) - 1).cast("long"))
        .join(F.broadcast(files), "__file")
        .withColumn(
            ROW_IDX,
            F.shiftleft(F.col("__file_ord"), _FILE_ORD_SHIFT) + F.col("__pos"),
        )
        .drop("__file", "__block", "__seq", "__pos", "__file_ord")
    )


def _bad_money(name: str):
    trimmed = F.trim(F.col(name))
    return trimmed.isNotNull() & (trimmed != "") & trimmed.try_cast("decimal(18,2)").isNull()


def _bad_date(name: str):
    head = F.split(F.trim(F.col(name)), " ").getItem(0)
    return (
        F.col(name).isNotNull()
        & (F.trim(F.col(name)) != "")
        & F.try_to_timestamp(head, F.lit("M/d/yy")).isNull()
    )


# (reason, predicate) in the reference's raise order, so the synthesized
# "error" field names the FIRST failure the reference would hit
# (scripts/ingest.py:125-167: CustomerName.strip -> parse_money(BillTotal)
# -> parse_money(Applied) -> parse_invoice_date -> parse_due_date_raw ->
# InvoiceNumber.strip -> CustomerPoNumber.strip). parse_due_date_raw and
# extract_terms_days are None-guarded in the reference, so only a
# malformed non-empty DueDate errors, and CustomerTerms never does.
def _error_cases():
    attr = "AttributeError(\"'NoneType' object has no attribute 'strip'\")"
    return [
        (f"{attr} [CustomerName]", F.col("CustomerName").isNull()),
        ("InvalidOperation [BillTotal]", _bad_money("BillTotal")),
        ("InvalidOperation [Applied]", _bad_money("Applied")),
        ("ValueError [InvoiceDate]", _bad_date("InvoiceDate")),
        ("ValueError [DueDate]", _bad_date("DueDate")),
        (f"{attr} [InvoiceNumber]", F.col("InvoiceNumber").isNull()),
        (f"{attr} [CustomerPoNumber]", F.col("CustomerPoNumber").isNull()),
    ]


def _error_predicate(raw: DataFrame):
    """Rows the reference would quarantine (Q8): any scalar parse that
    raises. Decimal() raises on malformed money; strptime raises on
    malformed non-empty dates; .strip() on a missing CustomerName /
    InvoiceNumber / CustomerPoNumber raises AttributeError
    (reference scripts/ingest.py:125,160,165).

    Known conflation, documented: Spark's CSV parser returns NULL for
    both an EMPTY unquoted field and a MISSING field of a short row
    (verified — a sentinel nullValue doesn't change this), while Python's
    DictReader yields "" vs None respectively. The reference keeps
    empty-identifier rows ("".strip() succeeds) but errors on short
    rows. We quarantine NULL identifiers, which matches the reference on
    every structurally well-formed CSV (the golden file has no empty
    identifier fields) and errs toward hygiene on short rows.
    """
    cases = _error_cases()
    pred = cases[0][1]
    for _, p in cases[1:]:
        pred = pred | p
    return pred


def _error_reason():
    """CASE expression naming the first reference-order failure."""
    expr = F.lit(None).cast("string")
    for reason, pred in reversed(_error_cases()):
        expr = F.when(pred, F.lit(reason)).otherwise(expr)
    return expr


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
        {
            "row_number": r[ROW_IDX] + 1,
            "row": {c: r[c] for c in RAW_COLUMNS},
            "error": r["__error"],
        }
        for r in (
            quarantine.withColumn("__error", _error_reason())
            .orderBy(ROW_IDX)
            .limit(5)
            .collect()
        )
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
