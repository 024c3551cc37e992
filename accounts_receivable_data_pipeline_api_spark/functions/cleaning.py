"""Column-expression helpers for ingest-time cleaning.

Each helper mirrors one scalar parse function of the reference ingest
(F8-F12 in SURVEY §2.8; /root/reference/scripts/ingest.py:24-58) but is a
pure Catalyst column expression — JVM-side, codegen'd, no Python UDFs in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

MONEY_TYPE = DecimalType(18, 2)


def nullif_blank(col: Column) -> Column:
    """trim, then empty string -> NULL (F12; ingest.py strips every field
    and maps empty contact fields to None)."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(None)).otherwise(trimmed)


def money(col: Column) -> Column:
    """Money parse (F9; reference scripts/ingest.py:24-28): strip; empty
    -> 0; else exact Decimal(18,2). Invalid numerics become NULL via the
    failed cast, which the quarantine predicate catches upstream."""
    trimmed = F.trim(col)
    normalized = F.when((trimmed.isNull()) | (trimmed == ""), F.lit("0")).otherwise(trimmed)
    return normalized.cast(MONEY_TYPE)


def parse_mdy_date(col: Column) -> Column:
    """Strict M/d/yy parse with trailing time stripped (F8; reference
    scripts/ingest.py:31-46 does value.split()[0] then strptime %m/%d/%y).

    Spark's 'M/d/yy' under timeParserPolicy=CORRECTED accepts both padded
    and non-padded month/day, matching Python's lenient %m/%d/%y. Empty ->
    NULL. Unparseable non-empty values -> NULL (caught by quarantine
    predicate where the reference would raise and skip the row).
    """
    head = F.split(F.trim(col), " ").getItem(0)
    head = F.when(head == "", F.lit(None)).otherwise(head)
    return F.try_to_timestamp(head, F.lit("M/d/yy")).cast("date")


def terms_days_expr(col: Column) -> Column:
    """Regex-extract the first integer from terms text (F10; reference
    scripts/ingest.py:49-58): 'Net 30' -> 30, no digits / empty -> NULL."""
    extracted = F.regexp_extract(F.coalesce(col, F.lit("")), r"(\d+)", 1)
    return F.when(extracted == "", F.lit(None)).otherwise(extracted).cast("int")


def outstanding_expr(bill_total: Column, applied: Column) -> Column:
    """outstanding = coalesce(bill_total,0) - coalesce(applied,0)
    (P2; reference app/api/invoices.py:71-74)."""
    zero = F.lit("0").cast(MONEY_TYPE)
    return (F.coalesce(bill_total, zero) - F.coalesce(applied, zero)).cast(MONEY_TYPE)
