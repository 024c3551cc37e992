"""Batch upsert / MERGE (S5) as a shuffle-once window rewrite.

The reference upserts row-at-a-time via SQLite ON CONFLICT DO UPDATE
(/root/reference/scripts/ingest.py:61-101, applied in list order
:238-240 => last occurrence wins, Q11). The Spark-native equivalent is a
set-based rewrite: union existing state with the batch, rank each
invoice_number group by (batch priority, row order) descending, keep
rank 1.

Surrogate ``id`` semantics follow SQLite autoincrement-under-upsert: the
id is assigned at FIRST insert of a key and survives later updates, so
ids order by first occurrence of each invoice_number (Q10's fact-side
twin).

Scale notes: one hash shuffle on the natural key; identical to what
Delta/Iceberg MERGE INTO compiles to minus file-level pruning. The
dense-ordinal id assignment is a single global row_number over the
DEDUPED key set — at 100 TB one would swap it for a stable hash id or a
table-format identity column; kept here for reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ingest import ROW_IDX

_PRIORITY = "__merge_priority"

FACT_COLUMNS = (
    "id",
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


def upsert_latest(invoices: DataFrame, key: str = "invoice_number") -> DataFrame:
    """Collapse duplicate keys keeping the LAST occurrence's values
    (Q11), with ids ordered by FIRST occurrence. Single-batch form."""
    by_key = Window.partitionBy(key)
    last_wins = by_key.orderBy(F.col(ROW_IDX).desc())
    deduped = (
        invoices.withColumn("__first_idx", F.min(ROW_IDX).over(by_key))
        .withColumn("__rn", F.row_number().over(last_wins))
        .filter(F.col("__rn") == 1)
    )
    with_id = deduped.withColumn(
        "id", F.row_number().over(Window.orderBy("__first_idx")).cast("long")
    )
    return with_id.select(*FACT_COLUMNS)


def merge_invoices(existing: DataFrame, batch: DataFrame, key: str = "invoice_number") -> DataFrame:
    """MERGE across batches: batch rows override existing rows with the
    same key (last-in-batch wins within the batch); existing keys KEEP
    their ids; new keys get ids continuing after max(existing.id) in
    batch first-occurrence order.

    ``existing``: current table state (FACT_COLUMNS). ``batch``: a fresh
    ``build_invoices`` output (still carries ROW_IDX, no id).
    """
    by_key = Window.partitionBy(key)
    batch_dedup = (
        batch.withColumn("__first_idx", F.min(ROW_IDX).over(by_key))
        .withColumn("__rn", F.row_number().over(by_key.orderBy(F.col(ROW_IDX).desc())))
        .filter(F.col("__rn") == 1)
        .drop("__rn", ROW_IDX)
    )

    existing_keys = existing.select(F.col(key), F.col("id").alias("__existing_id"))
    # Broadcast-free: both sides hash-partition on the key; Spark/AQE
    # picks SMJ or broadcast based on actual sizes.
    joined = batch_dedup.join(existing_keys, key, "left")

    max_id = existing.agg(F.max("id")).first()[0] or 0
    new_rows = joined.filter(F.col("__existing_id").isNull())
    new_ids = new_rows.withColumn(
        "id",
        (F.row_number().over(Window.orderBy("__first_idx")) + F.lit(max_id)).cast("long"),
    )
    updated = joined.filter(F.col("__existing_id").isNotNull()).withColumn(
        "id", F.col("__existing_id")
    )
    batch_final = updated.unionByName(new_ids).select(*FACT_COLUMNS)

    untouched = existing.join(batch_dedup.select(key), key, "left_anti")
    return untouched.select(*FACT_COLUMNS).unionByName(batch_final)
