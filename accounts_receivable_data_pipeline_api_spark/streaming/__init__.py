from .pipeline import (
    dedup_invoice_stream,
    enrich_events_with_dim,
    events_windowed_counts,
    funnel_events_stream,
    incremental_dedup_stream,
    invoice_csv_stream,
    join_purchases_to_signups_stream,
    read_sketch,
    read_snapshot_table,
    sessionize_events,
    stream_upsert_invoices,
    token_frequency_sketch_stream,
)

__all__ = [
    "dedup_invoice_stream",
    "enrich_events_with_dim",
    "events_windowed_counts",
    "funnel_events_stream",
    "incremental_dedup_stream",
    "invoice_csv_stream",
    "join_purchases_to_signups_stream",
    "read_sketch",
    "read_snapshot_table",
    "sessionize_events",
    "stream_upsert_invoices",
    "token_frequency_sketch_stream",
]
