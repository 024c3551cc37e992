from .pipeline import (
    dedup_invoice_stream,
    events_windowed_counts,
    invoice_csv_stream,
    sessionize_events,
)

__all__ = [
    "dedup_invoice_stream",
    "events_windowed_counts",
    "invoice_csv_stream",
    "sessionize_events",
]
