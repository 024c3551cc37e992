from .ingest import IngestResult, build_customers, build_invoices, ingest, read_raw_invoices
from .merge import merge_invoices

__all__ = [
    "IngestResult",
    "build_customers",
    "build_invoices",
    "ingest",
    "merge_invoices",
    "read_raw_invoices",
]
