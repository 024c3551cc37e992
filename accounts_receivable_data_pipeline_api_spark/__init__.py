"""accounts_receivable_data_pipeline_api_spark — a PySpark-native analytics engine.

A ground-up Spark reimplementation of the query and data-processing
capabilities of the reference AR pipeline (PaulS97/
accounts-receivable-data-pipeline-api), extended with the
LLM-data-pipeline operator set (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB-scale execution.

Layout:
    session     — shared SparkSession factory with pinned confs
    sources     — batch readers (CSV invoices, parquet star schema)
    ar          — the accounts-receivable pipeline: ingest, queries, merge
    operators   — LLM-data-pipeline operators (dedup, similarity, text, multimodal)
    functions   — reusable column-expression helpers
    plans       — oracle query corpus over the synthetic star schema
    streaming   — Structured Streaming jobs over the events table
    api         — FastAPI REST layer mirroring the reference endpoints
"""

__version__ = "0.1.0"
