"""Optional FastAPI adapter over the endpoint core.

Import-gated: FastAPI is not installed in the build container, so this
module raises a clear error if imported without it. Route table matches
the reference app exactly (/root/reference/app/main.py:6-16 and the two
routers). All query semantics live in api/endpoints.py + ar/queries.py;
this file only translates HTTP <-> dicts.
"""

from __future__ import annotations

from datetime import date
from typing import Optional

try:
    from fastapi import FastAPI, HTTPException, Query
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "FastAPI is not installed; use api.endpoints.Endpoints directly "
        "or install fastapi+uvicorn to serve HTTP"
    ) from e

from ..session import get_spark
from .endpoints import ApiError, Endpoints


def create_app(csv_path: Optional[str] = None) -> "FastAPI":
    app = FastAPI(title="accounts-receivable-data-pipeline-api-spark")
    spark = get_spark("accounts-receivable-data-pipeline-api-spark-api")
    endpoints = (
        Endpoints.from_csv(spark, csv_path) if csv_path else Endpoints.from_csv(spark)
    )

    def translate(fn, *args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ApiError as err:
            raise HTTPException(status_code=err.status_code, detail=err.detail)

    @app.get("/health")
    def health():
        return endpoints.health()

    @app.get("/invoices/past-due")
    def past_due(
        as_of: Optional[date] = Query(default=None),
        limit: int = Query(50, ge=1, le=200),
        offset: int = Query(0, ge=0),
        sort: Optional[str] = Query(default="due_date.asc"),
    ):
        return translate(endpoints.past_due, as_of, limit, offset, sort)

    @app.get("/invoices/summary/month")
    def monthly_summary(month: str = Query(...), customer_name: Optional[str] = Query(default=None)):
        return translate(endpoints.monthly_summary, month, customer_name)

    @app.get("/invoices/{invoice_number}")
    def get_invoice(invoice_number: str):
        return translate(endpoints.get_invoice, invoice_number)

    @app.get("/customers/")
    def list_customers():
        return endpoints.list_customers()

    @app.get("/customers/contact")
    def customer_contact(
        name: str = Query(...), limit: int = Query(10, ge=1), offset: int = Query(0, ge=0)
    ):
        return translate(endpoints.customer_contact, name, limit, offset)

    @app.get("/customers/{customer_id}")
    def get_customer(customer_id: int):
        return translate(endpoints.get_customer, customer_id)

    return app
