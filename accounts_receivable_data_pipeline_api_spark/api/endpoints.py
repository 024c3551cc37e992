"""Framework-agnostic endpoint core mirroring the reference REST API.

Each method returns the exact JSON-shaped dict the reference's Pydantic
models serialize (routes, params, envelopes, error codes from
/root/reference/app/main.py, app/api/invoices.py, app/api/customers.py).
``ApiError`` carries the HTTP status (404/400 per quirk Q7); the
stdlib HTTP adapter (api/http_server.py) is a thin translation layer,
so all semantics are testable without any web framework (none is
installed in this container).

The engine holds ONE long-lived SparkSession and caches the two AR
tables — deliberately the opposite of the reference's per-request
engine creation (app/db/engine.py:8-10, an anti-pattern at any scale).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime
from typing import Any, Optional
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame, SparkSession

from ..ar.ingest import DEFAULT_CSV, ingest as run_ingest
from ..ar import queries as q
from .serialize import json_value, row_to_dict

PAST_DUE_ITEM_FIELDS = (
    "invoice_number",
    "customer_name",
    "invoice_date",
    "due_date",
    "bill_total",
    "applied",
    "outstanding",
    "currency",
    "status",
    "days_past_due",
)
INVOICE_FIELDS = (
    "id",
    "invoice_number",
    "customer_id",
    "customer_name",
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
CUSTOMER_FIELDS = ("id", "name", "contact_name", "contact_phone", "contact_email")
CONTACT_FIELDS = ("contact_name", "contact_email", "contact_phone", "last_seen_invoice_date")


class ApiError(Exception):
    def __init__(self, status_code: int, detail: str):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


@dataclass
class Endpoints:
    spark: SparkSession
    customers: DataFrame
    invoices: DataFrame

    @classmethod
    def from_csv(cls, spark: SparkSession, path: str = DEFAULT_CSV) -> "Endpoints":
        result = run_ingest(spark, path)
        # Resident cache: endpoint latency is dominated by these two
        # frames; recomputed only on re-ingest.
        return cls(spark, result.customers.cache(), result.invoices.cache())

    # GET /health (reference app/main.py:11-13)
    def health(self) -> dict[str, Any]:
        return {"status": "ok"}

    # GET /invoices/past-due (reference app/api/invoices.py:41-138)
    # ``after`` is an [EXT] opt-in keyset cursor (SURVEY §4.2 "deep
    # pagination at scale"): OFFSET n materializes and discards n
    # sorted rows per request — O(offset) at depth — while the cursor
    # predicate pushes into the scan and keeps every page O(limit).
    # Passing after (even empty = first page) switches the response
    # envelope to {"items", "total", "limit", "next_after"}; without
    # it the reference envelope is byte-identical to before. total is
    # carried on the FIRST cursor page only (continuations return
    # total=null) — the pre-cursor count is an O(corpus) aggregation,
    # and paying it per page would undo the O(limit) deep-page claim.
    def past_due(
        self,
        as_of: Optional[date] = None,
        limit: int = 50,
        offset: int = 0,
        sort: str = "due_date.asc",
        after: Optional[str] = None,
    ) -> dict[str, Any]:
        if not 1 <= limit <= 200:
            raise ApiError(422, "limit must be in [1, 200]")
        if offset < 0:
            raise ApiError(422, "offset must be >= 0")
        cursor: Optional[tuple[date, str]] = None
        if after is not None:
            # the cursor encodes the asc (due_date, invoice_number)
            # order; under any other sort it would silently skip rows
            if sort != "due_date.asc":
                raise ApiError(422, "after requires sort=due_date.asc")
            if offset != 0:
                raise ApiError(422, "after and offset are mutually exclusive")
            if after != "":  # empty cursor = keyset mode, first page
                due_raw, sep, inv = after.partition(",")
                try:
                    if not sep or not inv:
                        raise ValueError(after)
                    cursor = (date.fromisoformat(due_raw), inv)
                except ValueError:
                    raise ApiError(
                        422, "after must be '<YYYY-MM-DD>,<invoice_number>'"
                    )
        if as_of is None:
            # F6: "today" resolves in America/New_York, OUTSIDE the plan.
            as_of = datetime.now(ZoneInfo("America/New_York")).date()
        page = q.past_due(
            self.invoices, self.customers, as_of, limit, offset, sort, after=cursor
        )
        rows = page.items.collect()
        items = [row_to_dict(r, PAST_DUE_ITEM_FIELDS) for r in rows]
        if after is None:
            return {"items": items, "total": page.total, "limit": limit, "offset": offset}
        # a full page may be the last one; the next request then returns
        # an empty page with next_after=None — O(1) termination without
        # a count. The cursor is the LAST item's sort key verbatim.
        next_after = (
            f"{items[-1]['due_date']},{items[-1]['invoice_number']}"
            if len(rows) == limit
            else None
        )
        return {
            "items": items,
            "total": page.total,
            "limit": limit,
            "next_after": next_after,
        }

    # GET /invoices/{invoice_number} (reference app/api/invoices.py:141-174)
    def get_invoice(self, invoice_number: str) -> dict[str, Any]:
        row = q.get_invoice(self.invoices, self.customers, invoice_number).first()
        if row is None:
            raise ApiError(404, "Invoice not found")
        return row_to_dict(row, INVOICE_FIELDS)

    # GET /invoices/summary/month (reference app/api/invoices.py:176-233)
    def monthly_summary(self, month: str, customer_name: Optional[str] = None) -> dict[str, Any]:
        try:
            q.month_window(month)
        except ValueError:
            raise ApiError(400, "month must be in YYYY-MM format")
        row = q.monthly_summary(self.invoices, self.customers, month, customer_name).first()
        return {
            "month": month,
            "currency": row["currency"] or "USD",
            "sum_bill_total": json_value(row["sum_bill_total"]),
            "count_invoices": row["count_invoices"] or 0,
        }

    # GET /customers/ (reference app/api/customers.py:19-49)
    def list_customers(self) -> list[dict[str, Any]]:
        rows = q.list_customers(self.customers).collect()
        return [row_to_dict(r, CUSTOMER_FIELDS) for r in rows]

    # GET /customers/contact (reference app/api/customers.py:52-119).
    # ``after`` is the [EXT] opt-in keyset cursor, same recipe as
    # past_due's (round-12 VERDICT #3): this is the reference route
    # with NO upper bound on limit, so deep offset paging is the
    # hazard; the cursor is the (id, name) of the last contact group —
    # id first in the wire format because names may contain commas.
    # Presence of after (even empty = first page) switches the envelope
    # to {"customer_name", "contacts", "total", "next_after"}; absent
    # keeps the parity envelope byte-identical. Unlike past_due, total
    # is UNCHANGED in cursor mode (Q6 pins it to the page length, an
    # O(limit) value) and the 404's match_count stays on every page (a
    # pruned small-dim scan, not past_due's O(fact) count).
    def customer_contact(
        self,
        name: str,
        limit: int = 10,
        offset: int = 0,
        after: Optional[str] = None,
    ) -> dict[str, Any]:
        if limit < 1:  # note: no upper bound, matching the reference
            raise ApiError(422, "limit must be >= 1")
        if offset < 0:
            raise ApiError(422, "offset must be >= 0")
        cursor: Optional[tuple[str, int]] = None
        if after is not None:
            if offset != 0:
                raise ApiError(422, "after and offset are mutually exclusive")
            if after != "":  # empty cursor = keyset mode, first page
                id_raw, sep, cname = after.partition(",")
                try:
                    # the name half may legitimately be EMPTY (a dim row
                    # whose name is "") — only the separator is required,
                    # or a walk could never continue past a full page
                    # ending on such a row (round-13 ADVICE)
                    if not sep:
                        raise ValueError(after)
                    cursor = (cname, int(id_raw))
                except ValueError:
                    raise ApiError(
                        422, "after must be '<customer_id>,<customer_name>'"
                    )
        page = q.customer_contact(
            self.customers,
            self.invoices,
            name,
            limit,
            offset,
            after=cursor,
            # cursor MODE (not just a present cursor) needs the group
            # key on the page: the blank first page mints next_after too
            include_id=after is not None,
        )
        if page.match_count == 0:
            raise ApiError(404, "Customer not found")
        rows = page.contacts.collect()
        contacts = [row_to_dict(r, CONTACT_FIELDS) for r in rows]
        customer_name = rows[0]["customer_name"] if rows else name
        if not rows and cursor is not None:
            # the terminal empty page is a ROUTINE part of every cursor
            # walk (unlike parity mode, where an empty page means a
            # too-deep offset): keep customer_name in the dim's
            # canonical casing rather than flipping to the raw query
            # casing mid-walk. A well-behaved client's cursor carries
            # the LAST group's name verbatim as minted from the
            # previous page's rows, so no re-query is needed — this
            # used to run an extra limit-1 Spark job per walk
            # termination (round-13 ADVICE/VERDICT). The cursor IS
            # client input on the wire, so the echo is GATED: only a
            # case variant of the query's own name is reflected (the
            # same trust class as the parity-mode echo of `name`),
            # anything else falls back to the query string. Gate, not
            # 422 (third-pass round-14 review): a rejection would have
            # to re-implement the dim-side lower() exactly — a JVM-vs-
            # Python Unicode-casing skew on a legitimately minted
            # cursor would then 422 a walk that can never proceed.
            customer_name = (
                cursor[0] if cursor[0].lower() == name.lower() else name
            )
        # Q6: total = page length, NOT match count (reference :115-119).
        if after is None:
            return {
                "customer_name": customer_name,
                "contacts": contacts,
                "total": len(contacts),
            }
        # a full page may be the last; the next request then returns an
        # empty page with next_after=None — O(1) termination, as in
        # past_due. The cursor is the LAST group's (id, name) verbatim.
        next_after = (
            f"{rows[-1]['id']},{rows[-1]['customer_name']}"
            if len(rows) == limit
            else None
        )
        return {
            "customer_name": customer_name,
            "contacts": contacts,
            "total": len(contacts),
            "next_after": next_after,
        }

    # GET /customers/{customer_id} (reference app/api/customers.py:122-152)
    def get_customer(self, customer_id: int) -> dict[str, Any]:
        row = q.get_customer(self.customers, customer_id).first()
        if row is None:
            raise ApiError(404, "Customer not found")
        return row_to_dict(row, CUSTOMER_FIELDS)
