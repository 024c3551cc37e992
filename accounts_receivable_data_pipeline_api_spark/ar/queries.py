"""AR query layer: pure DataFrame-producing functions.

Each function mirrors one reference endpoint's query semantics
(/root/reference/app/api/invoices.py, app/api/customers.py) with every
scalar computation inside the Catalyst plan — the reference's Python
post-processing loops (outstanding clamp, days_past_due; invoices.py:
106-131) become ``greatest``/``datediff`` column expressions so the work
runs distributed and codegen'd, not row-at-a-time on the driver.

Quirks encoded (SURVEY §2.11):
  Q1 past-due ``total`` counts the filtered FACT, pre-join.
  Q2 summary currency = min(currency) with 'USD' fallback.
  Q3 emitted outstanding = greatest(outstanding, 0) (always > 0 given the filter).
  Q4 unknown sort values fall back to ascending.
  Q5 deliberate deviation: deterministic ``invoice_number`` tie-break
     (the reference's order among due_date ties is SQLite-plan-dependent,
     i.e. unspecified; a distributed engine must pin it).
  Q6 contact ``total`` = page length, not match count.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import MONEY_TYPE, outstanding_expr

PAST_DUE_SORTS = {"due_date.asc": True, "due_date.desc": False}


def month_window(month: str) -> tuple[date, date]:
    """'YYYY-MM' -> [first_day, first_of_next_month) with December
    rollover (F7; reference app/api/invoices.py:188-196). Raises
    ValueError on malformed input (REST layer maps it to 400, Q7)."""
    dt = datetime.strptime(month, "%Y-%m")
    first_day = date(dt.year, dt.month, 1)
    next_month = date(dt.year + (dt.month == 12), (dt.month % 12) + 1, 1)
    return first_day, next_month


def _keyset_after_filter(df: DataFrame, after: tuple[date, str]) -> DataFrame:
    """The keyset cursor predicate, in ONE place (second-pass round-12
    review — past_due and past_due_keyset each carried a copy): rows
    strictly after (due_date, invoice_number) in asc order, expressed
    as the expanded OR so each conjunct can prune row groups."""
    after_due, after_inv = after
    return df.filter(
        (F.col("due_date") > F.lit(after_due))
        | (
            (F.col("due_date") == F.lit(after_due))
            & (F.col("invoice_number") > F.lit(after_inv))
        )
    )


@dataclass
class PastDuePage:
    items: DataFrame
    total: int | None  # None on keyset continuation pages (no count scan)
    limit: int
    offset: int


def past_due(
    invoices: DataFrame,
    customers: DataFrame,
    as_of: date,
    limit: int = 50,
    offset: int = 0,
    sort: str = "due_date.asc",
    after: tuple[date, str] | None = None,
) -> PastDuePage:
    """GET /invoices/past-due (reference app/api/invoices.py:41-138).

    Plan shape at scale: the fact filter (outstanding > 0 AND due_date <
    as_of) is pure column arithmetic -> pushed to the parquet scan; the
    dim join is broadcast; sort+offset+limit compiles to
    TakeOrderedAndProject, so only limit+offset rows ever reach the
    driver.

    ``after`` ([EXT], opt-in): keyset cursor (due_date,
    invoice_number) of the last item of the previous page — the
    scale-safe deep-pagination path (past_due_keyset's expanded-OR
    predicate, pushable into the scan) applied to the FULL parity item
    shape. ``total`` is skipped on cursor pages (None) — the point of
    keyset pagination is O(limit) per page, and the pre-cursor count is
    an O(corpus) aggregation per request (round-12 review); the first
    keyset page (no cursor yet) still carries it. The cursor encodes
    asc (due_date, invoice_number) order, so a desc sort alongside it
    would silently skip rows — rejected HERE, not just at the endpoint
    (second-pass round-12 review: the query layer has non-HTTP
    callers)."""
    if after is not None and not PAST_DUE_SORTS.get(sort, True):
        raise ValueError(
            "past_due: after (keyset cursor) requires ascending due_date "
            "order — the cursor encodes asc (due_date, invoice_number)"
        )
    outstanding = outstanding_expr(F.col("bill_total"), F.col("applied"))
    base = invoices.filter((outstanding > 0) & (F.col("due_date") < F.lit(as_of)))

    # Q1: count on the filtered fact, pre-join (offset mode / first page)
    total = base.count() if after is None else None

    if after is not None:
        base = _keyset_after_filter(base, after)

    ascending = PAST_DUE_SORTS.get(sort, True)  # Q4: unknown -> asc
    order = [
        F.col("due_date").asc() if ascending else F.col("due_date").desc(),
        F.col("invoice_number").asc(),  # Q5: deterministic tie-break
    ]
    dim = F.broadcast(customers.select(F.col("id").alias("customer_id"), F.col("name")))
    items = (
        base.join(dim, "customer_id", "inner")
        .select(
            "invoice_number",
            F.col("name").alias("customer_name"),
            "invoice_date",
            "due_date",
            F.coalesce(F.col("bill_total"), F.lit(0).cast(MONEY_TYPE)).alias("bill_total"),
            F.coalesce(F.col("applied"), F.lit(0).cast(MONEY_TYPE)).alias("applied"),
            "currency",
            "status",
            F.greatest(outstanding, F.lit(0).cast(MONEY_TYPE)).alias("outstanding"),  # Q3
            F.datediff(F.lit(as_of), F.col("due_date")).alias("days_past_due"),
        )
        .orderBy(*order)
        .offset(offset)
        .limit(limit)
    )
    return PastDuePage(items=items, total=total, limit=limit, offset=offset)


def past_due_keyset(
    invoices: DataFrame,
    customers: DataFrame,
    as_of: date,
    after: tuple[date, str] | None = None,
    limit: int = 50,
) -> DataFrame:
    """Keyset-paginated past-due scan ([EXT]; SURVEY §4.2 'deep
    pagination at scale').

    OFFSET n forces the engine to materialize and discard n sorted rows
    per page — O(offset) per request. Keyset pagination filters on the
    last-seen sort key instead: (due_date, invoice_number) >
    (after_due, after_inv), which pushes into the scan and keeps every
    page O(limit). The predicate is the shared `_keyset_after_filter`
    (also the REST route's cursor path).
    """
    outstanding = outstanding_expr(F.col("bill_total"), F.col("applied"))
    base = invoices.filter((outstanding > 0) & (F.col("due_date") < F.lit(as_of)))
    if after is not None:
        base = _keyset_after_filter(base, after)
    dim = F.broadcast(customers.select(F.col("id").alias("customer_id"), F.col("name")))
    return (
        base.join(dim, "customer_id", "inner")
        .select(
            "invoice_number",
            F.col("name").alias("customer_name"),
            "due_date",
            F.greatest(outstanding, F.lit(0).cast(MONEY_TYPE)).alias("outstanding"),
            F.datediff(F.lit(as_of), F.col("due_date")).alias("days_past_due"),
        )
        .orderBy(F.col("due_date").asc(), F.col("invoice_number").asc())
        .limit(limit)
    )


def monthly_summary(
    invoices: DataFrame,
    customers: DataFrame,
    month: str,
    customer_name: str | None = None,
) -> DataFrame:
    """GET /invoices/summary/month (reference app/api/invoices.py:176-233).

    Single-row global aggregate. The inner join to the dim happens even
    without a name filter (reference :218) — a dangling customer_id row
    would be excluded; semantics pinned by oracle test. With the fact
    partitioned by invoice_month, the range filter prunes to one
    partition at any scale.
    """
    first_day, next_month = month_window(month)
    conditions = (F.col("invoice_date") >= F.lit(first_day)) & (
        F.col("invoice_date") < F.lit(next_month)
    )
    dim = F.broadcast(customers.select(F.col("id").alias("customer_id"), F.col("name")))
    joined = invoices.join(dim, "customer_id", "inner").filter(conditions)
    if customer_name is not None:
        joined = joined.filter(F.lower(F.col("name")) == customer_name.lower())  # P6
    zero = F.lit("0").cast(MONEY_TYPE)
    return joined.agg(
        F.lit(month).alias("month"),
        F.coalesce(F.min("currency"), F.lit("USD")).alias("currency"),  # Q2/A4
        F.coalesce(F.sum("bill_total"), zero).cast(MONEY_TYPE).alias("sum_bill_total"),  # A2
        F.count(F.lit(1)).alias("count_invoices"),  # A3
    )


@dataclass
class ContactPage:
    customer_name: str
    contacts: DataFrame
    match_count: int  # drives the 404 (Q7); NOT the response total (Q6)


def customer_contact(
    customers: DataFrame,
    invoices: DataFrame,
    name: str,
    limit: int = 10,
    offset: int = 0,
    after: tuple[str, int] | None = None,
    include_id: bool | None = None,
) -> ContactPage:
    """GET /customers/contact (reference app/api/customers.py:52-119).

    Left-outer join so zero-invoice customers survive with NULL
    last_seen_invoice_date (J2); group on the full customer identity
    (A5). The dim side is filtered to one name first, so at scale the
    join probes a broadcast single-key dim against the fact.

    ``after`` ([EXT], opt-in — round-12 VERDICT #3): keyset cursor
    (name, id) of the LAST group of the previous page. This is the
    reference route with NO upper bound on ``limit``
    (app/api/customers.py:54-56), i.e. the deep-page hazard past_due
    already fixed: OFFSET n materializes and discards n sorted groups
    per request. The cursor is the page's GROUP key — (name, id) is a
    customer-dim identity that the left join / group-by can never
    change — so the expanded-OR predicate applies to the DIM SIDE
    BEFORE the join and prunes the dim scan itself; every page is then
    O(limit) through the fact probe regardless of depth. The page order
    is always asc (name, id), so unlike past_due there is no sort mode
    a cursor could silently contradict. Precondition: ``id`` must be a
    KEY of the customers frame (the ingest builds it as one, PK parity
    with the reference) — with duplicate ids the page's true group key
    is the full contact identity, (name, id) no longer names one group,
    and NO (name, id)-ordered pagination is well-defined there: offset
    pages order duplicate-id twins nondeterministically and a cursor
    boundary between them would skip one. ``include_id`` adds the group's
    ``id`` column to the page (the REST layer needs it to mint
    next_after; the envelope changes with the cursor anyway) — default
    follows ``after``, but the FIRST keyset page has no cursor yet and
    still needs the column, so the endpoint passes it explicitly.
    ``match_count`` (the 404 driver) stays the PRE-cursor name-match
    count on every page: it is a pruned scan of the small dim — a
    different cost class from past_due's O(fact-corpus) total, which is
    why that one is skipped on continuations and this one is not."""
    matched = customers.filter(F.lower(F.col("name")) == name.lower())
    match_count = matched.count()
    if after is not None:
        after_name, after_id = after
        matched = matched.filter(
            (F.col("name") > F.lit(after_name))
            | (
                (F.col("name") == F.lit(after_name))
                & (F.col("id") > F.lit(int(after_id)))
            )
        )

    out_cols = [
        F.col("name").alias("customer_name"),
        F.col("contact_name"),
        F.col("contact_email"),
        F.col("contact_phone"),
        F.col("last_seen_invoice_date"),
    ]
    if include_id if include_id is not None else after is not None:
        out_cols.append(F.col("id"))
    contacts = (
        F.broadcast(matched)
        .join(
            invoices.select(F.col("customer_id").alias("id"), "invoice_date"),
            "id",
            "left",
        )
        .groupBy("id", "name", "contact_name", "contact_email", "contact_phone")
        .agg(F.max("invoice_date").alias("last_seen_invoice_date"))
        .orderBy(F.col("name").asc(), F.col("id").asc())
        .select(*out_cols)
        .offset(offset)
        .limit(limit)
    )
    return ContactPage(customer_name=name, contacts=contacts, match_count=match_count)


def list_customers(customers: DataFrame) -> DataFrame:
    """GET /customers/ (reference app/api/customers.py:19-49): full dim
    scan (S2), ordered by name."""
    return customers.select(
        "id", "name", "contact_name", "contact_phone", "contact_email"
    ).orderBy("name")


def get_invoice(invoices: DataFrame, customers: DataFrame, invoice_number: str) -> DataFrame:
    """GET /invoices/{invoice_number} (reference app/api/invoices.py:141-174):
    exact-key lookup (P7) + dim join for customer_name."""
    dim = F.broadcast(customers.select(F.col("id").alias("customer_id"), F.col("name")))
    return (
        invoices.filter(F.col("invoice_number") == F.lit(invoice_number))
        .join(dim, "customer_id", "inner")
        .select(
            "id",
            "invoice_number",
            "customer_id",
            F.col("name").alias("customer_name"),
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
    )


def get_customer(customers: DataFrame, customer_id: int) -> DataFrame:
    """GET /customers/{customer_id} (reference app/api/customers.py:122-152)."""
    return customers.filter(F.col("id") == F.lit(customer_id)).select(
        "id", "name", "contact_name", "contact_phone", "contact_email"
    )
