"""Endpoint-core tests: golden JSON replay from the reference's
documented examples (/root/reference/SOLUTION.md:103-223) plus error
quirks Q4-Q7."""

from __future__ import annotations

from datetime import date

import pytest

from accounts_receivable_data_pipeline_api_spark.api.endpoints import ApiError, Endpoints


@pytest.fixture(scope="module")
def api(spark) -> Endpoints:
    return Endpoints.from_csv(spark)


def test_health(api):
    assert api.health() == {"status": "ok"}


def test_golden_past_due_page(api):
    resp = api.past_due(as_of=date(2025, 3, 1), limit=5, offset=0, sort="due_date.asc")
    assert resp["total"] == 28
    assert resp["limit"] == 5 and resp["offset"] == 0
    assert len(resp["items"]) == 5
    # First two items, byte-for-byte vs SOLUTION.md:113-136.
    assert resp["items"][0] == {
        "invoice_number": "DF2014658",
        "customer_name": "LogicNest",
        "invoice_date": "2024-03-11",
        "due_date": "2024-04-10",
        "bill_total": "9400.00",
        "applied": "7138.90",
        "outstanding": "2261.10",
        "currency": "USD",
        "status": "Pending",
        "days_past_due": 325,
    }
    assert resp["items"][1]["applied"] == "417.75"
    assert resp["items"][1]["outstanding"] == "782.25"


def test_past_due_keyset_cursor_walk(api):
    """[EXT] keyset pagination on the endpoint core (round-11 VERDICT
    #6): walking the cursor yields exactly the offset-paginated
    sequence (same items, same order — the cursor is a window move,
    never a reorder), terminates with next_after=None, and the cursor
    mode is strict: desc sort or a nonzero offset alongside ``after``
    is 422, as is a malformed cursor."""
    as_of = date(2025, 3, 1)
    # ground truth: one big offset page (28 past-due rows total)
    full = api.past_due(as_of=as_of, limit=200, offset=0)["items"]
    assert len(full) == 28

    walked: list[dict] = []
    resp = api.past_due(as_of=as_of, limit=10, after="")  # first page
    assert resp["total"] == 28  # first cursor page still carries Q1 total
    while True:
        assert "offset" not in resp and "next_after" in resp
        walked.extend(resp["items"])
        if resp["next_after"] is None:
            break
        assert len(resp["items"]) == 10  # only full pages carry a cursor
        resp = api.past_due(as_of=as_of, limit=10, after=resp["next_after"])
        # continuation pages skip the O(corpus) pre-cursor count
        assert resp["total"] is None
    assert walked == full

    # a cursor past the last row: empty page, clean termination
    last = full[-1]
    tail = api.past_due(
        as_of=as_of, limit=10, after=f"{last['due_date']},{last['invoice_number']}"
    )
    assert tail["items"] == [] and tail["next_after"] is None

    for bad_kwargs in (
        {"after": "", "sort": "due_date.desc"},
        {"after": "", "offset": 5},
        {"after": "not-a-cursor"},
        {"after": "2024-13-01,INV"},
        {"after": "2024-04-10"},  # missing invoice_number half
    ):
        with pytest.raises(ApiError) as err:
            api.past_due(as_of=as_of, limit=10, **bad_kwargs)
        assert err.value.status_code == 422, bad_kwargs

    # the asc-cursor invariant is enforced in the QUERY layer too, not
    # just the HTTP 422 path — non-HTTP callers (exports, notebooks)
    # would otherwise silently skip rows under a desc sort
    from accounts_receivable_data_pipeline_api_spark.ar import queries as arq

    with pytest.raises(ValueError, match="keyset cursor"):
        arq.past_due(
            api.invoices, api.customers, as_of,
            sort="due_date.desc", after=(date(2024, 4, 10), "X"),
        )


def test_golden_monthly_summary(api):
    assert api.monthly_summary("2024-11") == {
        "month": "2024-11",
        "currency": "USD",
        "sum_bill_total": "318565.14",
        "count_invoices": 143,
    }


def test_golden_monthly_summary_filtered(api):
    assert api.monthly_summary("2024-11", customer_name="Lens & Light") == {
        "month": "2024-11",
        "currency": "USD",
        "sum_bill_total": "4550.00",
        "count_invoices": 2,
    }


def test_golden_customer_contact(api):
    assert api.customer_contact("Lens & Light") == {
        "customer_name": "Lens & Light",
        "contacts": [
            {
                "contact_name": "Angela Scott",
                "contact_email": "angela@lensandlight.com",
                "contact_phone": "555-513-2964",
                "last_seen_invoice_date": "2025-01-27",
            }
        ],
        "total": 1,
    }


def test_contact_keyset_cursor(api, spark):
    """[EXT] keyset pagination on /customers/contact (round-12 VERDICT
    #3 — the reference route with NO upper bound on limit, the
    deep-page hazard past_due already fixed). Endpoint core: presence
    of ``after`` switches the envelope to carry next_after (total stays
    the Q6 page length), a full last page terminates on the NEXT
    request with an empty page and next_after=None, 404 still fires on
    a continuation for an unknown name, and misuse (after+offset,
    malformed cursor) is 422. Query layer: over a dim where one
    lowercased name matches MANY (name, id) groups — the case the
    cursor exists for — walking it item-for-item equals offset paging
    (the cursor is a window move, never a reorder)."""
    # endpoint core against the real CSV: unique names -> one group;
    # limit=1 makes that a FULL page, so the walk exercises both the
    # cursor mint and the O(1) empty-page termination
    first = api.customer_contact("Lens & Light", limit=1, after="")
    assert first["total"] == 1 and "next_after" in first
    assert first["contacts"] == api.customer_contact("Lens & Light")["contacts"]
    assert first["next_after"] is not None
    tail = api.customer_contact("Lens & Light", limit=1, after=first["next_after"])
    assert tail["contacts"] == [] and tail["next_after"] is None
    # the terminal empty page keeps the dim's CANONICAL casing even
    # when the (case-insensitive) query used different casing — the
    # envelope field must not flip value mid-walk (third-pass review)
    lc = api.customer_contact("lens & light", limit=1, after="")
    lc_tail = api.customer_contact("lens & light", limit=1, after=lc["next_after"])
    assert lc["customer_name"] == lc_tail["customer_name"] == "Lens & Light"
    with pytest.raises(ApiError) as err:
        api.customer_contact("No Such Co", limit=1, after=first["next_after"])
    assert err.value.status_code == 404
    for bad in (
        {"after": "", "offset": 5},
        {"after": "not-a-cursor"},
        {"after": "12"},  # no separator at all
        {"after": "x,Name"},  # non-integer id
    ):
        with pytest.raises(ApiError) as err:
            api.customer_contact("Lens & Light", **bad)
        assert err.value.status_code == 422
    # the terminal-page echo is GATED (round-14 review): the cursor is
    # client input, so only a case variant of the query's own name is
    # reflected back as customer_name — a forged cross-customer cursor
    # gets the query string, never its own text (and no 422: rejecting
    # would need the dim's exact lower() semantics; a Unicode-casing
    # skew on a legitimate cursor would then break the walk for good)
    forged = api.customer_contact(
        "Lens & Light", limit=1, after="5,Some Other Co"
    )
    assert forged["customer_name"] == "Lens & Light"
    assert "Some Other Co" not in str(forged)
    # an EMPTY name half is legal for the customer it belongs to (a
    # dim row whose name IS the empty string mints "<id>,"; round-13
    # ADVICE — the old parse 422-ed it and such a walk could never
    # continue past a full page ending on that row): full end-to-end
    # walk over a synthetic dim with an empty-name customer
    from accounts_receivable_data_pipeline_api_spark.api.endpoints import Endpoints

    dim2 = spark.createDataFrame(
        [(1, "", "c1", "c1@x.com", "555-0001"),
         (2, "", "c2", "c2@x.com", "555-0002"),
         (3, "Zed", "c3", "c3@x.com", "555-0003")],
        "id long, name string, contact_name string, contact_email string, contact_phone string",
    )
    api2 = Endpoints(spark, dim2, api.invoices.limit(0))
    p1 = api2.customer_contact("", limit=1, after="")
    assert p1["next_after"] == "1,"
    p2 = api2.customer_contact("", limit=1, after=p1["next_after"])
    assert [c["contact_name"] for c in p2["contacts"]] == ["c2"]
    p3 = api2.customer_contact("", limit=1, after=p2["next_after"])
    assert p3["contacts"] == [] and p3["next_after"] is None
    assert p3["customer_name"] == ""  # the cursor's own (empty) name

    # query layer, multi-group walk: 23 case-variant groups of one
    # lowercased name, names containing commas (the reason the wire
    # cursor is id-first), walked at limit=4 vs offset pages
    from accounts_receivable_data_pipeline_api_spark.ar import queries as q

    rows = [
        (i, f"Acme, Inc {'x' * (i % 3)}".upper() if i % 2 else f"Acme, Inc {'x' * (i % 3)}",
         f"c{i}", f"c{i}@x.com", f"555-{i:04d}")
        for i in range(23)
    ]
    dim = spark.createDataFrame(
        rows, "id long, name string, contact_name string, contact_email string, contact_phone string"
    )
    # two lowercase name classes; pick one ("acme, inc x")
    inv = api.invoices.limit(0)  # zero-invoice customers: left join survives
    target = "ACME, INC X".lower()
    offset_walk, off = [], 0
    while True:
        page = q.customer_contact(dim, inv, target, limit=4, offset=off).contacts.collect()
        if not page:
            break
        offset_walk += [tuple(r)[:5] for r in page]
        off += 4
    cursor_walk, cur = [], None
    while True:
        page = q.customer_contact(dim, inv, target, limit=4, after=cur or ("", -1)).contacts.collect()
        if not page:
            break
        cursor_walk += [tuple(r)[:5] for r in page]
        cur = (page[-1]["customer_name"], page[-1]["id"])
    assert offset_walk and cursor_walk == offset_walk


def test_bad_month_is_400(api):
    with pytest.raises(ApiError) as err:
        api.monthly_summary("2024-13-01")
    assert err.value.status_code == 400


def test_unknown_customer_is_404(api):
    with pytest.raises(ApiError) as err:
        api.customer_contact("No Such Co")
    assert err.value.status_code == 404


def test_unknown_invoice_is_404(api):
    with pytest.raises(ApiError) as err:
        api.get_invoice("NOPE-123")
    assert err.value.status_code == 404


def test_unknown_customer_id_is_404(api):
    with pytest.raises(ApiError) as err:
        api.get_customer(10_000_000)
    assert err.value.status_code == 404


def test_limit_bounds(api):
    with pytest.raises(ApiError):
        api.past_due(as_of=date(2025, 3, 1), limit=500)
    # /customers/contact has NO upper bound on limit (reference parity)
    resp = api.customer_contact("Lens & Light", limit=100000)
    assert resp["total"] == 1


def test_list_customers(api):
    rows = api.list_customers()
    assert len(rows) == 135
    names = [r["name"] for r in rows]
    assert names == sorted(names)


def test_invoice_lookup_roundtrip(api):
    inv = api.get_invoice("DF2024988")
    assert inv["customer_name"] == "Lens & Light"
    assert inv["bill_total"] == "3150.00"
    assert inv["invoice_date"] == "2024-11-19"
    cust = api.get_customer(inv["customer_id"])
    assert cust["name"] == "Lens & Light"
