"""Response serialization matching the reference's Pydantic output
shapes (Q12): Decimals render as strings with exactly 2 dp, dates as
ISO YYYY-MM-DD (examples /root/reference/SOLUTION.md:111-143)."""

from __future__ import annotations

import datetime as dt
import decimal
from typing import Any

TWO_DP = decimal.Decimal("0.01")


def json_value(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return str(v.quantize(TWO_DP))
    if isinstance(v, dt.datetime):
        return v.date().isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def row_to_dict(row, fields: tuple[str, ...]) -> dict[str, Any]:
    return {f: json_value(row[f]) for f in fields}
