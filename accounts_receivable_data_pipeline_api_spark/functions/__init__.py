from .cleaning import (
    money,
    nullif_blank,
    outstanding_expr,
    parse_mdy_date,
    terms_days_expr,
)

__all__ = [
    "money",
    "nullif_blank",
    "outstanding_expr",
    "parse_mdy_date",
    "terms_days_expr",
]
