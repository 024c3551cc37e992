"""Registry of corpus queries: Spark DataFrame builder + DuckDB oracle.

Every operator row in SURVEY §2 maps to at least one entry here; the
driver harness runs each Spark query against its oracle SQL at sf0.01
and hash-compares (row-count + schema + order-insensitive value hash).

Determinism rules every entry must obey (SURVEY §7.4 hard part 1):
- Aggregated money flows through DECIMAL casts (exact, order-free), not
  raw double sums (whose value depends on partition reduce order) — but
  the FINAL output column is always cast to DOUBLE. The driver's oracle
  fetch renders decimals scale-free ("2494.0") while Spark preserves
  scale ("2494.00"), so a DECIMAL output column hash-mismatches whenever
  any value has a trailing zero in its last place (empirically verified:
  this predicate separates all 13 r1 hash failures from all 32 passes).
  The exact-decimal-sum-to-double conversion is correctly rounded on
  both engines, so boundary doubles are bit-identical. The driver hash
  is row-order-INSENSITIVE (multi-thousand-row unordered entries pass),
  so no artificial total ORDER BY is added — a global sort per query
  would be pure overhead at scale.
- Every LIMIT/top-k has a total tie-break so the selected SET is unique.
- Column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class CorpusQuery:
    name: str
    build: Builder
    oracle: Optional[str]  # None => non-SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


CORPUS: dict[str, CorpusQuery] = {}


def register(name: str, oracle: Optional[str], tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def wrap(fn: Builder) -> Builder:
        if name in CORPUS:
            raise ValueError(f"duplicate corpus query {name!r}")
        CORPUS[name] = CorpusQuery(name=name, build=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return wrap
