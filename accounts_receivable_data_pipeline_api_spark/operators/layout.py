"""Multi-dimensional data layout: z-order (Morton) keys for file-level
skipping ([EXT] north star — the Delta/Iceberg OPTIMIZE ZORDER BY
story, built portably).

A table range-partitioned and sorted by ONE column prunes scans on
that column only; a query filtering the OTHER dimension reads every
file. Interleaving the bits of N dimensions into one Morton key makes
each file's bounding box a near-hypercube, so parquet min/max file
stats prune range queries on ANY participating dimension — the layout
tool a 100 TB table needs when two or three predicates matter
(user x time, key x date, lat x lon).

The key is PURE INTEGER bit arithmetic emitted as ONE SQL expression
string (zorder_sql) that parses identically in Spark SQL and DuckDB
(both support >>, &, | and integer literals), so the exact same
formula is the operator AND its oracle — the strongest cross-engine
contract in the repo: not two formulations that agree, one text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Max total interleaved bits — the key must stay inside a signed
#: 64-bit BIGINT in both engines.
_MAX_TOTAL_BITS = 62


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The shared Morton-interleave expression: bit b of column i
    lands at output position b * n_cols + i. Works verbatim as a
    Spark SQL projection and a DuckDB SELECT expression."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > _MAX_TOTAL_BITS:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits "
            f"exceeds the {_MAX_TOTAL_BITS}-bit BIGINT budget"
        )
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton key column with in-plan range guards: every input must
    be a non-negative integer below 2^bits — a silently truncated
    coordinate would place rows in the WRONG spatial cell and break
    the pruning contract, so out-of-range values raise at execution
    (the hll_m guard policy), never wrap."""
    lim = 1 << bits
    guard = None
    for c in cols:
        bad = (F.col(c) < 0) | (F.col(c) >= lim) | F.col(c).isNull()
        guard = bad if guard is None else (guard | bad)
    return (
        F.when(
            guard,
            F.raise_error(
                F.lit(
                    f"zorder_key: input outside [0, {lim}) for bits={bits} "
                    f"over columns {cols} — rescale or widen bits"
                )
            ).cast("long"),
        )
        .otherwise(F.expr(zorder_sql(cols, bits)).cast("long"))
        .alias("z_key")
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, n_files: int = 16
) -> DataFrame:
    """The write-side layout: stamp the Morton key, range-partition on
    it (one sampled RangePartitioning exchange — the same machinery as
    a global sort, but only ever into n_files buckets), and sort
    within partitions so parquet row groups carry tight z-ranges.
    Write the result with .write.parquet(...); each output file's
    min/max stats then bound a near-square region of the key space,
    which is what makes ANY-dimension range predicates skip files
    (demonstrated quantitatively in test_operators.py:
    test_zorder_locality_beats_linear_layout)."""
    keyed = df.withColumn("z_key", zorder_key(cols, bits))
    return keyed.repartitionByRange(n_files, "z_key").sortWithinPartitions("z_key")
