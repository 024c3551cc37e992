"""Skew mitigation: explicit key salting ([EXT] scale utility).

AQE's runtime skew-join splitting (enabled in session.py) handles most
skew transparently; explicit salting is the deterministic fallback for
the cases AQE can't fix:

  - a join where ONE key holds a double-digit percent of the rows (AQE
    splits a skewed partition, but a single giant key still lands in
    one task on the build side),
  - aggregations whose per-key state doesn't shrink map-side
    (collect_list/collect_set, exact distinct), where a hot key
    concentrates state in one task.

Salts are derived from xxhash64 of row content, never from rand() —
plans stay deterministic and re-runnable (same input => same partition
layout, a property the oracle harness relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side's hot keys are spread over
    ``num_salts`` sub-keys; the small side is replicated once per salt.

    Result is row-identical to ``big.join(small, on, how)`` — salting
    only changes the shuffle layout. Cost: small side is shuffled
    ``num_salts``x (it must be the genuinely-small side). The salt is
    xxhash64 of the big row's full content, so two identical rows share
    a salt — harmless (dedup semantics are unaffected; only balance of
    a pathological all-duplicate key degrades).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must not need null-extension)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    big_s = big.withColumn(SALT_COL, salt)
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, [*on, SALT_COL], how).drop(SALT_COL)


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_salts: int = 32,
) -> DataFrame:
    """Two-stage collect_set that survives hot keys: stage 1 collects
    per (key, salt) — spreading a hot key's state over ``num_salts``
    tasks — stage 2 flattens + dedups the per-salt sets.

    (Plain sum/count/min/max do NOT need this: Spark's hash aggregate
    already combines them map-side. Salting matters when per-key state
    grows with row count, as with collect_set/collect_list.)
    Output: key_cols + ``values`` (sorted array — deterministic).
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_salts))
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*key_cols, SALT_COL)
        .agg(F.collect_set(value_col).alias("_vs"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_vs")))
            ).alias("values")
        )
    )


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_salts: int = 32,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without concentrating a hot
    key in one task: partial distinct per (key, salt) — each distinct
    value lands in exactly one salt (salt = hash(value)), so the final
    stage just sums partial cardinalities. Two balanced shuffles instead
    of one skewed one.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_salts))
    partial = (
        df.withColumn(SALT_COL, salt)
        .select(*key_cols, SALT_COL, value_col)
        .distinct()
        .groupBy(*key_cols, SALT_COL)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").cast("bigint").alias(f"n_distinct_{value_col}")
    )
