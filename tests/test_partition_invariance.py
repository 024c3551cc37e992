"""Partition-layout invariance: every corpus query must produce the
IDENTICAL result when the input arrives with a different partitioning
and a different shuffle-partition count — the property that makes the
engine's answers stable on a 1000-executor cluster (SURVEY §7.4 hard
part 1: no result may depend on partition reduce order or row arrival
order)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


# A slice of the corpus chosen to cover the riskiest shapes: decimal
# aggs (reduce order), window tie-breaks, top-k selection, float math,
# Arrow kernels.
QUERIES = (
    "tpch_q1_pricing_summary",
    "ar_past_due_page",
    "ar_first_seen",
    "window_topk_per_customer",
    "dedup_exact_groups",
    "similarity_brute_topk",
    "agg_percentiles",
    "window_sessionize",
    # rows-only (non-oracled) entries: partition-invariance is their
    # only cross-layout value check
    "dedup_minhash_lsh",
    "similarity_ivf_topk",
    "dedup_components_lsh",
    # sharded prefix-sum packing: per-shard windows must not leak layout
    "curation_pack_batches",
)


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_is_partition_invariant(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    base = _rows(fn(spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again
