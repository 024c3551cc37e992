"""Benchmark harness: headline corpus queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Query wall time = plan build + execution + collect to driver (session
startup excluded — a resident engine amortizes it, matching how the
reference keeps SQLite in-process).
"""

from __future__ import annotations

import json
import os
import time

from accounts_receivable_data_pipeline_api_spark.plans import CORPUS
from accounts_receivable_data_pipeline_api_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the scan/shuffle/join-heavy queries that dominate at
# scale, plus one from each [EXT] operator family.
HEADLINE = (
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_nation_revenue",
    "ar_monthly_rollup",
    "ar_customer_contact",
    "ar_upsert_last_wins",
    "window_topk_per_customer",
    "agg_cube_status_priority",
    "events_hourly_windows",
    "json_props_extract",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "similarity_brute_topk",
    "text_stats",
)


def main() -> None:
    spark = get_spark("accounts-receivable-data-pipeline-api-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths with a trivial action.
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        cq = CORPUS[name]
        t0 = time.perf_counter()
        cq.build(spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
