"""Benchmark harness: headline corpus queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "queries_warm": {...}, "sf": ...}

``queries``/``value``: cold wall time = plan build + whole-stage-codegen
compile + execution + collect (session startup excluded). ``queries_warm``:
steady-state re-execution of the same prepared plan — the resident-engine
serving latency (codegen JIT amortized), which is what the reference's
in-process SQLite latency corresponds to. At sf0.1 the cold numbers are
dominated by the fixed ~1s/query janino compile; the warm numbers show
the actual data-path cost that scales with SF. Warm is the MEDIAN of 3
re-executions (round-2 VERDICT #4): single-run warm values under ~0.2 s
showed ~2x run-to-run scheduler variance, which made round-over-round
deltas unreadable; the median absorbs one-off GC/scheduler spikes
without hiding a real slowdown.
"""

from __future__ import annotations

import json
import os
import statistics
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
    "dedup_embedding_lsh",
    "similarity_brute_topk",
    "text_quality",
    "text_tfidf_topk",
    "multimodal_pipeline",
    "curation_pack_batches",
    "window_sessionize",
    "window_frames",
)


def main() -> None:
    spark = get_spark("accounts-receivable-data-pipeline-api-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths with a trivial action, and the parquet
    # reader/footer machinery with the smallest table (startup cost, not
    # query cost — otherwise it lands entirely on the first query).
    spark.range(1000).count()
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    load_table(spark, SF_DIR, "region").count()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        cq = CORPUS[name]
        t0 = time.perf_counter()
        df = cq.build(spark, SF_DIR)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(3):
            # Rebuild the DataFrame per sample: re-collect()ing the SAME
            # plan instance lets AQE reuse its already-materialized
            # shuffle stages, which fakes multi-stage queries down to
            # the final stage only (measured 23s of real data path
            # reported as 0.02s). A fresh build re-executes the full
            # data path while the janino codegen cache keeps compile
            # cost out — the honest steady-state serving latency.
            fresh = cq.build(spark, SF_DIR)
            t0 = time.perf_counter()
            fresh.collect()
            samples.append(time.perf_counter() - t0)
        warm[name] = round(statistics.median(samples), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
