"""Scale probe: run headline queries at every available SF and report
throughput (input rows/sec, warm plan) — evidence that the data-path
cost scales linearly with input size, i.e. no operator hides an
accidental O(n^2) or a driver-side loop.

Usage: python scripts/scale_probe.py
Prints one JSON line per (query, sf).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accounts_receivable_data_pipeline_api_spark.plans import CORPUS  # noqa: E402
from accounts_receivable_data_pipeline_api_spark.session import get_spark  # noqa: E402
from accounts_receivable_data_pipeline_api_spark.sources.star import load_table  # noqa: E402

SFS = tuple(
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        # synthesized by scripts/make_scaled_data.py (10x key-shifted sf0.1)
        "/tmp/sf1",
    )
    if os.path.isdir(d)
)

# query -> table whose row count defines "input rows"
PROBES = {
    "tpch_q1_pricing_summary": "lineitem",
    "ar_monthly_rollup": "orders",
    "dedup_exact_groups": "documents",
    "text_quality": "documents",
    "events_hourly_windows": "events",
    "window_sessionize": "events",
}


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name, table in PROBES.items():
        for sf_dir in SFS:
            n = load_table(spark, sf_dir, table).count()
            df = CORPUS[name].build(spark, sf_dir)
            df.collect()  # warm: compile once
            t0 = time.perf_counter()
            df.collect()
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf": sf_dir.rsplit("sf", 1)[-1],
                        "input_rows": n,
                        "warm_sec": round(dt, 4),
                        "rows_per_sec": int(n / dt) if dt > 0 else None,
                    }
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
