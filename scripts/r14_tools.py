"""Round-14 optimization tooling (guide §1): capture .explain("formatted")
for bench HEADLINE queries + corpus entries, and time a single query in
isolation with the noop sink so the computation is measured, not the
collect/serialize path.

Usage:
  python scripts/r14_tools.py plans [out_dir] [name ...]   # default plans/r14
  python scripts/r14_tools.py time <name> [runs]           # noop-sink timing
  python scripts/r14_tools.py timec <name> [runs]          # collect() timing
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accounts_receivable_data_pipeline_api_spark.plans import CORPUS
from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import RAW_OPS
from accounts_receivable_data_pipeline_api_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _builder(name: str):
    if name in RAW_OPS:
        fn, _ = RAW_OPS[name]
        return lambda spark: fn(spark, SF_DIR)
    return lambda spark: CORPUS[name].build(spark, SF_DIR)


def capture_plans(out_dir: str, names: list[str]) -> None:
    from bench import HEADLINE, VERIFICATION

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r14-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    targets = names or list(HEADLINE) + list(VERIFICATION)
    for name in targets:
        df = _builder(name)(spark)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


def time_query(name: str, runs: int, action: str) -> None:
    spark = get_spark("r14-timer")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    load_table(spark, SF_DIR, "region").count()
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, schema="id long").count()
    build = _builder(name)
    samples = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        df = build(spark)
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        dt = time.perf_counter() - t0
        samples.append(dt)
        print(f"{name} run {i}: {dt:.3f}s")
    samples.sort()
    print(
        f"{name} [{action}] min={samples[0]:.3f} "
        f"median={samples[len(samples) // 2]:.3f} over {runs} runs"
    )
    spark.stop()


def time_many(names: list[str], runs: int, action: str) -> None:
    spark = get_spark("r14-timer")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    load_table(spark, SF_DIR, "region").count()
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, schema="id long").count()
    for name in names:
        build = _builder(name)
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = build(spark)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        print(
            f"RESULT {name} min={samples[0]:.3f} med={samples[len(samples) // 2]:.3f}"
            f" all={[round(s, 2) for s in samples]}"
        )
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        out = sys.argv[2] if len(sys.argv) > 2 else "plans/r14"
        capture_plans(out, sys.argv[3:])
    elif cmd == "timeall":
        time_many(sys.argv[3].split(","), int(sys.argv[2]), "collect")
    elif cmd in ("time", "timec"):
        time_query(
            sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 5,
            "noop" if cmd == "time" else "collect",
        )
    else:
        raise SystemExit(f"unknown command {cmd}")
