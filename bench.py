"""Benchmark harness: headline corpus queries + RAW scale-path
operators at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "queries_warm": {...},
   "verification": {...}, "verification_warm": {...}, "sf": ...}

``queries``/``value``: cold wall time = plan build + whole-stage-codegen
compile + execution + collect (session startup excluded). ``queries_warm``:
steady-state re-execution, median of 3 FRESH-PLAN rebuild+collect cycles —
the resident-engine serving latency (janino cache keeps compile out;
re-collect()ing the same plan instance would let AQE reuse materialized
shuffle stages and under-report multi-stage queries by up to ~100x).
Since round 10 the warm timer wraps build() too, so operators that
materialize eagerly inside their builder (iterative checkpointing) are
charged their real data path (round-9 VERDICT #2) — r10+ warm values are
therefore not comparable to r09-and-earlier warm values for those ops.

Cold times are the per-query MIN over SPARK_GRAFT_BENCH_RUNS passes
(default 2), each in a FRESH subprocess so the janino/codegen caches are
genuinely cold every time — the same min-of-two methodology as
BENCH_ANCHOR.json, so round-over-round diffs of BENCH_rN.json no longer
read single-run scheduler noise (~15-20% at this query count) as
regression (round-7 VERDICT #3). The second pass is cold-only (warm
medians already suppress noise); set SPARK_GRAFT_BENCH_RUNS=1 to get the
old single-pass behavior (the in-suite regression gate does — it has its
own re-run logic).

Round-4 restructure (round-3 VERDICT #1): the hash-family corpus
entries (dedup_minhash_lsh, dedup_embedding_lsh, similarity_*_topk)
bundle exact-twin verification fixtures that are O(n^2) BY DESIGN, so
timing them measures the oracle fixture, not the operator — the
round-3 dedup_minhash_lsh entry alone was 31% of the warm suite. The
HEADLINE now times the RAW operators (plans/raw_ops.py — the plans
that actually run at 100 TB) and the fixture-bundled entries move to a
separate ``verification`` section (cold + one warm rebuild), excluded
from ``value`` and from the regression gate's per-query bars.
"""

from __future__ import annotations

import json
import os
import statistics
import time

from accounts_receivable_data_pipeline_api_spark.plans import CORPUS, DRIVER_WINDOW
from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import RAW_OPS
from accounts_receivable_data_pipeline_api_spark.session import get_spark

# Unconditional twin of the package-level corpus-window assert — the
# SPARK_GRAFT_CORPUS_WIP escape hatch must never relax a bench run.
# A real `raise`, not `assert`: asserts vanish under python -O.
if len(CORPUS) != DRIVER_WINDOW:
    raise RuntimeError(
        f"bench requires exactly {DRIVER_WINDOW} corpus entries; found {len(CORPUS)}"
    )

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line.

    Round-14 postmortem: a hypervisor stealing 20-93% CPU in bursts
    voided every absolute number that round, and proving it took
    after-the-fact forensics. Sampling steal around each query puts the
    noise context IN the bench record (round-14 VERDICT next-round #1b).
    Measurement context only — no timing behavior changes. Returns
    (0, 0) when /proc/stat is unreadable (non-Linux), which renders as
    0.0% steal.
    """
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dtotal = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dtotal, 2) if dtotal > 0 else 0.0

# Headline set: the scan/shuffle/join-heavy corpus queries that dominate
# at scale, one from each [EXT] operator family, plus the raw dedup/ANN
# operators (op_* from plans/raw_ops.py).
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
    "op_minhash_lsh_pairs",
    "op_embedding_lsh_pairs",
    "op_lsh_topk",
    "op_ivf_topk",
    "op_text_repetition",
    "op_decontaminate",
    "op_lm_score",
    "op_bloom_decontaminate",
    "op_incremental_exact",
    "op_semantic_prune",
    "op_bpe_apply",
    "curation_mixture_shards",
    "embed_kmeans",
    "dedup_canonical",
    "similarity_brute_topk",
    "text_quality",
    "text_tfidf_topk",
    "op_media_decode",
    "curation_pack_batches",
    "window_sessionize",
    "window_frames",
    "op_funnel",
    "op_retention",
    "op_bm25_topk",
    "op_winnow_pairs",
    "op_hll_distinct",
    "op_span_excise",
    "op_hdr_quantiles",
    "op_pagerank",
    "op_triangles",
    "op_edit_pairs",
    "op_rrf_fuse",
    "op_kmv_overlap",
    "op_substr_search",
    "op_zorder_layout",
    "op_collocations",
    "op_kcore",
    "op_ivf_sq8_topk",
    "op_ivf_pq_topk",
    "op_priority_sample",
    "op_mg_heavy",
    "op_hll_rollup",
)

# Invariant-summary entries whose in-entry exact twins are O(n^2) oracle
# fixtures: timed for drift awareness, never part of the headline value.
VERIFICATION = (
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "dedup_simhash_pairs",
    "similarity_ann_topk",
    # round-5 entries that bundle exact-twin audit columns next to the
    # operator output (the raw operators are in HEADLINE as op_*)
    "multimodal_pipeline",
    "text_bloom_decontaminate",
    "dedup_incremental",
    "dedup_semantic",
)


def _builder(name: str):
    if name in RAW_OPS:
        fn, _ = RAW_OPS[name]
        return lambda spark: fn(spark, SF_DIR)
    return lambda spark: CORPUS[name].build(spark, SF_DIR)


def _measure(cold_only: bool = False) -> dict:
    """One measurement pass in THIS process: cold per-query times, plus
    (unless cold_only) the warm medians and verification section."""
    spark = get_spark("accounts-receivable-data-pipeline-api-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths with a trivial action, and the parquet
    # reader/footer machinery with the smallest table (startup cost, not
    # query cost — otherwise it lands entirely on the first query).
    spark.range(1000).count()
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    load_table(spark, SF_DIR, "region").count()
    # Spawn the Python worker pool before timing: the first mapInPandas
    # stage otherwise pays ~10 s of fork + numpy/pandas import across 32
    # workers inside whichever query hits it first (startup cost, not
    # query cost — the same accounting as the JVM/codegen warmup above).
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    suite_ticks0 = _cpu_ticks()
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    steal: dict[str, float] = {}
    for name in HEADLINE:
        build = _builder(name)
        ticks0 = _cpu_ticks()
        t0 = time.perf_counter()
        build(spark).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        if cold_only:
            steal[name] = _steal_pct(ticks0, _cpu_ticks())
            continue
        samples = []
        for _ in range(3):
            # Time BUILD + collect: operators with eager materialization
            # inside the builder (pagerank/components run localCheckpoint
            # actions per iteration) do their real work in build(), so a
            # collect-only timer measures a checkpoint READ, not the
            # operator (round-9 VERDICT #2 — op_pagerank "warm" was
            # 0.027 s against a 0.9 s data path). For lazy builders the
            # extra cost is plan construction (~ms), part of serving
            # latency anyway.
            t0 = time.perf_counter()
            build(spark).collect()
            samples.append(time.perf_counter() - t0)
        warm[name] = round(statistics.median(samples), 3)
        # One steal sample spanning this query's cold + warm window.
        steal[name] = _steal_pct(ticks0, _cpu_ticks())

    verification: dict[str, float] = {}
    verification_warm: dict[str, float] = {}
    if not cold_only:
        for name in VERIFICATION:
            build = _builder(name)
            t0 = time.perf_counter()
            build(spark).collect()
            verification[name] = round(time.perf_counter() - t0, 3)
            fresh = build(spark)
            t0 = time.perf_counter()
            fresh.collect()
            verification_warm[name] = round(time.perf_counter() - t0, 3)

    spark.stop()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "verification": verification,
        "verification_warm": verification_warm,
        "sf": sf,
        # Host-noise context (round-14 VERDICT #1b): hypervisor CPU steal
        # as a percentage of all-cpu jiffies, per query window and for
        # the whole pass. >1-2% sustained means absolute seconds in this
        # record are contaminated; ~0% means they are trustworthy.
        "steal_pct": steal,
        "steal_pct_suite": _steal_pct(suite_ticks0, _cpu_ticks()),
    }


def _child_record(cold_only: bool) -> dict:
    """Run one pass in a fresh subprocess (genuinely cold JVM/codegen
    caches) and parse its record off the last stdout line."""
    import subprocess
    import sys

    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_CHILD="cold" if cold_only else "full",
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True,
        text=True,
        env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench child pass failed: {out.stderr[-2000:]}")
    # The record is the last JSON-object line, but py4j/JVM shutdown can
    # emit trailing stdout noise after spark.stop() — scan backwards for
    # the first line that parses to a dict carrying the expected key.
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "metric" in rec:
            return rec
    raise RuntimeError(
        "bench child pass produced no parseable record line; stdout tail: "
        + out.stdout[-2000:]
    )


def main() -> None:
    child = os.environ.get("SPARK_GRAFT_BENCH_CHILD")
    if child:
        print(json.dumps(_measure(cold_only=child == "cold")))
        return

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    if runs <= 1:
        record = _measure()
    else:
        record = _child_record(cold_only=False)
        # Suite-level steal per pass (the per-query steal_pct dict stays
        # the full pass's — attributing a merged min to the right pass's
        # steal window isn't worth the bookkeeping; the pass-level list
        # is what separates a noisy run from a clean one).
        steal_runs = [record.get("steal_pct_suite", 0.0)]
        for _ in range(runs - 1):
            extra = _child_record(cold_only=True)
            steal_runs.append(extra.get("steal_pct_suite", 0.0))
            record["queries"] = {
                k: min(v, extra["queries"].get(k, v))
                for k, v in record["queries"].items()
            }
        record["value"] = round(sum(record["queries"].values()), 3)
        record["cold_runs"] = runs
        record["steal_pct_runs"] = steal_runs

    timings = record["queries"]
    warm = record["queries_warm"]
    sf = record["sf"]
    # Full record first, for humans and for the anchor-refresh workflow.
    print(json.dumps(record))
    # The driver captures only the LAST ~2000 chars of stdout; the full
    # record above outgrew that window in round 5 ("parsed": null in
    # BENCH_r05.json), cutting off the suite total. Emit a compact
    # summary as the FINAL line — suite total + per-query warm at 2 dp —
    # and degrade to the slowest-N queries if it would ever exceed the
    # window.
    # ``value`` is the COLD suite total (same number as the full record);
    # the per-query dict is explicitly named ``queries_warm`` — round 10
    # shipped it as ``queries``, which read as cold values in
    # BENCH_rN.json's parsed record (round-10 VERDICT #1).
    compact_warm = {k: round(v, 2) for k, v in warm.items()}
    summary = {
        "metric": "suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
        # Worst pass-level hypervisor steal, so the driver-captured line
        # carries its own noise context (round-14 VERDICT #1b).
        "steal_pct_max": max(
            record.get("steal_pct_runs", [record.get("steal_pct_suite", 0.0)])
        ),
        "queries_warm": compact_warm,
    }
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1500:
        slowest = dict(
            sorted(compact_warm.items(), key=lambda kv: -kv[1])[:15]
        )
        summary["queries_warm"] = slowest
        summary["queries_truncated_to_slowest"] = len(slowest)
        line = json.dumps(summary, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
