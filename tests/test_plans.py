"""Physical-plan quality gates: the properties that make these queries
viable at 100 TB, asserted on the actual executed plans so a refactor
can't silently regress them (SURVEY §4.2)."""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod


def _plan(spark, sf_dir, name: str) -> str:
    df = entry_mod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filters_push_into_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3_top_orders")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("c_mktsegment" in p for p in pushed)
    assert any("o_orderdate" in p for p in pushed)
    assert any("l_shipdate" in p for p in pushed)


def test_small_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q5_nation_revenue")
    assert "BroadcastHashJoin" in plan
    plan2 = _plan(spark, sf_dir, "ar_past_due_page")
    assert "BroadcastHashJoin" in plan2


def test_columns_prune_to_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "window_topk_per_customer")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    cols = [c.split(":")[0] for c in schemas[0].split(",")]
    assert set(cols) == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    """The as-of join compiles to union + one window shuffle — no join
    operator, no per-row subquery."""
    plan = _plan(spark, sf_dir, "join_asof_purchase_signup")
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert not any("Join" in op for op in ops), ops
    assert sum(1 for op in ops if op == "Exchange") == 1, ops


def test_aggregates_have_partial_final_split(spark, sf_dir):
    """Map-side combine: partial aggregate before the exchange, final
    after — sum/count never ship raw rows."""
    plan = _plan(spark, sf_dir, "ar_monthly_rollup")
    agg_ops = re.findall(r"(HashAggregate|SortAggregate)", plan)
    assert len(agg_ops) >= 2, plan


def test_sharded_packing_has_no_global_window(spark, sf_dir):
    """curation_pack_batches partitions its prefix-sum window on the
    shard key: the plan must shuffle by shard (parallel prefix sums),
    never collapse to a single partition (round-2 VERDICT fix #5)."""
    plan = _plan(spark, sf_dir, "curation_pack_batches")
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan
    assert re.search(r"hashpartitioning\(shard", plan), plan


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_lsh_candidate_generation_never_cross_joins(spark, sf_dir):
    """The scale path for embedding dedup must block via equi-joins on
    (table, bucket) — an O(n^2) join operator anywhere in the candidate
    plan means the 100 TB story is broken (round-2 VERDICT fix #4)."""
    from accounts_receivable_data_pipeline_api_spark.operators import dedup
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_cosine_pairs_lsh(emb, dim=64, threshold=0.3)
    plan = _formatted(spark, pairs)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_approx_topk_paths_never_cross_join(spark, sf_dir):
    """Both approximate ANN paths replace the brute-force cross join
    with equi-joins (LSH: bucket key; IVF: probed cluster id). A
    cartesian/nested-loop operator in either plan is a scale
    regression. Gated on the raw OPERATORS (not the corpus entries):
    the similarity_*_topk entries are verification harnesses that
    deliberately compute the exact brute-force twin in-entry to emit
    driver-checkable invariants (round-2 VERDICT #1), so their plans
    legitimately contain the O(n*q) baseline."""
    from accounts_receivable_data_pipeline_api_spark.operators import similarity
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    plan_lsh = _formatted(spark, similarity.lsh_topk(queries, emb, dim=64, k=10))
    centroids = similarity.ivf_build(emb, k=8, iters=3)
    plan_ivf = _formatted(
        spark, similarity.ivf_topk(queries, emb, centroids, k=10, nprobe=4)
    )
    plan_sq8 = _formatted(
        spark, similarity.ivf_sq8_topk(queries, emb, centroids, k=10, nprobe=4)
    )
    for plan in (plan_lsh, plan_ivf, plan_sq8):
        assert "CartesianProduct" not in plan, plan
        # The 1-row probe/query side broadcast is expected; a nested-loop
        # join of the CANDIDATE corpus is not. ivf/lsh join on equi keys.
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivf_sq8_serving_scan_reads_codes_only(spark, sf_dir):
    """The 100 TB point of the quantized path (round-10 VERDICT #1):
    against a PERSISTED serving table the candidate scan must read the
    int8 codes, not floats — the parquet scan of the serving table
    carries qvec (tinyint) in its ReadSchema and NOT q_scale (the
    per-vector scale cancels in cosine, so an un-pruned q_scale column
    would be dead IO on every candidate); the full float embedding
    column appears only in the shortlist re-rank scan."""
    from accounts_receivable_data_pipeline_api_spark.operators import similarity
    from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import (
        _sq8_serving_cached,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from pyspark.sql import functions as F

    serving, cents, _n = _sq8_serving_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    plan = _formatted(
        spark,
        similarity.ivf_sq8_topk(
            queries, emb, cents, k=10, nprobe=8, serving=serving
        ),
    )
    scans = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    sq8_scans = [ln for ln in scans if "qvec" in ln]
    assert sq8_scans, f"no serving-table scan found:\n{plan}"
    for ln in sq8_scans:
        assert "tinyint" in ln, ln
        assert "q_scale" not in ln, f"q_scale not pruned from code scan: {ln}"

    # the PQ tier's persisted scan likewise reads only the m-byte code
    # column (plus ids/cluster), and the ADC join stays equi-keyed —
    # no cartesian/nested-loop anywhere in the plan
    from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import (
        _pq_serving_cached,
    )

    serving_pq, cents_pq, books, _n = _pq_serving_cached(spark, sf_dir)
    plan_pq = _formatted(
        spark,
        similarity.ivf_pq_topk(
            queries, emb, cents_pq, books, k=10, nprobe=8, m_rerank=100,
            serving=serving_pq,
        ),
    )
    assert "CartesianProduct" not in plan_pq, plan_pq
    assert "BroadcastNestedLoopJoin" not in plan_pq, plan_pq
    pq_scans = [
        ln for ln in plan_pq.splitlines()
        if "ReadSchema" in ln and "codes" in ln
    ]
    assert pq_scans, f"no PQ serving-table scan found:\n{plan_pq}"
    for ln in pq_scans:
        assert "tinyint" in ln, ln


def test_ann_serving_probe_prunes_buckets(spark, sf_dir):
    """Round-11 VERDICT #2: the persisted SQ8/PQ serving tables are
    CLUSTERED BY (cluster) and a probe carries driver-literal probe
    assignments (query_probe_assignments — the query-router shape, the
    SINGLE source of probe truth: no executor-side recomputation to
    drift from), whose distinct clusters push into the scan as an
    IN-list, so the candidate scan reads only the probed buckets
    BEFORE any IO — SelectedBucketsCount with a strict minority
    selected, the trigram-posting gate applied to the ANN path. Value
    equality vs the kernel-probed path pins that the literal
    assignments select the same probes; an EMPTY query batch yields an
    empty result, never an error."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators import similarity
    from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import (
        _pq_serving_cached,
        _probe_assignments,
        _sq8_serving_cached,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    serving, cents, _n = _sq8_serving_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    assigns = _probe_assignments(queries, cents, nprobe=8)
    assert assigns, "empty probe assignments at sf0.001 — fixture broke"
    n_clusters = len({c for _, c in assigns})
    assert n_clusters > 1, assigns

    pruned = similarity.ivf_sq8_topk(
        queries, emb, cents, k=10, nprobe=8, serving=serving,
        probe_assignments=assigns,
    )
    plan = _formatted(spark, pruned)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning in the SQ8 probe plan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    assert 1 <= selected < total, (selected, total)
    assert selected <= n_clusters, (selected, n_clusters)

    # the literal assignments reproduce the kernel-probed result
    # exactly (same float64 GEMM / stable-argsort math, one source)
    unpruned = similarity.ivf_sq8_topk(
        queries, emb, cents, k=10, nprobe=8, serving=serving
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = [tuple(r) for r in sorted(pruned.collect(), key=key)]
    want = [tuple(r) for r in sorted(unpruned.collect(), key=key)]
    assert got == want

    # the PQ tier rides the same shared pushdown
    serving_pq, cents_pq, books, _n2 = _pq_serving_cached(spark, sf_dir)
    assigns_pq = _probe_assignments(queries, cents_pq, nprobe=8)
    plan_pq = _formatted(
        spark,
        similarity.ivf_pq_topk(
            queries, emb, cents_pq, books, k=10, nprobe=8, m_rerank=100,
            serving=serving_pq, probe_assignments=assigns_pq,
        ),
    )
    m2 = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan_pq)
    assert m2, f"no bucket pruning in the PQ probe plan:\n{plan_pq}"
    assert 1 <= int(m2.group(1)) < int(m2.group(2)), plan_pq

    # empty query batch: zero probes, zero rows, no error (round-12
    # review — the earlier cover design rejected the empty list and a
    # no-match serving request 500'd instead of returning empty)
    none = similarity.ivf_sq8_topk(
        queries.filter(F.lit(False)), emb, cents, k=10, nprobe=8,
        serving=serving, probe_assignments=[],
    )
    assert none.collect() == []


def test_window_frames_single_shuffle_single_window(spark, sf_dir):
    """window_frames evaluates lag + running + sliding frames over the
    SAME window partition/order, so the plan must contain exactly one
    Exchange, one Sort, and one Window operator — merging the three
    former entries may not cost a second shuffle or sort."""
    plan = _plan(spark, sf_dir, "window_frames")
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "Exchange") == 1, ops
    assert sum(1 for op in ops if op == "Window") == 1, ops
    assert sum(1 for op in ops if op == "Sort") == 1, ops


def test_multimodal_pipeline_single_python_stage(spark, sf_dir):
    """The fused decode_resize kernel must cross the JVM<->Python Arrow
    boundary exactly once — two MapInPandas stages would double the
    serialization volume, the dominant cost of the Python batch path.
    Gated on the operator (decode+resize over a media frame = exactly
    one Python stage); the corpus entry unions SIX codec branches
    (BMP image, PNG image, grayscale JPEG, 4:2:0 color JPEG, WAV
    audio, AVI video), each exactly one fused decode stage — synthesis
    no longer appears in the plan at all, because payloads come from
    the write-once per-(sf, codec) fixture cache (six parquet scans,
    round-7 VERDICT #6)."""
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        attach_binary,
        decode_resize,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan_op = _formatted(spark, decode_resize(attach_binary(docs), max_side=32))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan_op)
    py = [op for op in ops if "MapInPandas" in op or "ArrowEval" in op]
    assert len(py) == 1, ops

    plan_entry = _plan(spark, sf_dir, "multimodal_pipeline")
    ops_entry = re.findall(r"\n\(\d+\) (\S+)", plan_entry)
    py_entry = [op for op in ops_entry if "MapInPandas" in op or "ArrowEval" in op]
    assert len(py_entry) == 6, ops_entry
    scans = [op for op in ops_entry if op.startswith("Scan")]
    assert len(scans) == 6, ops_entry
    assert "spark_graft_media_" in plan_entry


def test_range_join_is_equi_join_with_residual(spark, sf_dir):
    """join_range_followups must execute as a hash/sort-merge equi-join
    on user_id with the time-range predicate as residual filter — a
    broadcast-nested-loop over the full fact would be the O(n*m) trap."""
    plan = _plan(spark, sf_dir, "join_range_followups")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan


def test_repetition_metrics_zero_shuffle(spark, sf_dir):
    """The per-doc bigram mode folds in-row (array_sort + run-length
    aggregate) — the whole operator must stay a single projection with
    NO Exchange, unlike the natural explode/group/window recipe that
    shuffles one row per token of the corpus."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        repetition_metrics,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    df = repetition_metrics(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("Exchange") == 0, plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark gram set must broadcast (eval sets are bounded);
    the training gram stream must never sort-merge."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        decontaminate,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    df = decontaminate(
        docs.filter(F.col("doc_id") % 37 != 0),
        docs.filter(F.col("doc_id") % 37 == 0),
        n=5,
    )
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Round-5 operators
# ---------------------------------------------------------------------------


def test_lm_score_no_cartesian_and_partial_aggs(spark, sf_dir):
    """The LM scorer's V scalar rides a 1-row broadcast (never a real
    cartesian), and both count aggregations split partial/final so raw
    gram rows never ship to a single reducer unreduced."""
    plan = _plan(spark, sf_dir, "text_lm_perplexity")
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"HashAggregate", plan)) >= 4, plan


def test_bloom_single_python_crossing_single_shuffle(spark, sf_dir):
    """decontaminate_bloom: ONE Arrow crossing (the bit lookup) and ONE
    exchange (the final doc_id agg) — positions are computed JVM-side
    and nothing shuffles before the per-doc reduction."""
    import accounts_receivable_data_pipeline_api_spark.operators.text as text
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    train = docs.filter(F.col("doc_id") % 37 != 0)
    bitmap = text.bloom_build(bench, n=5)
    plan = _formatted(spark, text.decontaminate_bloom(train, bitmap, n=5))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "MapInPandas") == 1, ops
    assert sum(1 for op in ops if op == "Exchange") == 1, ops


def test_mixture_shards_windows_are_partitioned(spark, sf_dir):
    """The corpus-wide windows partition on real keys (source for the
    sample rank, shard for the position rank); the only unpartitioned
    window runs over the bounded GROUP table (quota apportionment),
    never the corpus."""
    plan = _plan(spark, sf_dir, "curation_mixture_shards")
    assert re.search(r"hashpartitioning\(source", plan), plan
    assert re.search(r"hashpartitioning\(shard", plan), plan


def test_semantic_prune_broadcasts_seeds_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_semantic")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # n x n_seeds scoring


def test_incremental_exact_shuffles_on_content_hash(spark, sf_dir):
    """The delta-vs-corpus probe joins and windows on the uniform md5
    key — no cartesian, no single-partition window."""
    import accounts_receivable_data_pipeline_api_spark.operators.dedup as dedup
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = dedup.incremental_exact(
        docs.filter(F.col("doc_id") % 3 != 0), docs.filter(F.col("doc_id") % 3 == 0)
    )
    plan = _formatted(spark, out)
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert re.search(r"hashpartitioning\(content_hash", plan), plan


def test_components_singletons_join_once_after_convergence(spark, sf_dir):
    """connected_components(nodes=corpus) must keep the corpus OUT of
    the propagation loop: the converged endpoint labels are a
    checkpointed RDD, and the nodes frame appears in the final plan
    exactly once, under a single left-anti join (the singleton branch,
    components constructed map-side from the node id). Before round 6
    the nodes were unioned into the seed labels, making every
    convergence round — and its eager checkpoint — corpus-sized for
    labels that can never change."""
    import accounts_receivable_data_pipeline_api_spark.operators.dedup as dedup
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_cosine_pairs_lsh(emb, dim=64, threshold=0.3)
    out = dedup.connected_components(pairs, nodes=emb.select("vec_id"))
    plan = _formatted(spark, out)
    # propagation side: converged labels are a localCheckpoint RDD
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
    # singleton side: exactly one anti-join, fed by the nodes scan
    assert len(re.findall(r"LeftAnti", plan)) >= 1, plan
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    joins = [op for op in ops if "Join" in op and "Reused" not in op]
    assert all("LeftAnti" in j or "ExistenceJoin" not in j for j in joins), joins
    # the embeddings parquet scan feeds ONLY the singleton branch:
    # exactly one scan of the source in the final (post-loop) plan
    scans = [op for op in ops if op.startswith("Scan") and "parquet" in op]
    assert len(set(scans)) <= 1, scans


def test_winnow_fingerprints_single_shuffle(spark, sf_dir):
    """Winnowing is a scan-local array computation: gram hashing and
    window minima live inside the projection, so the ONLY exchange in
    the plan is the final (doc, fp) hash agg — and nothing crosses to
    Python. A shuffle-per-gram or a UDF here would forfeit the whole
    point of winnowed (sampled) fingerprints at 100 TB."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        winnow_fingerprints,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted(spark, winnow_fingerprints(docs))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "Exchange") == 1, ops
    assert not [op for op in ops if "MapInPandas" in op or "ArrowEval" in op], ops


def test_bm25_broadcasts_query_vocabulary(spark, sf_dir):
    """bm25_topk must never build, aggregate, or shuffle a corpus-wide
    token table (r14 shape): the exploded token stream is semi-reduced
    to the BROADCAST query vocabulary BEFORE the tf aggregate (one BHJ
    under the explode), df_t is a count WINDOW on the pruned tf (no
    separate docfreq aggregation subtree — the r13 shape's third BHJ),
    the corpus stats arrive as a 1-row broadcast, and no sort-merge
    join appears anywhere in the executed plan. The no-SortMergeJoin
    invariant holds at ANY scale, not just test scale: the document
    length rides the token explode into the tf agg, so the plan has no
    doc-keyed join whose sides could both outgrow the broadcast
    threshold (round-7 ADVICE — the old dl join was exactly that)."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import bm25_topk
    from accounts_receivable_data_pipeline_api_spark.plans.llm_ops import _BM25_QUERIES
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "query_text"])
    plan = _formatted(spark, bm25_topk(docs, queries, k=10))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # qvocab prune under the explode + qterms attach: both broadcast
    assert sum(1 for op in ops if op == "BroadcastHashJoin") >= 2, ops
    # df_t count window + the rank window
    assert sum(1 for op in ops if op == "Window") >= 2, ops
    # the only nested-loop is the 1-row corpus-stats cross join
    assert sum(1 for op in ops if op == "BroadcastNestedLoopJoin") <= 1, ops


def test_hll_register_agg_two_exchanges(spark, sf_dir):
    """The portable HLL pipeline is two map-side-combinable hash aggs
    — (group, bucket) registers then per-group estimate — so the plan
    carries exactly two exchanges and zero Python stages; its driver
    output is bounded at groups x m rows regardless of corpus size."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem")
    reg = hll_registers(li, "l_orderkey", m=1024, group_cols=("l_returnflag",))
    plan = _formatted(spark, hll_estimate(reg, m=1024, group_cols=("l_returnflag",)))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "Exchange") == 2, ops
    assert not [op for op in ops if "MapInPandas" in op or "ArrowEval" in op], ops
    # six HashAggregates: the register partial/final pair, plus the
    # estimate agg's THREE levels — the duplicate-bucket guard's
    # countDistinct planner rewrite adds one level over the plain
    # partial/final pair, all riding the SAME two exchanges (the
    # guard's input is already bounded at groups x m rows)
    assert sum(1 for op in ops if op == "HashAggregate") == 6, ops


def test_span_excise_no_cartesian_no_single_partition(spark, sf_dir):
    """excise_duplicate_spans must stay key-shuffles + per-document
    windows: no cartesian/nested-loop anywhere (the gram join is an
    equi-join on the gram string) and no SinglePartition window (the
    islands/segments windows partition by doc_id)."""
    from accounts_receivable_data_pipeline_api_spark.operators.dedup import (
        excise_duplicate_spans,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    # r15: the shipped form pins two lazy checkpoints (hot grams,
    # spans), which hide the candidate machinery from the final
    # explain; materialize=False yields the TRANSPARENT plan — the
    # same expressions with no materialization points — so the pins
    # below keep gating the real dataflow. Both forms must stay free
    # of cartesian/nested-loop/single-partition/Python operators.
    for materialize in (True, False):
        plan = _formatted(
            spark, excise_duplicate_spans(docs, materialize=materialize)
        )
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "SinglePartition" not in plan, plan
        assert not re.findall(r"MapInPandas|ArrowEval", plan), plan
    # round-8 ADVICE pin (on the transparent plan): raw k-char grams
    # must only materialize AFTER the doc-keyed candidate join (the
    # substr shows up as a join-side expression over the joined text),
    # never as a corpus-wide raw-gram explode — the wide gf shuffles
    # carry 8-byte fingerprints only.
    assert re.search(r"substr\(t#\d+, cast\(i#\d+L? as int\), \d+\)", plan), plan
    assert "xxhash64" in plan, plan


def test_hdr_sketch_partial_aggs_no_single_partition(spark, sf_dir):
    """HDR quantile sketch plan shape: the register build is ONE
    map-side-combinable HashAggregate pair over ONE exchange on the
    integer bucket key (partial counts combine before the shuffle —
    the property that bounds shuffle rows at groups * buckets however
    large the input), and the quantile walk's windows partition by the
    group key — never SinglePartition."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hdr_quantiles,
        hdr_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("v")
    )
    reg = hdr_registers(li, "v", ["l_returnflag"])
    plan = _formatted(spark, reg)
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "Exchange") == 1, ops
    assert sum(1 for op in ops if op == "HashAggregate") == 2, ops
    assert "partial_count" in plan, plan

    plan_q = _formatted(spark, hdr_quantiles(reg, ["l_returnflag"]))
    assert "SinglePartition" not in plan_q, plan_q
    assert "CartesianProduct" not in plan_q, plan_q


def test_triangle_counts_equi_joins_only(spark, sf_dir):
    """triangle_counts must stay pure equi-joins: the wedge join keys on
    the apex node, the closing join on the (lo, hi) edge pair — no
    cartesian/nested-loop product and no single-partition stage anywhere
    (a global dense-rank formulation of the degree order would show up
    as a SinglePartition window)."""
    from accounts_receivable_data_pipeline_api_spark.operators.dedup import (
        embedding_cosine_pairs,
    )
    from accounts_receivable_data_pipeline_api_spark.operators.graph import (
        triangle_counts,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs(emb, threshold=0.3).localCheckpoint(eager=True)
    plan = _formatted(spark, triangle_counts(pairs))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan


def test_edit_distance_pairs_equi_join_no_cartesian(spark, sf_dir):
    """edit_distance_pairs must key its one join on the deletion
    variant string (SymSpell blocking) — no cartesian/nested-loop
    product anywhere, no Python stage."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.dedup import (
        edit_distance_pairs,
        normalized,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(normalized("text"), " ")).alias("word"))
        .distinct()
    )
    plan = _formatted(spark, edit_distance_pairs(vocab))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan
    assert "levenshtein" in plan, plan


def test_tfidf_query_topk_broadcasts_query_vocabulary(spark, sf_dir):
    """tfidf_query_topk must carry bm25_topk's r14 scale contract: the
    token stream is pruned to the broadcast query vocabulary BEFORE
    the tf aggregate, df_t is a count window on the pruned tf (no
    docfreq subtree), corpus size arrives as a 1-row broadcast, and no
    sort-merge join or cartesian product appears in the executed
    plan."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        tfidf_query_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.plans.llm_ops import _BM25_QUERIES
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "query_text"])
    plan = _formatted(spark, tfidf_query_topk(docs, queries, k=20))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert sum(1 for op in ops if op == "BroadcastHashJoin") >= 2, ops
    assert sum(1 for op in ops if op == "Window") >= 2, ops
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan


def test_kmv_sample_shard_tree_no_group_wide_sort(spark, sf_dir):
    """The KMV sample's bottom-k is the two-level shard tree: the
    first window partitions by (group, hv % shards) — shard-local
    sorts, never the one-task-per-group trap when groups are few —
    and the final per-group window only ever sees <= shards * k
    survivor rows. Plan: two Window nodes, key-partitioned exchanges
    only, zero Python stages, no cartesian."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import kmv_sample
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = _formatted(
        spark, kmv_sample(li, "l_orderkey", k=64, group_cols=("l_returnflag",))
    )
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "Window") == 2, ops
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan
    # level-1 exchange hashes on (group, shard), not group alone
    assert re.search(r"hashpartitioning\([^)]*l_returnflag[^)]*%", plan) or re.search(
        r"hashpartitioning\([^)]*_w\d+", plan
    ), plan


def test_substring_search_plan_shapes_both_paths(spark, sf_dir):
    """INDEX path: the posting table joins the BOUNDED query-gram
    frame via broadcast hash join (postings for other grams never
    shuffle), no nested-loop anywhere, zero Python stages. DIRECT
    path: exactly ONE corpus scan and one BroadcastNestedLoopJoin
    whose BROADCAST side is the bounded pattern list — the corpus is
    never the replicated side."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        substring_search,
        trigram_postings,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    pats = docs.sparkSession.createDataFrame(
        [("p1", "hash join"), ("p2", "fast vector")], ["pattern_id", "pattern"]
    )
    plan = _formatted(
        spark, substring_search(docs, pats, postings=trigram_postings(docs))
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan

    direct = _formatted(spark, substring_search(docs, pats))
    assert len(re.findall(r"\n\(\d+\) Scan parquet", direct)) == 1, direct
    # the broadcast (replicated) side is the tiny pattern frame
    assert re.search(r"BroadcastNestedLoopJoin Inner BuildRight", direct), direct
    assert not re.findall(r"MapInPandas|ArrowEval", direct), direct


def test_substr_search_bucket_pruned_posting_scan(spark, sf_dir):
    """The persisted posting index is bucketed by gram, and the probe
    path's literal gram IN-list prunes buckets at the SCAN — the
    executed plan carries SelectedBucketsCount with a strict minority
    of buckets selected (round-9 VERDICT #6; the point_lookup gate).
    The pruned scan must still produce exactly the direct-scan
    matches (completeness of the prune list)."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        substring_search,
    )
    from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import (
        _TRIGRAM_BUCKETS,
        op_substr_search,
    )
    from accounts_receivable_data_pipeline_api_spark.plans.llm_ops import (
        _SUBSTR_PATTERNS,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    q = op_substr_search(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(2)) == _TRIGRAM_BUCKETS
    assert int(m.group(1)) < int(m.group(2)) // 2, m.group(0)
    got = {(r["pattern_id"], r["doc_id"]) for r in q.collect()}
    docs = load_table(spark, sf_dir, "documents")
    pats = spark.createDataFrame(_SUBSTR_PATTERNS, ["pattern_id", "pattern"])
    direct = {
        (r["pattern_id"], r["doc_id"])
        for r in substring_search(docs, pats).collect()
    }
    assert got == direct and len(got) > 0


def test_zorder_layout_range_partitions_no_python(spark, sf_dir):
    """The z-order write-side layout is ONE sampled RangePartitioning
    exchange on the Morton key plus an in-partition sort — pure
    integer codegen expressions, zero Python stages, never a global
    single-partition sort."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.layout import (
        zorder_layout,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2048).cast("int").alias("x"),
        (F.col("event_id") % 2048).cast("int").alias("y"),
    )
    plan = _formatted(spark, zorder_layout(ev, ["x", "y"], bits=11, n_files=8))
    assert "rangepartitioning(z_key" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan


def test_priority_sample_takeordered_pruned_scan_no_python(spark, sf_dir):
    """priority_sample's selection is TakeOrderedAndProject (per-
    partition top-(k+1) heaps, no global sort, no corpus shuffle); the
    scan reads only the 4 columns the sample needs — never text — and
    the whole operator is JVM expressions (md5/conv/division), zero
    Python stages. The only windows run AFTER the limit, over the
    bounded (k+1)-row survivor frame."""
    plan = _plan(spark, sf_dir, "curation_quota_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert re.search(
        r"Arguments: 51, \[ps_priority#\d+ DESC NULLS LAST, doc_id#\d+L? ASC", plan
    ), plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("text" not in s for s in schemas), schemas
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan


def test_mg_partials_single_python_crossing_combinable_merge(spark, sf_dir):
    """The Misra-Gries corpus pass (mg_partials -> counter-sum merge):
    exactly ONE Arrow crossing (the bounded per-batch kernel), ONE
    exchange, and a partial_sum hash aggregate — the merge map-side
    combines the <= (k+1)-per-batch summary rows before shuffling.
    mg_heavy_hitters then splits summary and budget off ONE lazy
    checkpoint of that compacted frame (Catalyst pushes the
    is[Not]Null split below the aggregate, so ReusedExchange cannot
    share the branches — the checkpoint makes the corpus pass run
    once), leaving the final plan two scans of the checkpointed RDD:
    zero further Python stages, budget broadcast, no collect."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        mg_heavy_hitters,
        mg_partials,
    )
    from accounts_receivable_data_pipeline_api_spark.operators.text import tokens_expr
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens_expr("text")).alias("w")
    )
    merged = mg_partials(toks, "w", 30).groupBy("item").agg(
        F.sum("cnt").alias("est")
    )
    plan = _formatted(spark, merged)
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op == "MapInPandas") == 1, ops
    assert sum(1 for op in ops if op == "Exchange") == 1, ops
    assert re.search(r"partial_sum", plan), plan

    final = _formatted(spark, mg_heavy_hitters(toks, "w", 30))
    fops = re.findall(r"\n\(\d+\) (\S+)", final)
    assert not [op for op in fops if op in ("MapInPandas", "ArrowEvalPython")], fops
    # four readers of the ONE checkpointed RDD: summary probe, budget,
    # and the empty-summary sentinel's anti-join pair — cheap rescans
    # of the compacted frame, never of the corpus
    assert sum(1 for op in fops if op == "Scan") == 4, fops
    assert "BroadcastExchange" in final, final


def test_hll_rollup_single_scan_two_combinable_aggs(spark, sf_dir):
    """The time-grain rollup scans raw events ONCE (finest grain);
    the daily grain is a groupBy max over the bounded register table
    — two map-side-combinable hash aggregates (partial max under
    each exchange), zero Python, and the scan reads only the 2
    columns the sketch needs."""
    from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import (
        op_hll_rollup,
    )

    plan = _formatted(spark, op_hll_rollup(spark, sf_dir))
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op.startswith("Scan")) == 1, ops
    assert re.search(r"partial_max", plan), plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols == {"user_id", "ts"}, cols


def test_hdr_rollup_single_scan_combinable_fold(spark, sf_dir):
    """The quantile family's time-grain rollup (hll_rollup's SUM-merge
    twin): raw events scan happens ONCE at the finest grain; the daily
    fold is a map-side-combinable partial_sum over the bounded
    register table; zero Python; the scan reads only ts + value."""
    from pyspark.sql import functions as F

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hdr_merge_registers,
        hdr_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hr"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .filter(F.col("v").isNotNull() & (F.col("v") > 0))
    )
    day = hdr_merge_registers(
        hdr_registers(ev, "v", ["day", "hr"]), group_cols=("day",)
    )
    plan = _formatted(spark, day)
    ops = re.findall(r"\n\(\d+\) (\S+)", plan)
    assert sum(1 for op in ops if op.startswith("Scan")) == 1, ops
    assert re.search(r"partial_sum", plan), plan
    assert not re.findall(r"MapInPandas|ArrowEval", plan), plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols == {"ts", "value"}, cols
