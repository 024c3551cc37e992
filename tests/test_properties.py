"""Property-based operator invariants (hypothesis): bounds, symmetry,
and identity properties that must hold for ANY input, not just the
synthetic tables. Examples are kept small and batched into one
DataFrame per case so each property costs a handful of Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.operators import dedup, text

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=200,
)


@settings(**SETTINGS)
@given(st.lists(texts, min_size=1, max_size=8))
def test_text_metric_bounds(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = text.analyze(df).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r.n_tokens >= 0
        assert r.n_tokens_bpe >= r.n_tokens
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0
        assert r.lang_pred in ("en", "de", "fr", "es", "und")
        assert len(r.fingerprint) == 32


@settings(**SETTINGS)
@given(st.lists(texts, min_size=2, max_size=6))
def test_exact_dedup_partitions_input(spark, docs):
    """Groups partition the input: group sizes sum to row count, and
    duplicating every row doubles sizes without changing keep ids."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    groups = dedup.exact_dedup(df).collect()
    assert sum(g.group_size for g in groups) == len(docs)
    doubled = df.union(
        df.withColumn("doc_id", F.col("doc_id") + len(docs))
    )
    groups2 = {g.content_hash: g for g in dedup.exact_dedup(doubled).collect()}
    for g in groups:
        assert groups2[g.content_hash].group_size == 2 * g.group_size
        assert groups2[g.content_hash].keep_id == g.keep_id  # min id stable


@settings(**SETTINGS)
@given(texts.filter(lambda t: len(t.strip()) >= 10))
def test_identical_texts_are_near_dups(spark, doc):
    """Two copies of the same text: jaccard 1.0 and simhash hamming 0."""
    df = spark.createDataFrame([(0, doc), (1, doc)], ["doc_id", "text"])
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.99).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in jac] == [(0, 1, 1.0)]
    sh = dedup.simhash_near_pairs(df, max_hamming=0).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in sh] == [(0, 1, 0)]


# Tiny vocabulary => dense token/gram collisions, and every character is
# ASCII so Java and Python lowercase/regex semantics provably agree —
# these tests compare VALUES against independent pure-Python references.
word_docs = st.lists(
    st.sampled_from(["a", "b", "ab", "ba", "q"]), min_size=0, max_size=30
).map(" ".join)


def _py_tokens(s: str) -> list[str]:
    import re

    return [t for t in re.sub(r"\s+", " ", s.lower()).strip().split(" ") if t]


@settings(**SETTINGS)
@given(st.lists(word_docs, min_size=1, max_size=6))
def test_repetition_metrics_match_python_reference(spark, docs):
    from collections import Counter

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = {r.doc_id: r for r in text.repetition_metrics(df).collect()}
    for i, s in enumerate(docs):
        toks = _py_tokens(s)
        n = len(toks)
        grams = [" ".join(toks[j : j + 2]) for j in range(n - 1)]
        r = rows[i]
        assert r.n_tokens == n
        assert abs(r.dup_word_frac - round((n - len(set(toks))) / max(n, 1), 6)) < 1e-9
        if grams:
            c = Counter(grams)
            m = max(c.values())
            best = min(g for g, v in c.items() if v == m)
            assert r.top_bigram == best
            assert abs(r.top_bigram_frac - round(m / len(grams), 6)) < 1e-9
        else:
            assert r.top_bigram is None and r.top_bigram_frac == 0.0


@settings(**SETTINGS)
@given(
    st.lists(word_docs, min_size=1, max_size=5),
    st.lists(word_docs, min_size=1, max_size=3),
)
def test_decontaminate_matches_python_set_intersection(spark, train_docs, bench_docs):
    n = 3
    train = spark.createDataFrame(list(enumerate(train_docs)), ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench_docs)], ["doc_id", "text"]
    )

    def grams(s):
        toks = _py_tokens(s)
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    bench_all = set().union(*[grams(t) for t in bench_docs])
    rows = {r.doc_id: r for r in text.decontaminate(train, bench, n=n).collect()}
    assert set(rows) == set(range(len(train_docs)))
    for i, s in enumerate(train_docs):
        g = grams(s)
        r = rows[i]
        assert r.n_grams == len(g)
        assert r.n_hits == len(g & bench_all)
        assert r.contaminated == (len(g & bench_all) > 0)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["g1", "g2", "g3"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 5),
)
def test_quota_sample_matches_python_md5_rank(spark, rows_in, quota):
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        quota_sample,
    )

    df = spark.createDataFrame(rows_in, ["k", "grp"])
    got = {
        (r.k, r.grp, r.sample_rank)
        for r in quota_sample(df, ("grp",), quota=quota, key_col="k").collect()
    }
    expect = set()
    for grp in {g for _, g in rows_in}:
        members = sorted(
            (k for k, g in rows_in if g == grp),
            key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k),
        )
        expect.update((k, grp, rank + 1) for rank, k in enumerate(members[:quota]))
    assert got == expect


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=0,
        max_size=12,
    ),
    st.integers(2, 8),
)
def test_canonical_keep_partitions_and_selects_one_per_component(spark, raw_pairs, n_docs):
    """For ANY pair graph over ANY corpus: the decision map is total
    (one row per doc), every component keeps EXACTLY one doc, the
    canonical id is a member of its own component, and every dropped
    doc points at its component's survivor."""
    from accounts_receivable_data_pipeline_api_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several plain words") for i in range(n_docs)],
        ["doc_id", "text"],
    )
    pairs = [(a % n_docs, b % n_docs) for a, b in raw_pairs if a % n_docs != b % n_docs]
    pairs_df = spark.createDataFrame(pairs or [(0, 0)], ["id_a", "id_b"])
    if not pairs:
        pairs_df = pairs_df.filter("id_a != id_a")  # empty graph
    out = dd.canonical_keep(docs, pairs_df, text.quality_score("text")).collect()
    assert len(out) == n_docs and len({r["doc_id"] for r in out}) == n_docs
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, rows in by_comp.items():
        keeps = [r for r in rows if r["keep"]]
        assert len(keeps) == 1
        canon = keeps[0]["doc_id"]
        assert all(r["canonical_id"] == canon for r in rows)
        assert all(r["group_size"] == len(rows) for r in rows)
        # canonical is max-quality (ties to lowest id) within the component
        best = sorted(rows, key=lambda r: (-r["quality"], r["doc_id"]))[0]
        assert canon == best["doc_id"]


@settings(**SETTINGS)
@given(st.integers(2, 5), st.integers(1, 3))
def test_kmeans_portable_is_a_total_partition(spark, k, iters):
    """Every vector gets exactly one cluster in [0, k); the map is
    total at any (k, iters)."""
    from accounts_receivable_data_pipeline_api_spark.operators import similarity as sim

    n = 23
    rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(4)]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.kmeans_portable(df, k=k, iters=iters).collect()
    assert len(out) == n and len({r["vec_id"] for r in out}) == n
    assert all(0 <= r["cluster_id"] < k for r in out)


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4, max_value=4, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_probe_assignments_equal_kernel_probes(spark, vecs, nprobe):
    """The literal-probe contract (round 12): the driver router
    (query_probe_assignments) and the executor kernel (_query_probes)
    must select IDENTICAL (query, cluster) probe sets for ANY vectors,
    any nprobe (including nprobe > nlist), and any centroid ties —
    both run `_top_nprobe`, and this property is the standing drift
    guard should that ever stop being one shared function. Centroids
    deliberately include DUPLICATES so the stable-argsort tie-break is
    exercised, and query vectors are reused as centroids so exact
    score ties occur."""
    from accounts_receivable_data_pipeline_api_spark.operators import similarity

    # centroids: the first two vectors (possibly equal) + a duplicate
    # of the first -> guaranteed tie candidates, nlist independent of n
    cents = [list(vecs[0]), list(vecs[0])] + [list(v) for v in vecs[:2]]
    queries_local = [(i, list(v)) for i, v in enumerate(vecs)]
    # MULTISET compare (sorted lists, not sets): a clamp regression
    # padding top-nprobe with repeated indices would emit duplicate
    # probe rows — invisible to a set compare, but it would double-
    # score every candidate in the repeated cluster (fifth-pass
    # round-12 review)
    assigns = sorted(
        similarity.query_probe_assignments(queries_local, cents, nprobe)
    )

    q = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in queries_local],
        "query_id long, qv array<double>",
    )
    kernel = sorted(
        (r["query_id"], r["cluster"])
        for r in similarity._query_probes(q, cents, nprobe).collect()
    )
    assert assigns == kernel
    # and per-query probe rows are duplicate-free by construction
    assert len(assigns) == len(set(assigns))
