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
