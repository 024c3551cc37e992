"""Raw scale-path operator builders, shared by bench.py and
scripts/scale_probe.py (round-3 VERDICT #1).

The corpus entries for the hash-family operators (dedup_minhash_lsh,
dedup_embedding_lsh, similarity_ann_topk, ...) bundle exact-twin
verification fixtures that are O(n^2) BY DESIGN — they exist so the
driver's DuckDB oracle can value-check an approximate operator. Timing
those entries therefore measures the fixture, not the operator: in the
round-3 bench the dedup_minhash_lsh entry's 5.7 s warm was 31% of the
whole suite and almost entirely the exact 5-gram-Jaccard twin + the
full-outer invariant join. These builders construct the RAW operators
the fixtures verify — the plans that actually run at 100 TB — so the
bench and the regression gate guard operator cost, and the entries'
fixture cost is reported separately (bench.py "verification" section).

The IVF centroid build is the OFFLINE index step (built once per
corpus, reused by every query), so it is cached per sf_dir and excluded
from the query timing — the same accounting as every ANN system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity
from ..sources.star import load_table


def op_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _parallel_docs (defined below): the single-file local documents
    # table otherwise reads as ONE partition and the 5M-row shingle
    # explode serializes on one core — measured 3.1 s of the operator's
    # 7.5 s warm at sf0.1 doing per-row transforms single-threaded
    # (round-5 profile); a many-partition input is automatic at 100 TB.
    return dedup.minhash_lsh_pairs(_parallel_docs(spark, sf_dir), verify_threshold=0.5)


def op_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_cosine_pairs_lsh(emb, dim=64, threshold=0.3)


def op_components_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_cosine_pairs_lsh(emb, dim=64, threshold=0.3)
    return dedup.connected_components(pairs, nodes=emb.select("vec_id"))


def op_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(queries, emb, dim=64, k=10)


_IVF_CENTROIDS: dict[str, list] = {}


def op_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _IVF_CENTROIDS:
        emb = load_table(spark, sf_dir, "embeddings")
        _IVF_CENTROIDS[sf_dir] = similarity.ivf_build(emb, k=None, iters=2)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(queries, emb, _IVF_CENTROIDS[sf_dir], k=10, nprobe=8)


_SQ8_CACHE_VERSION = "v3"  # v3: external table CLUSTERED BY (cluster)

# Bucket count of the persisted SQ8/PQ serving tables — part of the
# on-disk layout (bucket ids live in file names), baked into the cache
# tag like the trigram index's. A probe pushes its driver-literal
# probe assignments' distinct clusters (similarity.
# query_probe_assignments) into the scan as an IN-list, so it reads
# at most |probed clusters| of these buckets before ANY IO
# (SelectedBucketsCount, plan-gated) — with nlist = sqrt(n) and
# nprobe*n_queries probed clusters, that is ~nprobe/nlist of the code
# table at scale; at 100 TB the count scales with data while a probe
# still reads O(nprobe * n_queries) buckets. 64 keeps a strict minority
# selected even at sf0.001 (nlist 22 < 64).
_ANN_SERVING_BUCKETS = 64


def _cache_tag(version_prefix: str, sf_dir: str) -> str:
    """Per-corpus cache tag, filesystem- and SQL-identifier-safe,
    shared by every persisted /tmp artifact (trigram postings, SQ8
    serving table). Chars outside [A-Za-z0-9_] are sanitized for the
    unquoted CREATE TABLE; the sanitization is lossy (…/sf0.1 and
    …/sf0_1 both map to sf0_1), so an md5 prefix of the RAW path
    disambiguates — without it two colliding corpora would share one
    location and the loser would silently read the other corpus's
    artifact (round-10 ADVICE)."""
    import hashlib
    import re as _re

    raw = sf_dir.strip("/")
    return (
        f"{version_prefix}_"
        + _re.sub(r"[^A-Za-z0-9_]", "_", raw)
        + "_"
        + hashlib.md5(raw.encode()).hexdigest()[:8]
    )


def _publish_cache_dir(tmp: str, loc: str, marker: str) -> None:
    """Atomic cache publication, shared protocol (round-11 review —
    two hand-maintained copies had already drifted): os.rename the
    whole tmp dir onto the pinned path; the rename loser (path exists,
    or any OSError) discards its copy and reads the winner's —
    identical content, deterministic build. Then VERIFY a complete
    artifact is actually published (``marker`` relative to ``loc``):
    a rename that failed for a non-race reason (EACCES, cross-device)
    with no winner present must raise a clear error here, not a bare
    FileNotFoundError at first read."""
    import os
    import shutil

    try:
        os.rename(tmp, loc)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.isfile(os.path.join(loc, marker)):
        raise RuntimeError(
            f"cache build did not publish a complete artifact at {loc} "
            f"(missing {marker})"
        )


# (table name, data dir) pairs whose catalog registration has been
# verified to point at that dir in THIS process — see the binding
# check inside _bucketed_serving_table
_VERIFIED_TABLE_BINDINGS: set[tuple[str, str]] = set()


def _bucketed_serving_table(
    spark: SparkSession,
    tbl: str,
    loc: str,
    columns_ddl: str,
    build_df,
    build_meta,
    meta_name: str,
):
    """Shared build/register protocol for the persisted ANN serving
    tables (SQ8, PQ): an EXTERNAL table CLUSTERED BY (cluster) SORTED
    BY (cluster) INTO ``_ANN_SERVING_BUCKETS`` BUCKETS at ``loc``/data,
    with the codebook JSON in the same published directory — the
    trigram-posting layout (raw_ops.py:_trigram_index_cached) applied
    to the ANN probe path (round-11 VERDICT #2): a probe's literal
    cluster IN-list then prunes whole buckets BEFORE any IO
    (SelectedBucketsCount in the plan) and the in-bucket sort gives
    tight row-group min/max stats. Persisting the codebooks with the
    codes keeps the cache cross-process safe (ivf_build's float partial
    sums are pid-ordered — a new process recomputing centroids could
    assign probes inconsistently with the stored cluster column,
    silently costing recall).

    Publication is ATOMIC (throwaway table at a uuid tmp location,
    os.rename of the whole directory — the shared _publish_cache_dir
    contract); the rename loser discards its copy and reads the
    winner's. Bucket spec lives in the session catalog; the DATA is at
    the pinned external location with bucket ids encoded in file names,
    so a new process re-registers the same spec with one DDL statement.
    ``build_df()``/``build_meta()`` run only on a cache miss;
    ``build_df`` must return columns in ``columns_ddl`` order
    (insertInto is positional). Returns (serving DataFrame, meta dict).
    """
    import json as _json
    import os
    import shutil
    import uuid

    data_dir = os.path.join(loc, "data")
    # IF NOT EXISTS: catalog registration must be atomic too — the
    # check-then-CREATE form raced two threads of one session onto a
    # TableAlreadyExistsException (second-pass round-12 review); the
    # data-publication race was already handled (rename loser discards)
    ddl = (
        f"CREATE TABLE IF NOT EXISTS {{name}} ({columns_ddl}) USING parquet "
        f"CLUSTERED BY (cluster) SORTED BY (cluster) "
        f"INTO {_ANN_SERVING_BUCKETS} BUCKETS LOCATION '{{loc}}'"
    )
    if not os.path.isfile(os.path.join(data_dir, "_SUCCESS")):
        meta = build_meta()
        nonce = uuid.uuid4().hex
        tmp_tbl = f"{tbl}_build_{nonce[:8]}"
        tmp = f"{loc}.tmp-{nonce}"
        spark.sql(ddl.format(name=tmp_tbl, loc=os.path.join(tmp, "data")))
        try:
            # one file per non-empty bucket: pre-shuffle into exactly
            # the bucket count on the bucket key so each write task
            # holds one bucket (hash(cluster) pmod B both sides) — a
            # many-partition input would otherwise write a file per
            # (task, bucket) pair, footer-heavy at small SF
            (
                build_df(meta)
                .repartition(_ANN_SERVING_BUCKETS, F.col("cluster"))
                .write.mode("overwrite")
                .insertInto(tmp_tbl)
            )
            with open(os.path.join(tmp, meta_name), "w") as f:
                _json.dump(meta, f)
            _publish_cache_dir(tmp, loc, os.path.join("data", "_SUCCESS"))
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")  # external: keeps files
            shutil.rmtree(tmp, ignore_errors=True)
    if not spark.catalog.tableExists(tbl):
        # the name is being (re-)registered: any binding verified for a
        # PRIOR registration of this name is stale — a drop/recreate at
        # a new location within one process must re-verify, not ride
        # the old entry (round-13 ADVICE)
        _VERIFIED_TABLE_BINDINGS.difference_update(
            {b for b in _VERIFIED_TABLE_BINDINGS if b[0] == tbl}
        )
        spark.sql(ddl.format(name=tbl, loc=data_dir))
    # Name/location binding check (round-13 second-pass review): a
    # caller reusing a TABLE name with a fresh loc — e.g. a rebuild
    # generation that rotated the location but not the name — would
    # get the catalog's OLD registration back while this function's
    # meta comes from the NEW loc, silently serving a stale artifact
    # under fresh metadata. Table names are one-per-location here.
    # Verified once per (table, loc) per process — the catalog's
    # registration is immutable after creation, so re-DESCRIBEing on
    # every warm cache hit would tax the probe hot path for nothing
    # (third-pass review); compare the FULL normalized URI — scheme +
    # authority + path, defaulting a scheme-less side to file: — not
    # just the path (a path-only compare false-passes a table
    # registered at hdfs://nn/X against a local /X; round-13 ADVICE),
    # and exactly, not by suffix (a suffix match false-passes when one
    # absolute path is a literal tail of a different mount's).
    if (tbl, data_dir) not in _VERIFIED_TABLE_BINDINGS:
        from urllib.parse import urlparse

        def _norm_uri(u: str) -> tuple[str, str, str]:
            p = urlparse(u)
            return (
                (p.scheme or "file").lower(),
                p.netloc.lower(),
                os.path.normpath(p.path or "/"),
            )

        registered = [
            (r[1] or "").strip()
            for r in spark.sql(f"DESCRIBE FORMATTED {tbl}").collect()
            if (r[0] or "").strip() == "Location"
        ]
        got = _norm_uri(registered[0]) if registered else ("", "", "")
        if got != _norm_uri(data_dir):
            raise RuntimeError(
                f"table {tbl} is registered at "
                f"{registered[0] if registered else '<unknown>'}, not "
                f"{data_dir} — table names bind to one location; pass a "
                "fresh table name alongside a fresh location"
            )
        _VERIFIED_TABLE_BINDINGS.add((tbl, data_dir))
    with open(os.path.join(loc, meta_name)) as f:
        meta = _json.load(f)
    return spark.table(tbl), meta


def _sq8_serving_cached(spark: SparkSession, sf_dir: str):
    """Write-once persisted IVF-SQ8 serving table per sf_dir — the
    compacted artifact the quantized ANN path scans at 100 TB
    (round-10 VERDICT #1): (match_id, cluster, q_scale,
    qvec ARRAY<TINYINT>) as a cluster-bucketed external table plus the
    coarse centroids as JSON in the same published directory (layout,
    atomicity, and the cross-process-consistency argument in
    `_bucketed_serving_table`). The corpus size n rides in the metadata
    so downstream consumers (the PQ cache build, auto-sized re-rank
    budgets) never re-count the table (round-11 third-pass review).
    Returns (serving DataFrame, centroids list, n)."""
    tag = _cache_tag(f"{_SQ8_CACHE_VERSION}_b{_ANN_SERVING_BUCKETS}", sf_dir)

    def build_meta():
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        cents = similarity.ivf_build(emb, k=similarity.ivf_auto_nlist(n), iters=2)
        return {"centroids": cents, "n": n}

    def build_df(meta):
        emb = load_table(spark, sf_dir, "embeddings")
        return similarity.ivf_sq8_serving_table(emb, meta["centroids"]).select(
            F.col("match_id").cast("long"),
            F.col("cluster").cast("int"),
            F.col("q_scale").cast("double"),
            F.col("qvec").cast("array<tinyint>"),
        )

    serving, meta = _bucketed_serving_table(
        spark,
        f"sq8_serving_{tag}",
        f"/tmp/spark_graft_sq8_{tag}",
        "match_id BIGINT, cluster INT, q_scale DOUBLE, qvec ARRAY<TINYINT>",
        build_df,
        build_meta,
        "centroids.json",
    )
    return serving, meta["centroids"], meta["n"]


_PQ_CACHE_VERSION = "v3"  # v3: external table CLUSTERED BY (cluster)


def _pq_serving_cached(spark: SparkSession, sf_dir: str):
    """Write-once persisted IVF-PQ serving table per sf_dir: (match_id,
    cluster, codes ARRAY<TINYINT> length m) as a cluster-bucketed
    external table plus BOTH codebook tiers (coarse centroids +
    per-subspace PQ codebooks) and the corpus size n as JSON in the
    same published directory — the cross-process-consistency contract
    of the SQ8 cache, doubled: probes AND the query-side LUT must be
    computed against exactly the codebooks the stored codes were
    encoded with. The coarse centroids are REUSED from the SQ8 cache
    (building it first if absent) rather than re-running the full
    sqrt-n k-means — the two tiers are one artifact family over the
    same corpus, and sharing also keeps their cluster columns identical
    for cross-tier comparisons (round-11 review). Layout/atomicity in
    `_bucketed_serving_table`. Returns (serving DataFrame, centroids,
    codebooks, n)."""
    tag = _cache_tag(f"{_PQ_CACHE_VERSION}_b{_ANN_SERVING_BUCKETS}", sf_dir)

    def build_meta():
        emb = load_table(spark, sf_dir, "embeddings")
        _, cents, n = _sq8_serving_cached(spark, sf_dir)
        books = similarity.pq_build(emb, m=8, ksub=16, iters=2)
        return {"centroids": cents, "codebooks": books, "n": n}

    def build_df(meta):
        emb = load_table(spark, sf_dir, "embeddings")
        return similarity.pq_serving_table(
            emb, meta["centroids"], meta["codebooks"]
        ).select(
            F.col("match_id").cast("long"),
            F.col("cluster").cast("int"),
            F.col("codes").cast("array<tinyint>"),
        )

    serving, meta = _bucketed_serving_table(
        spark,
        f"pq_serving_{tag}",
        f"/tmp/spark_graft_pq_{tag}",
        "match_id BIGINT, cluster INT, codes ARRAY<TINYINT>",
        build_df,
        build_meta,
        "codebooks.json",
    )
    return serving, meta["centroids"], meta["codebooks"], meta["n"]


def op_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ probe against the persisted code table: 8-byte-per-vector
    candidate scan via the broadcast ADC lookup table, exact re-rank of
    an AUTO-SIZED shortlist (operators/similarity.py:ivf_pq_topk). The
    re-rank budget is the recall knob (measured at sf1: m_rerank
    100 -> 0.74, 200 -> 0.92, 400 -> 0.96, 800 -> 0.98 recall@10) and a
    FIXED budget decays as the corpus grows — the probed candidate set
    under sqrt-n nlist grows ~nprobe*sqrt(n), so the budget follows it:
    m_rerank = max(200, 4*sqrt(n)), with n pinned in the cache metadata
    at build time (no probe-time count action). The full-vector reads
    this buys stay per-query-bounded and vanish against the corpus scan
    at 100 TB. Same amortized-probe accounting as op_ivf_sq8_topk; the
    round-11 sf1 harness caught the fixed-budget decay live (entry
    recall 0.44 at sf1 under a fixed m=100)."""
    import math

    serving, cents, books, n = _pq_serving_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_pq_topk(
        queries,
        emb,
        cents,
        books,
        k=10,
        nprobe=8,
        m_rerank=max(200, 4 * math.isqrt(n)),
        serving=serving,
        probe_assignments=_probe_assignments(queries, cents, nprobe=8),
    )


def _probe_assignments(
    queries: DataFrame,
    cents: list,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int]]:
    """Driver-literal probe assignments for a bucket-pruned serving
    probe (similarity.query_probe_assignments over the collected query
    batch). The collect is REQUEST-bounded — n_queries vectors, the
    serving tier's input payload, never corpus data; in a deployed
    router the query batch arrives driver-side and the probe list is
    computed against router-resident centroids before any executor
    touches the code table. The assignments are the SINGLE source of
    probe truth inside the plan (no executor-side recomputation to
    drift from — round-12 review)."""
    rows = queries.select(id_col, vec_col).collect()
    return similarity.query_probe_assignments(
        [(r[id_col], list(r[vec_col])) for r in rows], cents, nprobe
    )


def op_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized ANN probe against the persisted serving table: int8
    candidate scan with asymmetric cosine, exact re-rank of the top-3k
    shortlist on full vectors (operators/similarity.py:ivf_sq8_topk).
    The serving table is bucketed by cluster and the probe pushes its
    driver-literal probe assignments (the query-router shape), so
    the scan reads only the probed buckets
    (SelectedBucketsCount, plan-gated — round-11 VERDICT #2). Times the
    amortized PROBE cost — the serving-table compact is the one-time
    artifact build, the same accounting as op_substr_search's posting
    index and op_ivf_topk's centroid cache."""
    serving, cents, _n = _sq8_serving_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_sq8_topk(
        queries,
        emb,
        cents,
        k=10,
        nprobe=8,
        serving=serving,
        probe_assignments=_probe_assignments(queries, cents, nprobe=8),
    )


# probe/bench name -> (builder, input table for rows/sec accounting)
RAW_OPS = {
    "op_minhash_lsh_pairs": (op_minhash_lsh_pairs, "documents"),
    "op_embedding_lsh_pairs": (op_embedding_lsh_pairs, "embeddings"),
    "op_components_lsh": (op_components_lsh, "embeddings"),
    "op_lsh_topk": (op_lsh_topk, "embeddings"),
    "op_ivf_topk": (op_ivf_topk, "embeddings"),
    "op_ivf_sq8_topk": (op_ivf_sq8_topk, "embeddings"),
    "op_ivf_pq_topk": (op_ivf_pq_topk, "embeddings"),
}


def _parallel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the partition count a real deployment's scan would
    have (the testdata table is ONE parquet file -> one partition, which
    would time the scheduler, not the operator). The operators stay
    zero-extra-shuffle — the repartition lives HERE, in the probe/bench
    builder; shared implementation in sources/star.py:spread_to_cores."""
    from ..sources.star import spread_to_cores

    return spread_to_cores(load_table(spark, sf_dir, "documents"))


def op_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text

    return text.repetition_metrics(_parallel_docs(spark, sf_dir))


def op_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text

    docs = _parallel_docs(spark, sf_dir)
    return text.decontaminate(
        docs.filter(F.col("doc_id") % 37 != 0),
        docs.filter(F.col("doc_id") % 37 == 0),
        n=5,
    )


RAW_OPS.update(
    {
        # round-4 text-curation operators: per-doc cost must stay flat
        # with corpus growth (repetition is a zero-shuffle projection;
        # decontamination is a broadcast join over the benchmark grams)
        "op_text_repetition": (op_text_repetition, "documents"),
        "op_decontaminate": (op_decontaminate, "documents"),
    }
)


def op_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text
    from ..operators.curation import hash_bucket

    docs = _parallel_docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id").cast("string"))
    return text.ngram_lm_score(docs.filter(b >= 20), docs.filter(b < 20), k=0.5)


# bloom bitmaps are the OFFLINE index step (built once per benchmark
# release, reused by every training shard) — cached per sf_dir and
# excluded from query timing, same accounting as the IVF centroids.
_BLOOM_BITMAPS: dict[str, bytes] = {}


def _bloom_bitmap(spark: SparkSession, sf_dir: str, docs: DataFrame) -> bytes:
    """The offline benchmark bitmap (doc_id % 37 == 0 holdout, 5-grams),
    built once per sf_dir — ONE definition of the cache-key contract so
    every op sharing _BLOOM_BITMAPS decontaminates against the same
    gram set (round-9 review #3)."""
    from ..operators import text

    if sf_dir not in _BLOOM_BITMAPS:
        _BLOOM_BITMAPS[sf_dir] = text.bloom_build(
            docs.filter(F.col("doc_id") % 37 == 0), n=5
        )
    return _BLOOM_BITMAPS[sf_dir]


def op_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text

    docs = _parallel_docs(spark, sf_dir)
    bitmap = _bloom_bitmap(spark, sf_dir, docs)
    return text.decontaminate_bloom(
        docs.filter(F.col("doc_id") % 37 != 0), bitmap, n=5
    )


def op_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    docs = _parallel_docs(spark, sf_dir)
    return dedup.incremental_exact(
        docs.filter(F.col("doc_id") % 3 != 0), docs.filter(F.col("doc_id") % 3 == 0)
    )


def op_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kmeans scale path of semantic dedup: sqrt(n) IVF centroids
    (offline, cached) + GEMM cluster assignment + within-cluster
    dominance prune."""
    from ..operators import dedup

    if sf_dir not in _IVF_CENTROIDS:
        emb = load_table(spark, sf_dir, "embeddings")
        _IVF_CENTROIDS[sf_dir] = similarity.ivf_build(emb, k=None, iters=2)
    emb = load_table(spark, sf_dir, "embeddings")
    assignment = similarity.assign_clusters(
        emb.select("vec_id", "embedding"), _IVF_CENTROIDS[sf_dir], "embedding"
    ).select("vec_id", F.col("cluster").alias("cluster_id"))
    return dedup.semantic_prune(emb, assignment, threshold=0.3)


RAW_OPS.update(
    {
        # round-5 operators: LM scoring and bloom decontamination are
        # scan-speed per-doc paths (one gram shuffle / zero shuffle
        # before the doc agg); incremental dedup is the delta-refresh
        # join; semantic prune is cluster-bounded quadratic.
        "op_lm_score": (op_lm_score, "documents"),
        "op_bloom_decontaminate": (op_bloom_decontaminate, "documents"),
        "op_incremental_exact": (op_incremental_exact, "documents"),
        "op_semantic_prune": (op_semantic_prune, "embeddings"),
    }
)


# BPE merge tables are the OFFLINE training step (learned once per
# corpus release) — cached per sf_dir, excluded from apply timing.
_BPE_MERGES: dict[str, list] = {}


def op_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import tokenize

    docs = _parallel_docs(spark, sf_dir)
    if sf_dir not in _BPE_MERGES:
        _BPE_MERGES[sf_dir] = tokenize.bpe_train(
            docs, num_merges=200, sample_pct=20
        )
    return tokenize.bpe_apply(docs, _BPE_MERGES[sf_dir]).select(
        "doc_id", "n_bpe_tokens"
    )


RAW_OPS.update(
    {
        # round-5: frozen-merge BPE tokenization — zero shuffle, one
        # Arrow crossing with a per-batch word cache
        "op_bpe_apply": (op_bpe_apply, "documents"),
    }
)


# Media payload synthesis is the FIXTURE step (a real deployment reads
# payloads from the object store) — served from the shared write-once
# per-(sf_dir, codec) cache (sources/media_fixtures.py, round-9
# consolidation of the round-4 fixture-vs-operator accounting), so the
# probe times the DECODERS, not the synthesizers. The benched workload
# keeps the original five codecs — jpeg420 payloads (cached for the
# corpus entry) are deliberately NOT added here, which would silently
# grow the anchored op_media_decode workload.


def _media_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.media_fixtures import media_payloads_union

    return media_payloads_union(
        spark, sf_dir, ("bmp", "png", "jpeg", "wav", "avi")
    )


def op_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode throughput across all five REAL codecs: sniffing image
    decode+resize (BMP/PNG/JPEG), WAV feature extraction, AVI keyframe
    sampling — one row per decoded artifact, payloads from the cached
    media source."""
    from ..operators.multimodal import (
        decode_audio_features,
        decode_resize,
        sample_video_frames,
    )

    media = _media_source(spark, sf_dir)
    images = decode_resize(
        media.filter(F.col("modality") == "image"), max_side=32, decoder="auto"
    ).select("doc_id")
    audio = decode_audio_features(media.filter(F.col("modality") == "audio")).select(
        "doc_id"
    )
    video = sample_video_frames(media.filter(F.col("modality") == "video")).select(
        "doc_id"
    )
    return images.unionByName(audio).unionByName(video)


RAW_OPS.update({"op_media_decode": (op_media_decode, "documents")})


def op_canonical_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END scale dedup pipeline a 100 TB corpus actually
    runs: MinHash-LSH candidate pairs over the full document set (no
    doc_id<200 oracle cap, no exact-Jaccard-vs-everything fixture) ->
    connected components -> quality-argmax canonical survivor per
    component. The dedup_canonical corpus entry pins the SELECTION
    semantics against DuckDB on the exact pair graph; this composition
    is the same policy on the LSH scale path, probed for throughput at
    every sf (scripts/scale_probe.py)."""
    from ..operators import text

    docs = _parallel_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(docs, verify_threshold=0.5)
    return dedup.canonical_keep(docs, pairs, text.quality_score("text"))


RAW_OPS.update({"op_canonical_pipeline": (op_canonical_pipeline, "documents")})


def op_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import events as ev_ops

    return ev_ops.funnel(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def op_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import events as ev_ops

    return ev_ops.retention_cohorts(load_table(spark, sf_dir, "events"))


RAW_OPS.update(
    {
        "op_funnel": (op_funnel, "events"),
        "op_retention": (op_retention, "events"),
    }
)


def op_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_ops
    from .llm_ops import _BM25_QUERIES

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "query_text"])
    return text_ops.bm25_topk(docs, queries, k=10)


def op_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full documents table (no doc_id cap): the corpus-entry cap exists
    # for the O(n^2)-candidate oracle, not the operator; the raw path
    # prunes hot fingerprints so candidate volume stays near-linear
    return dedup.winnow_overlap_pairs(
        _parallel_docs(spark, sf_dir), threshold=0.5, max_fp_df=64
    )


def op_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers

    li = load_table(spark, sf_dir, "lineitem")
    reg = hll_registers(li, "l_orderkey", m=1024, group_cols=("l_returnflag",))
    return hll_estimate(reg, m=1024, group_cols=("l_returnflag",))


def op_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.excise_duplicate_spans(_parallel_docs(spark, sf_dir))


def op_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile throughput: HDR register build (one
    map-side-combinable agg over lineitem price cents) + the bounded
    quantile walk — the no-global-sort distribution-telemetry path."""
    from ..operators.sketch import hdr_quantiles, hdr_registers

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("v")
    )
    reg = hdr_registers(li, "v", ["l_returnflag"])
    return hdr_quantiles(reg, ["l_returnflag"])


RAW_OPS.update(
    {
        "op_bm25_topk": (op_bm25_topk, "documents"),
        "op_winnow_pairs": (op_winnow_pairs, "documents"),
        "op_hll_distinct": (op_hll_distinct, "lineitem"),
        "op_span_excise": (op_span_excise, "documents"),
        "op_hdr_quantiles": (op_hdr_quantiles, "lineitem"),
    }
)


def op_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL training-corpus curation story, end to end — the
    composition a 100 TB pretraining pipeline actually runs, probed
    for throughput at every sf (scripts/scale_probe.py; probe-only,
    not bench-gated — the per-stage operators carry the anchors):

      1. quality gate        zero-shuffle projection (text.quality_score)
      2. exact dedup         one md5-key shuffle (drop_exact_dups)
      3. near-dup canonical  MinHash-LSH pairs -> components ->
                             quality-argmax survivor (canonical_keep),
                             iteration over pair ENDPOINTS only
      4. decontamination     broadcast Bloom bitmap of benchmark grams
                             (offline-built, cached like IVF/BPE)
      5. split + accounting  content-addressed train/val/test stamp,
                             per-split doc + token totals

    Every stage's SEMANTICS is independently driver-oracled by its own
    corpus entry (text_quality, dedup_exact_groups, dedup_canonical,
    text_bloom_decontaminate, curation_splits); this composition
    answers the remaining question — does the whole chain hold its
    shape when the stages feed each other — with a measured number.
    Output: one row per split (split, n_docs, n_tokens, n_flagged).
    """
    from ..operators import text
    from ..operators.curation import assign_split

    docs = _parallel_docs(spark, sf_dir)
    bitmap = _bloom_bitmap(spark, sf_dir, docs)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)

    kept = corpus.filter(text.quality_score("text") > 0.2)
    kept = dedup.drop_exact_dups(kept)
    pairs = dedup.minhash_lsh_pairs(kept, verify_threshold=0.5)
    decision = dedup.canonical_keep(kept, pairs, text.quality_score("text"))
    survivors = kept.join(
        decision.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    flags = text.decontaminate_bloom(survivors, bitmap, n=5)
    # flagged docs are EXCLUDED from the final corpus but COUNTED per
    # split — the accounting the docstring promises (n_flagged), so
    # the flag information survives into the output
    stamped = assign_split(
        survivors.join(flags.select("doc_id", "flagged"), "doc_id"), "doc_id"
    )
    return (
        stamped.groupBy("split")
        .agg(
            F.sum(F.when(~F.col("flagged"), 1).otherwise(0)).alias("n_docs"),
            F.sum(
                F.when(~F.col("flagged"), text.token_count("text")).otherwise(0)
            ).alias("n_tokens"),
            F.sum(F.when(F.col("flagged"), 1).otherwise(0)).alias("n_flagged"),
        )
        .orderBy("split")
    )


RAW_OPS.update({"op_curation_pipeline": (op_curation_pipeline, "documents")})

def _lsh_pair_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SCALE path for graph construction: LSH-blocked candidates,
    # exact-verified — never the O(n^2) oracle-parity cross join
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_cosine_pairs_lsh(emb, dim=64, threshold=0.3)


def op_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    return graph.pagerank_portable(_lsh_pair_graph(spark, sf_dir))


def op_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    return graph.triangle_counts(_lsh_pair_graph(spark, sf_dir))


def op_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_ops import _noisy_vocab

    return dedup.edit_distance_pairs(
        _noisy_vocab(_parallel_docs(spark, sf_dir)), word_col="w"
    )


def op_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as text_ops
    from .llm_ops import _BM25_QUERIES

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "query_text"])
    return text_ops.rrf_fuse(
        [
            text_ops.bm25_topk(docs, queries, k=20),
            text_ops.tfidf_query_topk(docs, queries, k=20),
        ],
        topk=10,
    )


RAW_OPS.update(
    {
        "op_pagerank": (op_pagerank, "embeddings"),
        "op_triangles": (op_triangles, "embeddings"),
        "op_edit_pairs": (op_edit_pairs, "documents"),
        "op_rrf_fuse": (op_rrf_fuse, "documents"),
    }
)


def op_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation sketch at corpus scale: per-event-type k-min
    samples over user_id, then pairwise union/intersection/Jaccard
    estimates between event types — audience-overlap without a
    corpus-sized set intersection. The only corpus-sized work is the
    distinct + two-level shard-tree bottom-k inside kmv_sample; every
    overlap join runs on frames bounded at groups * k rows."""
    from ..operators.sketch import kmv_overlap, kmv_sample

    events = load_table(spark, sf_dir, "events")
    sample = kmv_sample(events, "user_id", k=256, group_cols=("event_type",))
    return kmv_overlap(sample, "event_type", k=256)


RAW_OPS.update({"op_kmv_overlap": (op_kmv_overlap, "events")})


_TRIGRAM_CACHE_VERSION = "v2"  # v2: bucketed-by-gram external table
# Bucket count is part of the on-disk layout (bucket ids live in the
# file names), so it is baked into the cache path/table tag — changing
# it can never mis-read files written under the old count. 256 keeps a
# typical query's gram list (tens of grams) touching a MINORITY of
# buckets — e.g. the 60-gram bench pattern set expects ~57/256 buckets
# scanned (1 - (255/256)^60 per bucket), ~78% of the posting table
# skipped before any IO; at 100 TB the count scales with data while a
# probe still reads O(|query grams|) buckets.
_TRIGRAM_BUCKETS = 256


def _trigram_index_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-once persisted trigram posting index per sf_dir, stored
    as an EXTERNAL table CLUSTERED BY (gram) SORTED BY (gram) — the
    layout the 100 TB story needs (round-9 VERDICT #6): a literal
    gram IN-filter then prunes whole buckets at the scan
    (SelectedBucketsCount in the plan, the point_lookup gate) and the
    in-bucket sort gives tight parquet row-group min/max stats, so a
    probe reads O(matching buckets), not the whole posting table.
    Building the index is the ONE-TIME cost a deployment amortizes
    across query batches — measured at sf0.1: build 6.8 s vs 1.1 s
    for a single direct scan; op_substr_search times the amortized
    PROBE cost, which is the recurring number.

    Cross-process reuse: the bucket spec lives in the session catalog
    (in-memory, per process), but the DATA is at a pinned external
    LOCATION whose bucket ids are encoded in the file names, so a new
    process re-registers the same spec over the existing files with
    one DDL statement and pruning works immediately — no rebuild, no
    rewrite.

    Publication is ATOMIC (the media_fixtures/v1 contract the first
    v2 draft dropped — review catch): the build writes through a
    throwaway table at a uuid tmp location, then os.rename()s the
    whole directory to the pinned path. Two processes building
    concurrently each write their own tmp dir; the rename loser (the
    path already exists) discards its copy and reads the winner's —
    identical content, deterministic build. A non-atomic
    mode('overwrite').insertInto against the SHARED location would
    instead let the second builder's pre-write delete yank files a
    concurrent reader already listed (FileNotFoundException, or a
    silently incomplete probe under ignoreMissingFiles)."""
    import os
    import shutil
    import uuid

    from ..operators import text as text_ops

    # _cache_tag sanitizes for the unquoted CREATE TABLE and md5-pins
    # the raw corpus path (round-10 ADVICE: a sanitization collision
    # would let one corpus silently probe the other's postings,
    # failing the all-grams candidate test without error)
    tag = _cache_tag(f"{_TRIGRAM_CACHE_VERSION}_b{_TRIGRAM_BUCKETS}", sf_dir)
    tbl = f"trigram_postings_{tag}"
    loc = f"/tmp/spark_graft_trigram_{tag}"
    ddl = (
        # IF NOT EXISTS: atomic catalog registration (same race as the
        # ANN serving tables — second-pass round-12 review)
        "CREATE TABLE IF NOT EXISTS {name} (doc_id BIGINT, gram STRING) USING parquet "
        f"CLUSTERED BY (gram) SORTED BY (gram) "
        f"INTO {_TRIGRAM_BUCKETS} BUCKETS LOCATION '{{loc}}'"
    )

    def _built() -> bool:
        return os.path.isfile(os.path.join(loc, "_SUCCESS"))

    if not _built():
        nonce = uuid.uuid4().hex
        tmp_tbl = f"{tbl}_build_{nonce[:8]}"
        tmp_loc = f"{loc}.tmp-{nonce}"
        spark.sql(ddl.format(name=tmp_tbl, loc=tmp_loc))
        try:
            docs = load_table(spark, sf_dir, "documents")
            text_ops.trigram_postings(docs).select(
                F.col("doc_id").cast("long"), "gram"
            ).write.mode("overwrite").insertInto(tmp_tbl)
            # shared publish+verify protocol (raises if no complete
            # artifact ends up at loc — race loser is fine, a failed
            # rename with no winner is not)
            _publish_cache_dir(tmp_loc, loc, "_SUCCESS")
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")  # external: keeps files
            shutil.rmtree(tmp_loc, ignore_errors=True)
    if not spark.catalog.tableExists(tbl):
        spark.sql(ddl.format(name=tbl, loc=loc))
    return spark.table(tbl)


def op_substr_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-blocked grep through the INDEX path against the
    persisted BUCKETED posting table: the literal query-gram IN-list
    prunes posting buckets at the scan (SelectedBucketsCount — round-9
    VERDICT #6), the broadcast query-gram join prunes the remainder,
    then all-grams candidate test + contains() verify on candidates
    only. The index build is the cached one-time cost
    (_trigram_index_cached); the direct-scan path (no index — the
    right plan for one ad-hoc batch) is plan-gated and value-pinned
    in tests. The prune list is derived MECHANICALLY from the same
    pattern literals that build the patterns frame (the completeness
    contract on scan_prune_grams)."""
    from ..operators import text as text_ops
    from .llm_ops import _SUBSTR_PATTERNS

    docs = load_table(spark, sf_dir, "documents")
    pats = spark.createDataFrame(_SUBSTR_PATTERNS, ["pattern_id", "pattern"])
    grams = sorted(
        {p[i : i + 3] for _, p in _SUBSTR_PATTERNS for i in range(len(p) - 2)}
    )
    return text_ops.substring_search(
        docs,
        pats,
        postings=_trigram_index_cached(spark, sf_dir),
        scan_prune_grams=grams,
    )


RAW_OPS.update({"op_substr_search": (op_substr_search, "documents")})


def op_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side z-order layout cost minus the IO: Morton key
    projection (pure integer codegen), the sampled RangePartitioning
    exchange, the in-partition sort, and a per-output-file summary
    (min/max z-range + row count — the file-stat footprint a reader
    would prune on). Everything but the parquet encode of a real
    OPTIMIZE ZORDER BY pass."""
    from ..operators.layout import zorder_layout

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2048).cast("int").alias("x"),
        (F.col("event_id") % 2048).cast("int").alias("y"),
    )
    laid = zorder_layout(ev, ["x", "y"], bits=11, n_files=32)
    return (
        laid.groupBy(F.spark_partition_id().alias("file_id"))
        .agg(
            F.min("z_key").alias("z_min"),
            F.max("z_key").alias("z_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("file_id")
    )


RAW_OPS.update({"op_zorder_layout": (op_zorder_layout, "events")})


def op_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level collocation mining at scale: top-50 adjacent word
    pairs by lift (monotone PMI) with a count-5 floor. Two map-side-
    combinable corpus aggs onto vocabulary-bounded frames, two
    unigram joins, TakeOrdered top-k; the rank window runs on the
    50-row survivor frame only."""
    from ..operators import text as text_ops

    return text_ops.collocation_topk(
        _parallel_docs(spark, sf_dir), min_count=5, topk=50
    )


RAW_OPS.update({"op_collocations": (op_collocations, "documents")})


def op_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peeling over the LSH pair graph — the scale
    path for core extraction: corpus-oracled in the dedup_components
    gauntlet, scale-probed via RAW_OPS, gated in the bench HEADLINE
    since the r10b anchor block. Each round is two
    alive-set equi-joins + one map-side-combinable degree agg over
    O(|E|) (long, long) rows."""
    from ..operators import graph

    return graph.kcore_nodes(_lsh_pair_graph(spark, sf_dir), k=2, rounds=3)


RAW_OPS.update({"op_kcore": (op_kcore, "embeddings")})


def op_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted top-k corpus sampling at scale (DLT priority sampling,
    operators/curation.py:priority_sample, k=1000): one 4-column
    pruned scan (never text) -> JVM priority projection ->
    TakeOrderedAndProject per-partition heaps, then windows over the
    bounded 1001-row survivor frame only. Wall time should track the
    narrow scan, flat per doc as the corpus grows."""
    from ..operators.curation import priority_sample
    from ..sources.star import spread_to_cores

    docs = spread_to_cores(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
    )
    return priority_sample(docs, weight_col="n_chars", k=1000, key_col="doc_id")


RAW_OPS.update({"op_priority_sample": (op_priority_sample, "documents")})


def op_mg_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over the corpus token stream
    (operators/sketch.py:mg_heavy_hitters, k=30): one bounded Arrow
    kernel pass (<= k+1 summary rows per batch) + one map-side-
    combinable counter-sum shuffle — the O(k)-state alternative to the
    vocabulary-sized exact term table. Corpus-oracled as the mg_heavy
    row group of text_lm_perplexity."""
    from ..operators import text as text_ops
    from ..operators.sketch import mg_heavy_hitters

    toks = _parallel_docs(spark, sf_dir).select(
        F.explode(text_ops.tokens_expr("text")).alias("w")
    )
    return mg_heavy_hitters(toks, "w", 30)


RAW_OPS.update({"op_mg_heavy": (op_mg_heavy, "documents")})


def op_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-grain sketch rollup at scale: per-(day,
    hour) HLL register partials over events users, MAX-merged to
    per-day registers and priced (operators/sketch.py:hll_registers /
    hll_estimate). Two map-side-combinable hash aggs — the raw events
    scan happens ONCE, at the finest grain; every coarser grain is a
    groupBy max over the bounded register table. Corpus-oracled as the
    hll_rollup row groups of agg_approx_distinct (hourly->daily proven
    equal to direct daily, cross-engine)."""
    from ..operators.sketch import hll_estimate, hll_merge_registers, hll_registers
    from ..sources.star import spread_to_cores

    ev = spread_to_cores(
        load_table(spark, sf_dir, "events").select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hr"),
        )
    )
    hr_reg = hll_registers(ev, "user_id", m=1024, group_cols=("day", "hr"))
    day_reg = hll_merge_registers(hr_reg, group_cols=("day",))
    return hll_estimate(day_reg, m=1024, group_cols=("day",))


RAW_OPS.update({"op_hll_rollup": (op_hll_rollup, "events")})
