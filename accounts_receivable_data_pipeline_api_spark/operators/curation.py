"""Dataset-curation operators ([EXT] north star): chunking,
deterministic sampling, split assignment.

The building blocks between raw documents and training batches. All
pure JVM expressions (sequence/substring/md5 — no Python), and all
deterministic by CONTENT or KEY, never by partition layout or RNG:
a re-run, a retry, or a different cluster size yields byte-identical
samples and splits, which is what makes dataset versions reproducible.

Hash-bucket idiom: bucket(x) = first 8 hex chars of md5(x) as an int,
mod 100 — portable (DuckDB: CAST('0x' || substr(md5(x),1,8) AS BIGINT)),
uniform, and stable across engines, so even sampling is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5 content."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    pct: int,
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose key hashes into the first ``pct`` of ``buckets``
    — a deterministic ~pct% sample. Unlike df.sample(), the selected set
    is a pure function of the keys: stable across runs, partitionings,
    and engines, and consistent BETWEEN tables sharing the key (sampling
    documents and their embeddings by the same id keeps them aligned).
    """
    return df.filter(hash_bucket(F.col(key_col).cast("string"), buckets) < pct)


def assign_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    out_col: str = "split",
) -> DataFrame:
    """Stamp a train/val/test split column from the key hash: buckets
    [0, val_pct) -> 'val', [val_pct, val_pct+test_pct) -> 'test', rest
    -> 'train'. Content-addressed: a document keeps its split forever,
    across reshuffles and incremental refreshes — no leakage when the
    corpus grows.
    """
    b = hash_bucket(F.col(key_col).cast("string"))
    return df.withColumn(
        out_col,
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .otherwise("train"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into overlapping character chunks:
    (doc_id, chunk_idx, chunk_start, chunk_text).

    Stride = chunk_chars - overlap; the final partial chunk is kept.
    sequence+explode+substring — the chunking fan-out happens inside the
    scan stage (no shuffle), so at corpus scale it is bounded by write
    throughput, not by a repartition.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(F.col(text_col)) - overlap, F.lit(1)),
        F.lit(stride),
    )
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.substring(F.col(text_col), F.col("chunk_start"), chunk_chars).alias(
                "chunk_text"
            ),
        )
        .filter(F.length("chunk_text") > 0)
    )


def pack_batches(
    chunks: DataFrame,
    token_col: str,
    budget: int,
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    out_col: str = "batch_id",
    shard_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign chunks to training batches under a token budget:
    batch_id = floor(exclusive-prefix-sum(tokens) / budget) over a
    PINNED order.

    Deterministic bin assignment (same inputs => same batches — the
    reproducibility requirement for dataset versioning).

    ``shard_cols`` is the scale switch. Empty: one global prefix sum —
    a single-partition window, acceptable only for bounded frames (one
    epoch shard, a debugging run). Non-empty: the window PARTITIONS on
    the shard key, so prefix sums run in parallel across shards and no
    task ever sees more than one shard — the 100 TB shape (shard by
    split or a hash bucket of the document id; batch_id is then scoped
    per shard, and (shard, batch_id) is the global batch key). Shard
    assignment should itself be content-addressed (hash_bucket) so the
    whole packing stays reproducible across cluster sizes. Plan shape
    (no single-partition exchange in the sharded form) is asserted in
    tests/test_plans.py.
    """
    base = Window.partitionBy(*shard_cols) if shard_cols else Window
    w = base.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return chunks.withColumn(out_col, F.floor(prefix / budget).cast("bigint"))


def quota_sample(
    df: DataFrame,
    group_cols: tuple[str, ...],
    quota: int,
    key_col: str,
    rank_col: str = "sample_rank",
    skew_safe: bool = False,
) -> DataFrame:
    """Cap rows per group at ``quota`` deterministically — the
    per-domain / per-language quota a curation pipeline applies so no
    single source dominates the training mix.

    Selection is content-addressed: rows are ranked inside each group
    by md5(key) (key ascending as total tie-break), so the kept set is
    a pure function of the data — stable across runs, partitionings,
    and engines — and UNBIASED within the group (hash order is
    uncorrelated with any data attribute, unlike 'first N by id').

    Plan shape at 100 TB: one shuffle on the group key + per-partition
    window rank. Group count is bounded (domains/languages), but a hot
    group lands on one task; pass ``skew_safe=True`` when a single
    group's rows exceed an executor's partition budget — the two-stage
    variant below keeps the result EXACTLY identical with no hot task.

    skew_safe=True plan (classic two-stage top-k per group): stage 1
    ranks within (group, input-partition-id) — a key space as wide as
    the scan, so no task ever sees more than one partition's share of a
    hot group — and keeps each subgroup's local top-quota, a provable
    superset of the group's global top-quota (any row in the global
    top-quota is also in the top-quota of whatever subgroup it landed
    in). Stage 2 re-ranks the survivors (at most quota * n_partitions
    rows per group) with the plain window. The final result is a pure
    function of the data (the pid column only partitions stage-1 work;
    any assignment yields the same stage-2 input superset), asserted
    equal to the one-stage path in tests.
    """
    order_key = F.md5(F.col(key_col).cast("string"))
    if skew_safe:
        w1 = Window.partitionBy(
            *[F.col(c) for c in group_cols], F.col("_pid")
        ).orderBy(order_key, F.col(key_col))
        df = (
            df.withColumn("_pid", F.spark_partition_id())
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= quota)
            .drop("_pid", "_r1")
        )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        order_key, F.col(key_col)
    )
    return df.withColumn(
        rank_col, F.row_number().over(w).cast("bigint")
    ).filter(F.col(rank_col) <= quota)


def assemble_batches(
    packed: DataFrame,
    text_col: str = "chunk_text",
    token_col: str = "n_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    batch_cols: tuple[str, ...] = ("batch_id",),
    sep: str = "",
) -> DataFrame:
    """Materialize training text per batch: concatenate each batch's
    chunks in the PINNED pack order (the same order_cols pack_batches
    used) into one training sequence, with the chunk/token counts a
    data-loader manifest needs.

    One row per batch: (batch_cols..., batch_text, n_chunks,
    sum_tokens). Deterministic despite collect_list's arrival-order
    nondeterminism: the list collects (order_cols..., text) STRUCTS and
    array_sort orders them by the struct fields before concat — the
    result is a pure function of the data, never of partition layout.

    Plan shape at 100 TB: one shuffle on the batch key (map-side
    combinable collect_list partials); batch size is bounded by the
    pack budget, so no group outgrows a task. This is the final hop of
    the chunk -> pack -> assemble pipeline that turns a document corpus
    into loader-ready sequences.
    """
    struct_cols = [F.col(c) for c in order_cols] + [F.col(text_col).alias("__t")]
    tok = F.col(token_col)
    return (
        packed.groupBy(*[F.col(c) for c in batch_cols])
        .agg(
            F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("__chunks"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(tok).cast("bigint").alias("sum_tokens"),
        )
        .select(
            *batch_cols,
            F.concat_ws(
                sep, F.transform(F.col("__chunks"), lambda s: s["__t"])
            ).alias("batch_text"),
            "n_chunks",
            "sum_tokens",
        )
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    total: int,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain-mixture sampling: pick ~``total`` rows
    with per-group quotas proportional to n_g^alpha — the standard
    mixture-reweighting recipe for assembling a training set from
    skewed sources (alpha < 1 upsamples small domains relative to their
    natural share; alpha = 1 is proportional; alpha = 0 is uniform
    across groups).

    Quotas use largest-remainder apportionment so they sum exactly to
    ``total`` (when the corpus has enough rows): quota_g =
    floor(total * w_g) plus one for the groups with the largest
    fractional remainders (ties break by group name ascending). A group
    smaller than its quota contributes all its rows — the result is
    then < total, never padded. Selection inside a group is
    content-addressed md5(key) rank, unbiased and engine-portable (same
    idiom as quota_sample).

    Determinism: alpha = 0.5 (the default and the oracle-pinned value)
    uses IEEE sqrt — correctly rounded, bit-identical across engines;
    other alphas go through pow(), which libm does NOT guarantee
    correctly rounded, so cross-engine checks pin 0.5. Weight terms are
    rounded to 6 dp and the weight denominator sums through
    DECIMAL(28,6) (order-free); remainders/floors are then plain IEEE
    double ops — identical in any engine.

    Plan shape at 100 TB: the group stats are one map-side-combinable
    agg over a BOUNDED key space (domains/languages); the quota table
    is a broadcast join back onto the ranked rows (one shuffle on the
    group key for the rank window — quota_sample's skew_safe two-stage
    variant applies verbatim when a single group outruns a task). The
    quota computation's unpartitioned window runs over the GROUP table
    (bounded rows), not the corpus.
    """
    if alpha == 0.5:
        weight = F.round(F.sqrt(F.col("n").cast("double")), 6)
    else:
        weight = F.round(F.pow(F.col("n").cast("double"), F.lit(float(alpha))), 6)
    stats = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n")
    ).select("grp", "n", weight.alias("sg"))
    denom = stats.agg(
        F.sum(F.col("sg").cast("decimal(28,6)")).cast("double").alias("s_total")
    )
    raw = F.lit(int(total)) * F.col("sg") / F.col("s_total")
    q0 = stats.crossJoin(F.broadcast(denom)).select(
        "grp",
        F.floor(raw).alias("q0"),
        (raw - F.floor(raw)).alias("rem"),
    )
    deficit = q0.agg((F.lit(int(total)) - F.sum("q0")).cast("bigint").alias("deficit"))
    w_rem = Window.orderBy(F.col("rem").desc(), F.col("grp"))
    quotas = (
        q0.crossJoin(F.broadcast(deficit))
        .withColumn("_rk", F.row_number().over(w_rem))
        .select(
            "grp",
            (
                F.col("q0") + F.when(F.col("_rk") <= F.col("deficit"), 1).otherwise(0)
            ).cast("bigint").alias("quota"),
        )
    )
    order_key = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order_key, F.col(key_col))
    ranked = df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
    return (
        ranked.join(
            F.broadcast(quotas), ranked[group_col] == quotas["grp"], "inner"
        )
        .filter(F.col("sample_rank") <= F.col("quota"))
        .drop("grp")
    )


def shard_order(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "42",
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global
    sort: shard = md5(seed:key) bucket, position-in-shard = md5 rank
    within the shard. Together (shard, pos) define a reproducible
    pseudo-random total order over the corpus — the order a data
    loader consumes — as a pure function of (data, seed): re-runs,
    retries, and different cluster sizes yield the identical order,
    and changing the seed gives an independent permutation per epoch.

    Plan shape at 100 TB: one shuffle on the shard key + per-shard
    window rank. No global sort and no single-partition window: shards
    are uniform md5 buckets, so every task gets ~1/n_shards of the
    corpus regardless of data skew. n_shards sizes to the number of
    output files the loader wants (thousands at corpus scale — each
    shard's rank window then fits one task comfortably).
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).alias(shard_col)
    out = df.withColumn(shard_col, shard)
    w = Window.partitionBy(shard_col).orderBy(h, F.col(key_col))
    return out.withColumn(pos_col, F.row_number().over(w).cast("bigint"))


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Weighted sample of ``k`` rows WITHOUT replacement via PRIORITY
    SAMPLING (Duffield, Lund & Thorup, JACM 2007): each row gets a
    deterministic uniform u in (0, 1] from md5(key) and a priority
    q = w / u; the sample is the top-``k`` rows by q, and the (k+1)-th
    priority tau turns the sample into an UNBIASED subset-sum
    estimator — for any predicate P,

        E[ sum_{sampled i in P} max(w_i, tau) ] = sum_{i in P} w_i,

    which is what makes a weighted corpus sample auditable: the sample
    alone estimates how many chars/tokens of any slice (language,
    source, quality band) the full corpus holds. Inclusion probability
    is min(1, w_i / tau) — proportional to weight for the long tail,
    capped at 1 for dominant rows — and among all threshold schemes
    priority sampling has near-optimal subset-sum variance (DLT prove
    it needs at most one extra sample vs the optimal scheme).

    Why this scheme and not Efraimidis-Spirakis (keys u^(1/w)): the ES
    key needs pow/exp — transcendentals with no cross-engine rounding
    contract. The DLT priority is ONE IEEE division on top of the
    md5-uniform (itself exact: (h + 1) / 2^32 with h a 32-bit integer,
    the divide by a power of two exact), so every priority, tau, and
    weight estimate is bit-identical in any IEEE engine — the whole
    sample is hash-checkable, like the KMV bottom-k it structurally
    mirrors.

    Determinism: u is content-addressed (md5 of salt || key), so the
    sampled SET is a pure function of the data — stable across runs,
    partition layouts, and engines; ties in q (md5-prefix collisions)
    break by key ascending, making the selection a total order.
    ``salt`` selects among independent deterministic samples (each
    salt is a fresh u-assignment) — unbiasedness is tested by
    averaging estimates across salts, and a pipeline that wants a
    different-but-reproducible draw per release names the release in
    the salt.

    Non-positive/NULL weights AND NULL keys raise IN-PLAN (sampling
    must not silently drop or nondeterministically rank rows the
    caller believes are eligible: md5(NULL) = NULL would sort a
    NULL-key row last regardless of weight — its weight silently
    vanishing from every estimate — and NULL breaks the key
    tie-break's total order; filter first if such rows are expected).

    Plan shape at 100 TB: the priority is a scalar projection on the
    scan; the top-(k+1) is TakeOrderedAndProject — per-partition
    top-(k+1) heaps merged on the driver, NO global sort, no shuffle
    of the corpus — and everything after (rank, tau, estimates) runs
    as one window pass over the bounded (k+1)-row survivor frame.
    Merge law: priorities are row-local, so the top-(k+1) of a union
    equals the top-(k+1) of per-shard top-(k+1) partials — the same
    idempotent bottom-k algebra as kmv_sample, proven in tests.

    Output: the input columns plus ``ps_weight`` (the weight as
    double), ``ps_priority`` (q), ``ps_tau`` (the shared threshold;
    0.0 when the population has at most k rows — the estimator is
    then exact), ``ps_est`` (max(w, tau), the Horvitz-Thompson-style
    weight estimate) and ``sample_rank`` (1..k by q desc, key asc).
    """
    if k < 1:
        raise ValueError(f"priority_sample requires k >= 1, got {k}")
    w_ok = F.when(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0),
        F.col(weight_col).cast("double"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "priority_sample: weight must be a positive non-NULL "
                f"number (column {weight_col!r}); filter or clamp "
                "ineligible rows before sampling"
            )
        ).cast("double")
    )
    k_ok = F.when(F.col(key_col).isNotNull(), F.col(key_col).cast("string")).otherwise(
        F.raise_error(
            F.lit(
                f"priority_sample: key must be non-NULL (column {key_col!r}) — "
                "a NULL key has no hash and no tie-break order; filter "
                "ineligible rows before sampling"
            )
        ).cast("string")
    )
    # u in (0, 1]: h is the first-8-hex md5 integer (32 bits); h + 1
    # keeps u strictly positive, and /2^32 is exact (power of two).
    hashed = F.md5(F.concat(F.lit(salt), k_ok)) if salt else F.md5(k_ok)
    u = (
        F.conv(F.substring(hashed, 1, 8), 16, 10).cast("long").cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    pri = df.select(
        "*",
        w_ok.alias("ps_weight"),
        (w_ok / u).alias("ps_priority"),
    )
    return priority_finalize(pri, k, key_col)


def priority_finalize(pri: DataFrame, k: int, key_col: str) -> DataFrame:
    """THE priority-sampling final selection, in one place: a frame
    carrying ``ps_weight`` / ``ps_priority`` -> top-(k+1) by
    (priority desc, key asc) -> sample_rank, the threshold ps_tau
    (row k+1's priority; 0.0 when the population has at most k rows),
    the top-k filter, and ps_est = max(w, tau). Shared by the batch
    operator above and the streaming sample reader
    (streaming/pipeline.py:read_priority_sample) so the
    rank/tau/estimator algebra cannot drift between the two (the
    mg_truncate rule). The selection is TakeOrderedAndProject; the
    windows run over the bounded (k+1)-row survivor frame only."""
    if k < 1:
        raise ValueError(f"priority_finalize requires k >= 1, got {k}")
    top = pri.orderBy(F.desc("ps_priority"), F.col(key_col).asc()).limit(k + 1)
    w_rank = Window.orderBy(F.desc("ps_priority"), F.col(key_col).asc())
    w_all = Window.partitionBy()  # bounded: <= k+1 survivor rows
    return (
        top.withColumn("sample_rank", F.row_number().over(w_rank).cast("bigint"))
        .withColumn(
            "ps_tau",
            F.max(
                F.when(F.col("sample_rank") == k + 1, F.col("ps_priority")).otherwise(
                    F.lit(0.0)
                )
            ).over(w_all),
        )
        .filter(F.col("sample_rank") <= k)
        .withColumn("ps_est", F.greatest(F.col("ps_weight"), F.col("ps_tau")))
    )


def split_leakage_report(
    splits: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Audit a train/val/test split against a near-dup pair graph: a
    pair whose endpoints land in DIFFERENT splits is leakage (the eval
    member is a near-copy of a training document, so eval measures
    memorization). assign_split's hash buckets are content-addressed
    per key but near-DUPS have different keys, so leakage is expected
    unless dedup (or canonical_keep filtering) ran BEFORE the split —
    this report is the check a release pipeline runs to prove it did.

    ``splits`` is any (id_col, split_col) frame; ``pairs`` any
    (id_a, id_b) near-dup graph (exact, minhash, simhash, or embedding
    source). Returns one row per ordered split pair with the leaking
    pair count — empty output means a clean split.

    Plan shape at 100 TB: two broadcast-or-hash joins of the pair list
    (O(dup pairs), tiny vs the corpus) against the split map, one small
    aggregate. No corpus-wide shuffle.
    """
    s = splits.select(F.col(id_col), F.col(split_col))
    sa = s.select(F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a"))
    sb = s.select(F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b"))
    return (
        pairs.select("id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaking_pairs"))
    )
