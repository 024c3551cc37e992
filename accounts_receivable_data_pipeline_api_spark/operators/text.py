"""Text-analysis operators ([EXT] north star): language ID, quality
scoring, token counting, document fingerprinting.

Everything is built from JVM-side expressions (regexp/length/split/
aggregate) — no Python UDFs — so the operators run inside whole-stage
codegen at full scan speed. That matters: at 100 TB these run on every
document in the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword-ratio
# heuristic language ID. Deliberately small and public-knowledge.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "es"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens_expr(text_col: str) -> Column:
    """Whitespace tokenization after lowercase-normalization."""
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda t: t != "",
    )


def token_count(text_col: str) -> Column:
    return F.size(tokens_expr(text_col)).cast("bigint")


def bpe_ish_token_count(text_col: str) -> Column:
    """Sub-word-ish token count: words plus digit runs plus punctuation
    marks counted separately (a cheap deterministic proxy for BPE token
    counts, useful for budget estimation at corpus scale)."""
    words = token_count(text_col)
    punct = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ).cast("bigint")
    return (words + punct).cast("bigint")


def punct_ratio(text_col: str) -> Column:
    non_alnum = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    return (
        non_alnum.cast("double")
        / F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double")
    ).cast("double")


def stopword_ratio(text_col: str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens_expr(text_col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (
        n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")
    ).cast("double")


def quality_score(text_col: str) -> Column:
    """Heuristic quality in [0,1]: rewards reasonable length and word
    shape, penalizes punctuation soup. Deterministic; thresholds are
    conventional (Gopher-style length/punct gates, public heuristics)."""
    n_tok = token_count(text_col)
    mean_word_len = (
        (F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("double"))
        / F.greatest(n_tok, F.lit(1)).cast("double")
    )
    length_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text_col) <= 0.3, 1.0).otherwise(0.0)
    return ((length_ok + word_len_ok + punct_ok) / F.lit(3.0)).cast("double")


def lang_scores(text_col: str) -> Column:
    """Map of language -> marker-hit count (the raw signal behind
    ``predict_lang``)."""
    toks = tokens_expr(text_col)
    entries = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        entries.append(F.struct(F.lit(lang).alias("lang"), hits.alias("hits")))
    return F.array(*entries)


def predict_lang(text_col: str) -> Column:
    """argmax language by marker hits; ties break to the
    lexicographically LAST language (struct max ordering — pinned,
    deterministic); zero hits -> 'und' (undetermined)."""
    scores = lang_scores(text_col)
    best = F.array_max(
        F.transform(
            scores,
            lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: str, prefix_chars: int = 256) -> Column:
    """Stable 128-bit document fingerprint: md5 over the normalized
    text (cheap rolling-hash analogue for shard-level dedup indexes)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return F.md5(F.substring(norm, 1, prefix_chars))


def analyze(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_redaction: bool = False,
) -> DataFrame:
    """One-pass text-analysis projection: all metrics as columns.

    ``include_redaction=True`` appends redact_pii's four columns
    (redacted_text, n_email, n_phone, n_ipv4) to the SAME projection —
    analysis + PII scrub in one scan pass, no second read and no join
    (the shape a curation pipeline wants: every per-doc scalar from one
    pass over the corpus).

    Tokenization and the punctuation count are materialized ONCE in an
    inner projection and shared by every metric — the naive form
    (each metric calling tokens_expr) re-ran the regex split ~6x per
    row, which Catalyst does not CSE across aliases (higher-order
    functions are CodegenFallback: an unshared argument subtree
    re-evaluates interpreted on every call).

    Measured alternatives for the 5 membership counts (sf0.1, 5000
    docs, warm): separate HOF filters over the materialized token
    column 0.256 s; one fused F.aggregate pass with a struct
    accumulator 0.243 s (~5%, not worth the opacity); per-set
    regexp_count over the normalized string 0.179 s PER SET (worse).
    The interpreted per-element cost dominates all shapes; a real step
    change needs either distinct-membership semantics (array_intersect,
    codegen) or an Arrow kernel — both rejected: the first changes the
    metric, the second adds a Python crossing to an otherwise
    scan-speed operator. The Arrow kernel was also MEASURED (round 2,
    50k docs warm): a pandas twin of just tokens/punct/stopwords runs
    0.62 s vs 1.10 s for the full JVM projection — the remaining
    metrics (4 language sets, quality, md5 fingerprint) would close
    most of that gap, so the crossing buys <20% at parity risk
    (Java vs Python regex word-class semantics). Kept JVM.
    """
    tok = tokens_expr(text_col)
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        tok.alias("_tok"),
        n_punct.cast("bigint").alias("_n_punct"),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).alias("_norm"),
    )

    n_tok = F.size("_tok").cast("bigint")
    chars = F.length(F.col(text_col))
    p_ratio = (
        F.col("_n_punct").cast("double") / F.greatest(chars, F.lit(1)).cast("double")
    ).cast("double")
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    s_ratio = (
        F.size(F.filter(F.col("_tok"), lambda t: F.array_contains(sw, t))).cast("double")
        / F.greatest(F.size("_tok"), F.lit(1)).cast("double")
    ).cast("double")
    mean_word_len = (
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double")
    )
    quality = (
        (
            F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
            + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
            + F.when(p_ratio <= 0.3, 1.0).otherwise(0.0)
        )
        / F.lit(3.0)
    ).cast("double")
    lang_entries = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(F.col("_tok"), lambda t: F.array_contains(marker_arr, t)))
        lang_entries.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*lang_entries))
    lang_pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))

    out_cols = [
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (n_tok + F.col("_n_punct")).cast("bigint").alias("n_tokens_bpe"),
        chars.cast("bigint").alias("n_chars_measured"),
        p_ratio.alias("punct_ratio"),
        s_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        F.md5(F.substring(F.col("_norm"), 1, 256)).alias("fingerprint"),
    ]
    if include_redaction:
        redacted = F.col(text_col)
        for kind, pat in PII_PATTERNS.items():
            out_cols.append(
                (F.size(F.split(F.col(text_col), pat)).cast("bigint") - 1).alias(f"n_{kind}")
            )
            redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
        out_cols.append(redacted.alias("redacted_text"))
    return staged.select(*out_cols)


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """TF-IDF top-k terms per document.

    tf = in-doc term count; idf = ln((N+1)/(df_t+1)) + 1 (smoothed);
    rank by score desc with token-asc tie-break. Scores are rounded to
    6 dp before ranking so rankings are engine-portable (ln() may differ
    in the last ulp across libm implementations).

    Plan shape (r15, guide §2.3/§2.5 + round-14 ADVICE #1): explode ->
    one hash agg (tf) -> df_t as a MAP-SIDE-COMBINABLE count agg over
    tf, joined back on token. The r14 shape computed df_t as COUNT()
    OVER (PARTITION BY token), which BUFFERS each token's full postings
    in one window task — a corpus-frequent token (stopword, df ~ N)
    creates a single hot partition of up to n_docs rows at scale, and
    AQE can split skewed JOIN partitions but never window partitions.
    The agg+join form streams: a hot token is one partial counter per
    map task, and the join side is AQE-skew-splittable. Measured
    value-identical and time-identical at sf0.1 (isolated noop A/B,
    min 0.955 vs 0.949 s over 5 interleaved rounds); the skew study
    behind it (r15): the fixture vocabulary is 31 tokens, EVERY one
    with df ~ 0.78 * n_docs, so each token-keyed window partition
    buffers ~n_docs/1.3 rows — exactly the unbounded-buffer pattern.
    Two rejected alternates, measured in the same harness: a PER-ROW
    sorted-run tf (minhash recipe, removes the (doc, token) exchange)
    cost +17% — the interpreted HOF run-length pass is slower than
    the codegen'd hash agg it replaces; an explicit repartition(token)
    shared by both consumers (single-exchange variant from the r14
    candidate list) cost +15% — it ships raw tf rows where the agg
    branch ships per-partition partial counts. Broadcasting the
    (token, df) side is NOT hinted (vocabulary grows with corpus
    scale; AQE may choose it locally). The N scalar joins in as a
    broadcast literal frame (no driver-side collect, plan stays lazy).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1).cast("double") / (F.col("df_t") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "score", "rank")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of
    the normalized text, then keep the MINIMUM hash of each sliding
    window of ``window`` consecutive gram hashes. Guarantee: any shared
    substring of length >= k + window - 1 between two documents yields
    at least one shared fingerprint, while only ~2/(window+1) of grams
    are kept — the standard local fingerprinting scheme for copy
    detection and substring-level near-dup mining.

    The per-gram hash is the engine-portable md5 idiom standing in for
    the classical Rabin rolling hash (winnowing only needs a uniform
    deterministic hash per gram; md5-first-8-hex keeps every
    fingerprint SQL-recomputable, and the grams it hashes are exactly
    the rolling positions). Returns (id_col, fp BIGINT, n_windows
    BIGINT) — the DISTINCT fingerprint set with multiplicity, one row
    per (doc, fingerprint).

    Plan shape at 100 TB: the gram hashing AND the window minima are
    one array expression inside the scan projection — ZERO shuffles to
    fingerprint the corpus; the only exchange is the final (doc, fp)
    hash agg, map-side combinable and output-bounded at ~2/(window+1)
    of corpus characters. Nothing leaves the JVM.

    Expression form matters: the window minimum is least() over the
    ``window`` gram hashes INLINE, so each gram hash evaluates at most
    ``window`` times — O(window * n) total. The tempting two-step form
    (hash array column, then transform(j -> array_min(slice(hs, ...))))
    is O(n^2): Catalyst's projection collapse inlines the whole hash
    array into the per-window lambda and re-evaluates every md5 per
    window position (measured 408 s for 200 x ~300-char docs at
    sf0.01; this form runs the same input in under a second)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    src = df.select(F.col(id_col), norm.alias("t"))
    gram_hash = (
        lambda pos: f"CAST(conv(substr(md5(substring(t, {pos}, {k})), 1, 8), 16, 10) AS BIGINT)"
    )
    least_terms = ", ".join(gram_hash(f"j + {o}") for o in range(window))
    wins = F.expr(
        f"CASE WHEN length(t) < {k + window - 1} THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE transform(sequence(1, length(t) - {k + window - 2}), "
        f"j -> least({least_terms})) END"
    )
    return (
        src.select(F.col(id_col), F.explode(wins).alias("fp"))
        .groupBy(id_col, "fp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_windows"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """BM25 top-k retrieval: for each query, the k highest-scoring
    documents under Okapi BM25 with the Lucene idf variant — the
    lexical-retrieval leg a training-data pipeline runs for benchmark
    mining, hard-negative selection, and corpus QA (tfidf's top_terms
    ranks terms WITHIN a doc; this ranks docs AGAINST a query).

    score(q, d) = sum over distinct query terms t of
      idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
      idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   [always >= 0]

    Determinism (registry rules): idf is rounded to 6 dp straight off
    the ln (libm last-ulp), the per-term contribution re-rounds to 6 dp
    after the tf-normalization product (every other operand is exact
    literal/integer-derived double arithmetic in a fixed evaluation
    order), and per-(query, doc) sums run through DECIMAL(28, 6) —
    order-free. avgdl is the raw IEEE quotient total_len / n_docs,
    never re-rounded. Ranking ties break doc_id-asc.

    Plan shape at 100 TB (r14 optimization, guide §2.3/§3.2): the
    token stream is pruned to the BROADCAST query vocabulary BEFORE
    the tf aggregate — a broadcast hash join applied map-side under
    the explode, so no corpus-wide (doc, token) table is ever built,
    shuffled, or aggregated. Every BM25 input is unchanged by the
    prune: tf and dl are per-(doc, query-term) values; df_t for a
    query term equals the row count of the pruned tf table for that
    term (identical to the corpus-wide docfreq restricted to query
    terms — the r13 shape computed the FULL corpus-vocabulary tf and
    docfreq aggs and only then joined the query vocabulary, paying two
    corpus-sized exchanges for rows that were then discarded); the
    corpus-wide statistics BM25 genuinely needs (n_docs, avgdl) come
    from one map-side-total agg over the tokenized scan, joined in as
    a 1-row broadcast. The document length rides the token explode
    into the tf agg (+8 bytes per pruned posting row, max-folded), so
    there is still NO doc-keyed join against a corpus-wide length
    table (round-7 ADVICE). The final window partitions by query_id —
    bounded by the query list, over scored candidates only. After the
    prune, the only non-broadcast exchanges carry query-term postings:
    O(|query vocab| x matching docs), not O(corpus).
    """
    from pyspark.sql import Window

    tokenized = docs.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
    toks = tokenized.select(
        id_col,
        F.size("toks").cast("long").alias("dl"),
        F.explode("toks").alias("token"),
    )
    qterms = queries.select(
        F.col(qid_col), F.explode(tokens_expr(qtext_col)).alias("token")
    ).distinct()
    qvocab = qterms.select("token").distinct()
    # the prune: map-side broadcast semi-reduction of the exploded
    # token stream to query terms, BEFORE any shuffle
    toks = toks.join(F.broadcast(qvocab), "token")
    # dl is constant per doc, so max() just carries it through the agg
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    # df_t as COUNT() OVER (PARTITION BY token) on the pruned tf: for
    # every query term this is exactly the corpus document frequency
    # (the prune keeps all docs containing it), and the window rides
    # the tiny pruned-postings frame — no separate docfreq aggregation
    # subtree, so the scan+tokenize+explode pipeline is never
    # re-executed to build a broadcast (the first r14 draft paid that;
    # the window form has FEWER plan subtrees than the r13 original)
    tf = tf.withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("token")))
    stats = tokenized.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size("toks").cast("long")).cast("double").alias("total_len"),
    )

    k1p1 = k1 + 1.0
    omb = 1.0 - b
    idf6 = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df_t").cast("double") + F.lit(0.5))
            / (F.col("df_t").cast("double") + F.lit(0.5))
        ),
        6,
    )
    tfd = F.col("tf").cast("double")
    tfnorm = (tfd * F.lit(k1p1)) / (
        tfd
        + F.lit(k1)
        * (
            F.lit(omb)
            + F.lit(b)
            * (F.col("dl").cast("double") / (F.col("total_len") / F.col("n_docs")))
        )
    )
    contrib = F.round(idf6 * tfnorm, 6)
    scores = (
        tf.join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(qid_col, id_col)
        .agg(F.sum(contrib.cast("decimal(28,6)")).cast("double").alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", "rank")
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + quantifiers only, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scrub emails / phone numbers / IPv4s, emitting the redacted text
    plus per-kind match counts (the audit signal a curation pipeline
    logs). Pure JVM regexp — runs at scan speed on every document.

    Patterns are deliberately lookaround-free so the DuckDB oracle uses
    the byte-identical pattern strings.
    """
    redacted = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.split(F.col(text_col), pat)).cast("bigint") - 1
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    out = df.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        *[c.alias(f"n_{kind}") for c, kind in zip(counts, PII_PATTERNS)],
    )
    return out


def word_ngrams_expr(text_col: str, n: int) -> Column:
    """Word-level n-grams (space-joined) as an array column.

    Guarded against Spark's descending-sequence gotcha: sequence(1, 0)
    yields [1, 0], not [] — a document shorter than n words must map to
    an EMPTY gram array, so the start-index sequence is wrapped in a
    size guard.
    """
    toks = tokens_expr(text_col)
    m = F.size(toks) - F.lit(n - 1)
    starts = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-level n-gram with an evaluation/benchmark corpus (the standard
    n-gram-overlap decontamination used when assembling LLM training
    sets; 8-13 word grams in production, n=5 here because the synthetic
    docs are short).

    Returns one row per training document:
      (id_col, n_grams BIGINT, n_hits BIGINT, contaminated BOOLEAN)
    where n_grams counts the doc's DISTINCT n-grams and n_hits counts
    how many of them appear anywhere in the benchmark corpus.

    Plan shape at 100 TB: the benchmark side is eval sets — thousands
    to millions of grams, bounded and small relative to the training
    corpus — so its distinct gram set BROADCASTS and the per-doc gram
    stream never shuffles: scan -> gram explode -> broadcast hash join
    -> per-doc hash agg (map-side combinable on doc_id). If the
    reference side ever outgrows broadcast (cross-corpus dedup rather
    than decontamination), drop the broadcast() hint and Spark falls
    back to a shuffle join on the gram key; AQE re-plans skewed grams.
    explode_outer keeps zero-gram (shorter-than-n) documents in the
    audit output with n_grams = 0.
    """
    grams = F.array_distinct(word_ngrams_expr(text_col, n))
    t = train.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
    b = (
        benchmark.select(F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = t.join(F.broadcast(b), "gram", "left")
    return joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count("_hit").alias("n_hits"),
        (F.count("_hit") > 0).alias("contaminated"),
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition metrics (Gopher-style repetition
    filters, word flavor): duplicate-word fraction and the fraction of
    word-bigrams taken by the single most frequent bigram.

    Returns (id_col, n_tokens BIGINT, dup_word_frac DOUBLE,
    top_bigram STRING, top_bigram_frac DOUBLE); fractions rounded to
    6 dp for engine portability; top_bigram is NULL (frac 0.0) for
    documents with fewer than two words. Ties on the top bigram break
    to the lexicographically SMALLEST gram.

    Plan shape at 100 TB: ZERO shuffle. The per-doc bigram mode is the
    natural explode -> groupBy(doc, gram) -> window-max recipe, but
    that shuffles one row per token of the corpus just to compute a
    per-document scalar. Instead the bigram array is array_sort()ed
    in-row and the longest run of equal adjacent elements is folded
    with F.aggregate — the whole operator is a single projection at
    scan parallelism (the HOF fold is interpreted per-element, not
    codegen, but there is no exchange and no skew surface at all;
    sorting ascending makes 'first strictly-longer run wins' exactly
    the lexicographic tie-break).
    """
    toks = tokens_expr(text_col)
    grams = F.array_sort(word_ngrams_expr(text_col, 2))

    def _fold(acc: Column, x: Column) -> Column:
        run_new = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1))
        better = run_new > acc["best"]
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            F.when(better, run_new).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_gram"]).alias("best_gram"),
        )

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("best_gram"),
    )
    staged = df.select(
        F.col(id_col),
        toks.alias("_tok"),
        F.aggregate(grams, init, _fold).alias("_top"),
        F.size(grams).alias("_n_bg"),
    )
    n_tok = F.size("_tok").cast("bigint")
    dup_frac = F.round(
        (n_tok - F.size(F.array_distinct("_tok"))).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double"),
        6,
    )
    best = F.col("_top")["best"]
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        dup_frac.alias("dup_word_frac"),
        F.when(best > 0, F.col("_top")["best_gram"]).alias("top_bigram"),
        F.round(
            F.when(
                best > 0,
                best.cast("double") / F.col("_n_bg").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )


def ngram_lm_score(
    train: DataFrame,
    score: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model scoring with add-k smoothing — the
    perplexity-style quality filter an LLM data pipeline runs to rank
    documents against an in-domain reference corpus (the classic
    KenLM-filter recipe, reduced to a bigram model so the whole thing
    is expressible as joins + aggregations; reference has no LM surface
    — [EXT] north-star operator).

    Model: P(w | c) = (count(c, w) + k) / (count(c) + k * V), where
    (c, w) ranges over word bigrams of ``train`` and V = distinct
    unigram vocabulary size of ``train`` + 1 (the +1 reserves smoothed
    mass for unseen words). Unseen context => P = 1 / V exactly.

    Returns one row per ``score`` document:
      (id_col, n_bigrams BIGINT, sum_logprob DOUBLE, nll_per_token
      DOUBLE) where sum_logprob sums ln P over the doc's bigrams and
    nll_per_token = -sum_logprob / n_bigrams (NULL when the doc has
    fewer than two words). Perplexity is exp(nll_per_token); the
    operator reports the log domain because IEEE exp() is not
    correctly-rounded and therefore not engine-portable, while
    ln/round/sum-of-decimals are (registry determinism rules).

    Determinism: per-bigram ln P is rounded to 6 dp and summed through
    DECIMAL(28, 6) — exact and order-free regardless of partition
    layout — then the final columns convert to DOUBLE (correctly
    rounded, bit-identical across engines). nll_per_token is the RAW
    IEEE quotient, deliberately NOT re-rounded: identical double
    operands divide bit-identically everywhere, whereas round(sum/n, 6)
    hits exact decimal half-way ties (a 6-dp decimal divided by a
    doc's bigram count lands on ...5 at the 7th place routinely —
    found by the sf1 oracle at n=46) where Spark's
    BigDecimal-of-double HALF_UP and DuckDB's multiply-then-round
    disagree by one ulp of the last digit.

    Plan shape at 100 TB: three shuffles total, each on a bounded key
    space. (1) bigram counts: explode -> hash agg on the gram (map-side
    combinable; output is bounded by OBSERVED vocab^2, far below corpus
    size); (2) context totals: second hash agg derived from (1), not
    from the corpus; (3) per-doc re-agg of scored grams on id_col
    (map-side combinable). The score-side probability lookup is a join
    on the gram key — AQE picks broadcast when the model fits (bigram
    models from a reference corpus are typically 10^6..10^8 rows), and
    falls back to a shuffle join with skew handling when it doesn't.
    V is a 1-row aggregate combined via broadcast, never collect()ed.
    """
    gram = F.explode(word_ngrams_expr(text_col, 2)).alias("gram")
    ctx = F.substring_index("gram", " ", 1).alias("ctx")
    w = F.substring_index("gram", " ", -1).alias("w")

    counts = (
        train.select(gram)
        .select(ctx, w)
        .groupBy("ctx", "w")
        .agg(F.count(F.lit(1)).alias("cnt_cw"))
    )
    ctx_tot = counts.groupBy("ctx").agg(F.sum("cnt_cw").alias("cnt_c"))
    vocab = train.select(F.explode(tokens_expr(text_col)).alias("tok")).agg(
        (F.count_distinct(F.col("tok")) + F.lit(1)).cast("double").alias("v_size")
    )

    s = score.select(
        F.col(id_col),
        F.explode_outer(word_ngrams_expr(text_col, 2)).alias("gram"),
    ).select(
        id_col,
        "gram",
        F.substring_index("gram", " ", 1).alias("ctx"),
        F.substring_index("gram", " ", -1).alias("w"),
    )
    scored = (
        s.join(counts, ["ctx", "w"], "left")
        .join(ctx_tot, ["ctx"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.round(
        F.log(
            (F.coalesce(F.col("cnt_cw"), F.lit(0)).cast("double") + F.lit(float(k)))
            / (
                F.coalesce(F.col("cnt_c"), F.lit(0)).cast("double")
                + F.lit(float(k)) * F.col("v_size")
            )
        ),
        6,
    )
    out = scored.groupBy(id_col).agg(
        F.count("gram").alias("n_bigrams"),
        F.sum(
            F.when(F.col("gram").isNotNull(), logp).cast("decimal(28,6)")
        ).alias("_sum_dec"),
    )
    n_bg = F.col("n_bigrams")
    sum_lp = F.coalesce(F.col("_sum_dec"), F.lit(0).cast("decimal(28,6)"))
    return out.select(
        F.col(id_col),
        n_bg,
        sum_lp.cast("double").alias("sum_logprob"),
        F.when(
            n_bg > 0,
            (-sum_lp).cast("double") / n_bg.cast("double"),
        ).alias("nll_per_token"),
    )


def _bloom_positions(gram: Column, m_bits: int, n_hashes: int) -> Column:
    """The ``n_hashes`` bit positions of a gram: md5(gram || ':' || i)
    first-8-hex-chars mod m — the same engine-portable hash-bucket
    idiom as operators/curation.py:hash_bucket, so a DuckDB oracle can
    recompute the exact bit set (false positives included) and the
    bloom path is hash-checkable, not just invariant-checkable."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(gram, F.lit(f":{i}"))), 1, 8), 16, 10
            ).cast("long")
            % m_bits
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    benchmark: DataFrame,
    n: int = 5,
    m_bits: int = 1 << 17,
    n_hashes: int = 3,
    text_col: str = "text",
) -> bytes:
    """Build a Bloom-filter bitmap over the benchmark corpus's word
    n-grams — the offline index step of bloom decontamination (built
    once per benchmark release, reused for every training shard; the
    same accounting as ivf_build).

    Plan: gram explode + distinct (one shuffle over the BENCHMARK side
    only — eval sets, bounded), positions JVM-side, then one bitmap per
    partition via an Arrow-batched kernel, OR-reduced on the driver.
    The driver reduce is bounded: numPartitions x m_bits/8 bytes (a
    16 KiB bitmap per partition at the default m), never corpus-sized.

    Sizing: classic FP bound fp ~ (1 - e^(-h*n/m))^h. The default
    m = 2^17, h = 3 holds fp < 0.1% up to ~5k distinct grams and
    degrades gracefully; size m ~ 14.4 bits/gram for fp = 0.1% at
    larger benchmark suites (still MBs for 10^7 grams — broadcastable
    where the exact gram-set broadcast of text.decontaminate would be
    GBs of strings).
    """
    import numpy as np
    import pandas as pd

    grams = benchmark.select(
        F.explode(F.array_distinct(word_ngrams_expr(text_col, n))).alias("gram")
    ).distinct()
    pos = grams.select(F.explode(_bloom_positions(F.col("gram"), m_bits, n_hashes)).alias("p"))

    n_bytes = m_bits // 8

    def _partition_bitmap(batches):
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                p = pdf["p"].to_numpy()
                np.bitwise_or.at(bitmap, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = pos.mapInPandas(_partition_bitmap, schema="bitmap binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes()


def decontaminate_bloom(
    train: DataFrame,
    bitmap: bytes,
    n: int = 5,
    m_bits: int = 1 << 17,
    n_hashes: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination against a Bloom bitmap: flag training
    documents whose word n-grams hit the filter. The scale path of
    text.decontaminate — the broadcast payload is the BITMAP (MBs),
    not the benchmark gram strings (GBs for large eval suites), at the
    price of a bounded, deterministic false-positive rate (a flagged
    doc is re-checked exactly downstream or simply dropped; a clean
    verdict is exact — blooms have no false negatives).

    Returns one row per training document:
      (id_col, n_grams BIGINT, n_hits_bloom BIGINT, flagged BOOLEAN)
    over the doc's DISTINCT grams, mirroring text.decontaminate's
    accounting.

    Plan shape at 100 TB: scan -> gram explode -> JVM position
    projection -> Arrow-batched bit lookup (the only Python crossing:
    three numpy gathers per batch against the broadcast bitmap — no
    hashing in Python, no per-row loop; mapInPandas, the house Arrow
    idiom) -> per-doc hash agg (map-side combinable). Zero shuffle
    before the final doc_id agg.
    """
    import numpy as np

    bm = np.frombuffer(bitmap, dtype=np.uint8)
    h = n_hashes

    def _bloom_hit(batches):
        for pdf in batches:
            has_gram = pdf["positions"].notna()
            hit = np.zeros(len(pdf), dtype=bool)
            if has_gram.any():
                flat = np.concatenate(
                    pdf.loc[has_gram, "positions"].to_numpy()
                ).astype(np.int64)
                bits = (bm[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
                hit[has_gram.to_numpy()] = bits.reshape(-1, h).all(axis=1)
            out = pdf[[id_col]].copy()
            out["has_gram"] = has_gram
            out["hit"] = hit
            yield out

    grams = F.array_distinct(word_ngrams_expr(text_col, n))
    t = train.select(F.col(id_col), F.explode_outer(grams).alias("gram")).select(
        F.col(id_col),
        F.when(
            F.col("gram").isNotNull(),
            _bloom_positions(F.col("gram"), m_bits, n_hashes),
        ).alias("positions"),
    )
    hits = t.mapInPandas(
        _bloom_hit, schema=f"{id_col} long, has_gram boolean, hit boolean"
    )
    return hits.groupBy(id_col).agg(
        F.sum(F.when(F.col("has_gram"), 1).otherwise(0)).cast("bigint").alias("n_grams"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("bigint").alias("n_hits_bloom"),
        (F.sum(F.when(F.col("hit"), 1).otherwise(0)) > 0).alias("flagged"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """C4-style cross-document boilerplate removal: drop every line
    that occurs (normalized) in at least ``min_df`` DISTINCT documents
    — navigation bars, cookie banners, license footers — while keeping
    each document's unique content in its original line order.

    Returns (id_col, cleaned_text STRING, n_lines BIGINT, n_removed
    BIGINT). A document of pure boilerplate survives with
    cleaned_text = '' (the length-0 row is the downstream quality
    filter's signal — dropping rows here would silently change corpus
    membership, which is the curator's decision, not this operator's).

    Determinism: line identity is the normalized form (lowercase,
    collapsed whitespace, trimmed) so cosmetic variants count as the
    same boilerplate; reassembly collects (line_pos, line) structs and
    array_sorts before concat, a pure function of the data regardless
    of partition layout (collect_list arrival order is not).

    Plan shape at 100 TB: posexplode at scan parallelism -> the
    line-DF aggregation is one shuffle on the normalized-line key
    (map-side combinable count over DISTINCT (doc, line) pairs) ->
    membership join back on the same key (AQE broadcasts the
    boilerplate set when small — it usually is: boilerplate is by
    definition high-df, so the DISTINCT high-df line set is tiny
    relative to the corpus) -> one shuffle on id_col to reassemble.
    Hot lines skew the join key; the boilerplate SET side is
    deduplicated before the join so the skew surface is the corpus
    side's own line distribution, handled by AQE skew-join.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_pos", "line"),
    ).withColumn(
        "norm_line", F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " "))
    )
    line_df = (
        lines.filter(F.col("norm_line") != "")
        .select(id_col, "norm_line")
        .distinct()
        .groupBy("norm_line")
        .agg(F.count(F.lit(1)).alias("line_docs"))
        .filter(F.col("line_docs") >= min_df)
        .select("norm_line")
        .withColumn("_bp", F.lit(1))
    )
    tagged = lines.join(line_df, "norm_line", "left")
    kept = F.col("_bp").isNull()
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        kept,
                        F.struct(F.col("line_pos"), F.col("line").alias("l")),
                    )
                )
            ).alias("_kept"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.when(kept, 0).otherwise(1)).cast("bigint").alias("n_removed"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(sep, F.transform(F.col("_kept"), lambda s: s["l"])).alias(
                "cleaned_text"
            ),
            "n_lines",
            "n_removed",
        )
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap quality
    signal: machine-generated boilerplate and keyword-stuffed spam
    compress far below natural prose, and high-entropy garbage barely
    compresses at all, so curation pipelines band-pass on this ratio.

    Returns (id_col, n_bytes BIGINT, n_compressed BIGINT,
    compression_ratio DOUBLE = compressed/raw; NULL for empty docs).
    Deterministic: zlib with a pinned level is a pure function of the
    bytes (same stdlib algorithm everywhere), so the ratio is
    engine-independent even though no SQL twin exists (DuckDB ships no
    zlib scalar — pytest-pinned, not corpus-oracled).

    Plan shape at 100 TB: one Arrow crossing at scan parallelism,
    O(bytes) per doc, no shuffle — the same cost class as the other
    per-doc text signals; zlib level 6 runs ~100 MB/s/core, far above
    the scan's share of cluster bandwidth per core.
    """
    import pandas as pd
    import zlib

    schema = f"{id_col} long, n_bytes long, n_compressed long"

    def kernel(batches):
        for pdf in batches:
            raw_sizes, comp_sizes = [], []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                raw_sizes.append(len(b))
                comp_sizes.append(len(zlib.compress(b, level)) if b else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": raw_sizes,
                    "n_compressed": comp_sizes,
                }
            )

    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(kernel, schema=schema)
    return out.withColumn(
        "compression_ratio",
        F.when(
            F.col("n_bytes") > 0,
            F.col("n_compressed").cast("double") / F.col("n_bytes").cast("double"),
        ),
    )


def tfidf_query_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """TF-IDF query retrieval: for each query, the k highest-scoring
    documents under the same smoothed tf-idf weighting top_terms uses
    (score(q, d) = sum over distinct query terms of
    round(tf * (ln((N+1)/(df+1)) + 1), 6), decimal-summed) — the
    second lexical ranker the RRF fusion entry pairs with BM25. BM25
    length-normalizes and saturates tf; tf-idf doesn't — exactly the
    kind of ranker disagreement reciprocal-rank fusion exploits.

    Plan shape: identical to bm25_topk's r14 pruned form (guide
    §2.3/§3.2) — the exploded token stream is semi-reduced to the
    broadcast query vocabulary BEFORE the tf aggregate, so no
    corpus-vocabulary (doc, token) table is built or shuffled; df_t
    over the pruned tf equals the corpus document frequency for every
    query term (the prune keeps every doc containing the term), corpus
    size joins in as a 1-row broadcast, and the final window
    partitions by query_id over scored candidates only.
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("token"))
    qterms = queries.select(
        F.col(qid_col), F.explode(tokens_expr(qtext_col)).alias("token")
    ).distinct()
    qvocab = qterms.select("token").distinct()
    toks = toks.join(F.broadcast(qvocab), "token")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # df_t as a count window on the pruned tf (see bm25_topk): no
    # separate docfreq subtree, no re-executed scan for its broadcast
    tf = tf.withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("token")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score6 = F.round(
        F.col("tf")
        * (
            F.log((F.col("n_docs") + 1).cast("double") / (F.col("df_t") + 1))
            + F.lit(1.0)
        ),
        6,
    )
    scores = (
        tf.join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy(qid_col, id_col)
        .agg(F.sum(score6.cast("decimal(28,6)")).cast("double").alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", "rank")
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    rrf_k: int = 60,
    topk: int = 10,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    fuse per-query top-k lists from N rankers into one ranking with
    score(q, d) = sum over rankers of 1 / (rrf_k + rank_r(q, d)),
    summing only over rankers whose list contains d — the standard
    hybrid-retrieval combiner (lexical + semantic, or two lexical
    variants), robust because it consumes only RANKS, never the
    rankers' incomparable score scales.

    Determinism: each contribution is the raw IEEE quotient
    1.0/(rrf_k + rank) — never rounded (1/(60+4) = 1/64 terminates but
    1/128 = 0.0078125 is a 7-decimal half-tie: round()ing it is the
    cross-engine tie trap). The per-(query, doc) sum folds
    contributions in RANKER-INDEX order (array_sort over (ridx, c)
    structs + F.aggregate — the index-order-fold idiom the cosine
    oracle pair uses), so the float result is order-deterministic for
    ANY ranker count; for <= 2 rankers a plain SUM is equivalent
    (two-term IEEE addition is commutative), which is what a SQL
    oracle can mirror.

    Scale: inputs are already top-k lists (bounded by queries x k);
    every shuffle here is tiny. Each ranking frame must carry
    (qid_col, id_col, rank).
    """
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fuse: rankings must be a non-empty list")
    tagged = [
        r.select(
            F.col(qid_col),
            F.col(id_col),
            F.lit(i).alias("ridx"),
            (
                F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))
            ).alias("c"),
        )
        for i, r in enumerate(rankings)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(qid_col, id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("ridx", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(qid_col, id_col, "score", "rank")
    )


def trigram_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted trigram index over a text corpus: (gram, doc_id) with
    each pair appearing exactly once — every 3-char substring of every
    document.

    Gram generation is the codegen position-explode + substr, NOT a
    transform/array_distinct array projection: higher-order functions
    are CodegenFallback, evaluated interpreted per element (the
    analyze() lesson), measured 3.4 s vs 0.32 s for the same ~1.5M
    grams at sf0.1. The (doc, gram) dedup is one map-side-combinable
    groupBy — a corpus-sized shuffle the INDEX build pays exactly once
    before its bucketed-by-gram write; the inline substring_search
    path never pays it (it prunes to query grams at the scan first
    and dedups pruned rows only). At 100 TB this table is built ONCE
    and persisted; searches then probe it without touching the corpus
    text until the candidate verify."""
    return (
        _gram_explode(docs, id_col, text_col)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("doc_id", "gram")
    )


def _gram_explode(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whole-stage-codegen trigram occurrence stream: (doc_id, gram),
    one row per POSITION (duplicates across positions included)."""
    t = F.col(text_col)
    return (
        docs.filter(t.isNotNull() & (F.length(t) >= 3))
        .select(
            F.col(id_col).alias("doc_id"),
            t.alias("_t"),
            F.expr(f"explode(sequence(1, length({text_col}) - 2))").alias("_i"),
        )
        .select("doc_id", F.expr("substr(_t, _i, 3)").alias("gram"))
    )


def substring_search(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern_id_col: str = "pattern_id",
    pattern_col: str = "pattern",
    postings: DataFrame | None = None,
    scan_prune_grams: "list[str] | None" = None,
) -> DataFrame:
    """Grep over a corpus: (pattern_id, doc_id) for every document
    whose text CONTAINS the literal pattern — LIKE '%pat%' for a
    bounded pattern list, accelerated by trigram blocking so the
    corpus text is only ever read twice (posting build + candidate
    verify), never once per pattern.

    Two plans, chosen by whether an index exists — because an ad-hoc
    index cannot pay for itself:

    * ``postings`` given (a persisted trigram_postings table — at
      100 TB, bucketed by gram and partition-pruned): the query
      trigram set (bounded by total pattern length) is BROADCAST
      against the posting table before any shuffle, so postings for
      grams outside the query never leave the scan (the BM25
      vocabulary-pruning shape). Candidates are documents containing
      ALL of a pattern's trigrams (sound AND complete: containing the
      pattern implies containing every one of its trigrams); the
      exact contains() re-check on candidates alone removes
      coincidental gram co-occurrence (the SymSpell
      verify-on-candidates playbook — the unblocked oracle proves
      completeness). Per-(pattern, doc) agg and verify join are
      bounded by candidate volume.
    * no ``postings``: direct broadcast-patterns scan — one pass over
      the corpus, instr() per (doc, pattern). Building a throwaway
      index would read the corpus once EITHER way, then pay a 5x row
      explosion + string hashing on top (measured at sf0.1: 4.3 s
      through an inline gram join vs 0.3 s direct); the index only
      wins when amortized across query batches. The join is a
      BroadcastNestedLoopJoin BY DESIGN: the broadcast side is the
      bounded pattern list, never the corpus.

    ``scan_prune_grams`` (postings path only): the literal query
    trigram list, pushed as an IN-filter on the posting scan BEFORE
    the broadcast join. Semantically redundant with the join (which
    keeps exactly those grams) but it is what lets a BUCKETED posting
    table prune whole buckets (SelectedBucketsCount in the plan) and
    a sorted layout skip row groups — Catalyst cannot derive a
    pushable IN-list from a join's build side (DPP/runtime filters
    don't reach a broadcast build over a bucketed scan here), so the
    caller supplies it when the patterns are driver-side literals.
    MUST contain every 3-substring of every pattern (derive it
    mechanically from the same strings that built ``patterns``) — a
    missing gram silently loses matches, because the verify step only
    re-checks candidates the scan produced.

    Pattern guards are IN-PLAN (raise_error, the hll_m-guard idiom) so
    calling this function never runs an eager driver action (round-9
    ADVICE found a patterns.count() Spark job paid on every call before
    any plan was returned). Each path enforces only what IT needs: the
    postings path raises on length < 3 (can't be trigram-blocked —
    sequence(1, len-2) with start > stop would silently generate
    descending bogus indices, not error); the direct path legally scans
    short patterns and raises only on NULL/empty (instr against either
    would silently drop or trivially match every document)."""
    import pyspark.sql.functions as _F

    def _guarded_pattern(min_len: int, why: str):
        p = F.col(pattern_col)
        return (
            F.when(
                p.isNull() | (F.length(p) < min_len),
                F.raise_error(
                    F.lit(f"substring_search: {why}")
                ).cast("string"),
            )
            .otherwise(p)
            .alias("pattern")
        )

    if postings is None:
        pats = patterns.select(
            F.col(pattern_id_col).alias("pattern_id"),
            _guarded_pattern(
                1, "NULL/empty pattern (instr would silently drop it "
                "or match every document); drop it at the call site"
            ),
        )
        return (
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
            .join(_F.broadcast(pats))
            .filter(F.expr("instr(_t, pattern) > 0"))
            .select("pattern_id", "doc_id")
        )
    pats = patterns.select(
        F.col(pattern_id_col).alias("pattern_id"),
        _guarded_pattern(
            3, "pattern shorter than 3 chars cannot be trigram-blocked; "
            "use the direct path (postings=None) for short patterns"
        ),
    )
    # pattern grams via codegen position-explode + substr (the
    # _gram_explode form) — transform/array_distinct HOFs are
    # CodegenFallback (round-9 measured 10x on the corpus side; the
    # patterns side is bounded, this is hygiene/consistency). The
    # distinct runs on a patterns-bounded frame (total pattern length
    # rows), never corpus-sized.
    pg = (
        pats.select(
            "pattern_id",
            F.col("pattern").alias("_p"),
            F.expr("explode(sequence(1, length(pattern) - 2))").alias("_i"),
        )
        .select("pattern_id", F.expr("substr(_p, _i, 3)").alias("gram"))
        .distinct()
    )
    if scan_prune_grams is not None:
        if not scan_prune_grams:
            # an EMPTY list can never be a complete gram cover of a
            # non-empty pattern set — isin([]) would filter the whole
            # posting table and return zero matches silently, the
            # exact loss mode the parameter contract warns about
            raise ValueError(
                "substring_search: scan_prune_grams is empty — derive "
                "it from the same pattern literals or pass None"
            )
        grams = list(scan_prune_grams)
        # Completeness guard IN-PLAN (round-10 ADVICE): the contract
        # above — every pattern trigram must appear in the prune list —
        # was documented but unenforced, and an incomplete list fails
        # SILENTLY (the pruned posting scan drops the missing gram's
        # postings, the all-grams candidate test then loses every doc
        # that needed it, and verify only re-checks produced
        # candidates). pg is patterns-bounded (total pattern length
        # rows), so guarding each pattern gram costs nothing; applied
        # BEFORE n_g/join so every consumer of pg evaluates it.
        pg = pg.select(
            "pattern_id",
            F.when(
                ~F.col("gram").isin(grams),
                F.raise_error(
                    F.lit(
                        "substring_search: scan_prune_grams is missing a "
                        "pattern trigram — the pruned posting scan would "
                        "silently lose matches; derive the list from the "
                        "same pattern literals"
                    )
                ).cast("string"),
            )
            .otherwise(F.col("gram"))
            .alias("gram"),
        )
        postings = postings.filter(F.col("gram").isin(grams))
    n_g = pg.groupBy("pattern_id").agg(F.countDistinct("gram").alias("n_grams"))
    # the postings contract is one row per (doc, gram) — trigram_
    # postings output — so the all-grams-present test is a plain COUNT
    pruned = postings.join(_F.broadcast(pg), "gram")
    cand = (
        pruned.groupBy("pattern_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("hit"))
        .join(_F.broadcast(n_g), "pattern_id")
        .filter(F.col("hit") == F.col("n_grams"))
        .select("pattern_id", "doc_id")
    )
    verify = (
        cand.join(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
            "doc_id",
        )
        .join(_F.broadcast(pats), "pattern_id")
        .filter(F.expr("instr(_t, pattern) > 0"))
    )
    return verify.select("pattern_id", "doc_id")


def collocation_topk(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 50,
) -> DataFrame:
    """Corpus-level collocation mining: the top-``topk`` adjacent word
    pairs ranked by LIFT — the association statistic behind PMI:

        lift(a, b) = P(ab) / (P(a) P(b)) = n_ab * N / (n_a * n_b)

    where n_ab counts the adjacent bigram over the whole corpus, n_a /
    n_b the unigrams, and N the total token count. PMI = ln(lift) is
    MONOTONE in lift, so ranking by lift is ranking by PMI — the
    operator reports lift and skips the ln entirely (the ngram_lm_score
    log-domain lesson taken one step further: no transcendental, no
    rounding contract; every value is integer counts pushed through
    ONE fixed float expression, bit-identical in any IEEE engine that
    evaluates the same op order). ``min_count`` is the standard
    low-frequency cut — a pair seen twice has huge lift and zero
    evidence (Manning & Schütze ch. 5).

    Output: (w1, w2, n_ab, n_a, n_b, lift DOUBLE, rank) — rank 1..topk
    by (lift desc, w1, w2).

    Plan shape at 100 TB: two corpus passes — token explode -> unigram
    hash agg, and a codegen position-explode bigram pass (array index
    pairs, NOT word_ngrams_expr's transform() HOF: higher-order
    functions are CodegenFallback, the measured-10x trigram lesson) ->
    bigram hash agg — both map-side combinable onto
    vocabulary-bounded outputs; two equi-joins of the bigram table
    against the unigram table (AQE broadcasts the unigram side when
    it fits). N never touches the corpus a third time: total tokens =
    SUM(n_w) over the already-bounded unigram frame, a 1-row aggregate
    combined via broadcast, never collect()ed. The global top-k is
    TakeOrdered (distributed partial top-k per partition), and the
    rank window runs on the bounded ``topk``-row survivor frame only —
    the single partition it implies holds <= topk rows by
    construction.
    """
    uni, bi = collocation_counts(docs, text_col)
    return collocations_from_counts(uni, bi, min_count=min_count, topk=topk)


def collocation_counts(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """THE unigram/bigram count construction, in one place: ``(uni =
    (w, n_w), bi = (w1, w2, n_ab))`` over the corpus — the two
    map-side-combinable passes collocation_topk scores and the
    text_lm_perplexity entry reuses for its mg_heavy fixtures
    (round-11 review: the entry carried a verbatim copy, the drift
    class the mg_truncate/priority_finalize one-definition rule
    exists to prevent)."""
    toks = docs.select(F.explode(tokens_expr(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    bi = (
        adjacent_bigrams(docs, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    return uni, bi


def adjacent_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per ADJACENT token pair (w1, w2) — the codegen
    position-explode pairing pass (array index pairs, never a
    transform() HOF — CodegenFallback, the measured-10x trigram
    lesson), shared by the batch collocation operator and the
    streaming bigram count feed so the pairing definition cannot
    drift between the two (round-11 review; the scoring formula is
    likewise shared via collocations_from_counts)."""
    return (
        docs.select(tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") >= 2)  # sequence(1, 0) would DESCEND
        .select(
            "_tk",
            F.expr("explode(sequence(1, size(_tk) - 1))").alias("_i"),
        )
        .select(
            F.expr("_tk[_i - 1]").alias("w1"),
            F.expr("_tk[_i]").alias("w2"),
        )
    )


def collocations_from_counts(
    uni: DataFrame,
    bi: DataFrame,
    min_count: int = 5,
    topk: int = 50,
    n_tok: "DataFrame | None" = None,
) -> DataFrame:
    """Lift-ranked collocation top-k from PRE-AGGREGATED exact counts:
    ``uni = (w, n_w)``, ``bi = (w1, w2, n_ab)`` — the ONE scoring
    formula shared by the batch operator (collocation_topk feeds it
    in-plan aggregates) and the streaming consumer
    (streaming/pipeline.py:read_collocations feeds it the exact
    term-count state tables), so the two paths cannot drift: identical
    integer counts in, bit-identical lift out. N = SUM(n_w) over the
    vocabulary-bounded unigram frame (never a separate corpus pass);
    a caller that already aggregated it may pass the 1-row ``n_tok``
    frame to share the subtree (round-11 review: the lm-perplexity
    entry needs the same total for its mg_heavy fixtures).
    ``min_count`` is applied HERE, at read time — state partials must
    stay unfiltered or batch-local thresholds would drop pairs that
    only clear min_count after merging."""
    from pyspark.sql import Window

    if n_tok is None:
        n_tok = uni.agg(F.sum("n_w").cast("long").alias("n_tok"))
    scored = (
        bi.filter(F.col("n_ab") >= min_count)
        .join(
            uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a")), "w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b")), "w2"
        )
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            (
                F.col("n_ab").cast("double")
                * F.col("n_tok").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )
    top = scored.orderBy(F.col("lift").desc(), "w1", "w2").limit(topk)
    w = Window.orderBy(F.col("lift").desc(), "w1", "w2")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))
