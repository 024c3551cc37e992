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


def analyze(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection: all metrics as columns.

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

    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (n_tok + F.col("_n_punct")).cast("bigint").alias("n_tokens_bpe"),
        chars.cast("bigint").alias("n_chars_measured"),
        p_ratio.alias("punct_ratio"),
        s_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        F.md5(F.substring(F.col("_norm"), 1, 256)).alias("fingerprint"),
    )


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

    Plan shape: explode -> two hash aggs (tf, document frequency) ->
    broadcast of the tiny (token, df) side is NOT safe at corpus scale
    (vocabulary grows); it stays a shuffle join on token. The N scalar
    joins in as a broadcast literal frame (no driver-side collect, plan
    stays lazy).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "token")
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
