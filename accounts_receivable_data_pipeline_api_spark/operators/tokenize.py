"""Deterministic BPE tokenizer: corpus-trained merges, Arrow-applied.

The standard LLM-pipeline split of work:

  bpe_train  — learn the merge table ONCE from a bounded, content-
               addressed sample of the corpus (the offline index step;
               same accounting as ivf_build / bloom_build). Training is
               inherently sequential (merge i+1's counts depend on
               merge i), so it runs on the driver over an aggregated
               word-frequency table — the CORPUS never leaves the
               executors; only (word, count) pairs for the sample's
               capped vocabulary do.
  bpe_apply  — tokenize the full corpus with the frozen merge table:
               embarrassingly parallel, one Arrow kernel at scan
               parallelism, merges broadcast in the task closure.

Determinism end to end: the sample is hash-addressed (md5 bucket, not
rng), the word table is capped by (count desc, word asc), merge
selection ties break (count desc, pair lexicographic asc), and apply
is a pure function of (merges, text). Retraining on the same corpus
bytes yields the identical tokenizer; re-applying yields identical
token streams on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_expr

# End-of-word sentinel. A Unicode private-use codepoint, NOT the
# conventional "</w>": crawl corpora are full of literal HTML/XML
# fragments, so '</w>' CAN occur inside a whitespace-split token and
# would make detokenization (replace EOW with space) lossy exactly on
# the documents most worth keeping intact (round-5 review finding).
# U+E000 never occurs in real text (private-use area, unassigned
# semantics); a corpus that does contain it should strip PUA
# codepoints at ingest, the standard normalization step.
EOW = ""


def _word_freqs(
    df: DataFrame,
    text_col: str,
    sample_pct: int,
    max_words: int,
    id_col: str,
) -> list[tuple[str, int]]:
    """(word, count) for the hash-sampled slice, capped to the
    ``max_words`` most frequent words (ties: lexicographic) — the only
    data that ever reaches the driver, bounded regardless of corpus
    size."""
    from .curation import hash_bucket

    sampled = df
    if sample_pct < 100:
        sampled = df.filter(
            hash_bucket(F.col(id_col).cast("string")) < sample_pct
        )
    freqs = (
        sampled.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in freqs]


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    sample_pct: int = 100,
    max_words: int = 30_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Classic
    Sennrich-style BPE over a word-frequency table with incremental
    pair-count maintenance: each merge updates only the words that
    contain the merged pair, so training is O(num_merges * affected)
    rather than a full recount per merge.

    Tie-breaks are total: the winning pair maximizes (count, then
    lexicographically SMALLEST pair) — no dict-order or hash-order
    dependence, so the merge table is reproducible bit for bit.
    """
    words = _word_freqs(df, text_col, sample_pct, max_words, id_col)
    # symbol sequences per word, weighted by count
    seqs: list[list[str]] = [list(w) + [EOW] for w, _ in words]
    counts = [c for _, c in words]

    # pair -> total count; pair -> set of word indexes containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add_word_pairs(i: int, sign: int) -> None:
        seq, c = seqs[i], counts[i]
        for a, b in zip(seq, seq[1:]):
            pair = (a, b)
            pair_counts[pair] = pair_counts.get(pair, 0) + sign * c
            if sign > 0:
                pair_words.setdefault(pair, set()).add(i)

    for i in range(len(seqs)):
        _add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for pair, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and pair < best[0]):
                best = (pair, c)
        if best is None or best[1] < 2:
            break  # nothing left worth merging
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in list(pair_words.get(pair, ())):
            _add_word_pairs(i, -1)
            seq = seqs[i]
            out = []
            j = 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == pair[0] and seq[j + 1] == pair[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = out
            _add_word_pairs(i, +1)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by always taking the LOWEST-rank
    mergeable pair (the canonical BPE apply order — identical to
    replaying the merges sequentially)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank = None
        best_j = -1
        for j, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        seq[best_j : best_j + 2] = [seq[best_j] + seq[best_j + 1]]
    return seq


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a frozen merge table. Returns the
    input plus (out_col ARRAY<STRING>, n_bpe_tokens BIGINT).

    Plan shape at 100 TB: ZERO shuffle — whitespace words come from the
    same JVM tokens_expr the rest of the text stack uses (one semantics
    for "word" everywhere), then ONE Arrow crossing applies the merges
    with a per-batch word cache (real corpora repeat words heavily:
    the cache turns per-token cost into per-DISTINCT-token cost within
    each batch). The merge table rides the task closure (a few KB to a
    few MB for production vocab sizes — the same bound every tokenizer
    worker pays).

    Round-trip contract (tested): ''.join(tokens) with EOW markers
    removed reconstructs the normalized text of every document exactly
    — tokenization never loses bytes.
    """
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, {out_col} array<string>, n_bpe_tokens long"

    def kernel(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out = []
            counts = []
            for words in pdf["__words"]:
                doc_tokens: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    doc_tokens.extend(enc)
                toks_out.append(doc_tokens)
                counts.append(len(doc_tokens))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: toks_out,
                    "n_bpe_tokens": counts,
                }
            )

    staged = df.select(F.col(id_col), tokens_expr(text_col).alias("__words"))
    encoded = staged.mapInPandas(kernel, schema=out_schema)
    return df.join(encoded, id_col)
