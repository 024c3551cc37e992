from .registry import CORPUS, CorpusQuery, register

# Import modules for their registration side effects.
from . import relational  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import temporal  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-visibility budget (round-2 fix, final form).
#
# The driver's CORRECTNESS report covers the FIRST 50 registered queries
# in insertion order; round 1 registered 60, so the last 10 got no
# correctness row at all. Round 2 consolidates the corpus to EXACTLY 50
# entries — 43 hash-checked oracles + 7 rows-only — so every registered
# entry gets a driver row and nothing is claimed-but-unchecked. The
# consolidation merged near-duplicate oracled entries rather than
# dropping coverage: every merged entry's doc names the entries it
# subsumes, and all merged semantics remain hash-checked as columns of
# the combined query (see window_frames, multimodal_pipeline,
# json_props_extract, curation_splits, curation_pack_batches,
# agg_cube_status_priority, text_quality, agg_salted_distinct).
#
# Ordering: oracled entries first (hash rows), rows-only entries last —
# if the driver window ever shrinks, hash rows are the ones kept.
#
# Round 4 additions stayed inside the window the same way: ar_ci_lookup
# + ar_key_lookup merged into ar_lookup_gauntlet, join_semi_* +
# join_anti_* merged into join_semi_anti (each former entry's semantics
# remains a hash-checked row group of the merged entry), freeing two
# slots for text_repetition_decontaminate and curation_quota_sample.
# ---------------------------------------------------------------------------

DRIVER_WINDOW = 50

_ordered = {n: cq for n, cq in CORPUS.items() if cq.oracle is not None}
_ordered.update({n: cq for n, cq in CORPUS.items() if cq.oracle is None})
CORPUS.clear()
CORPUS.update(_ordered)

import os as _os

# SPARK_GRAFT_CORPUS_WIP=1 relaxes the exact-count assert while entries
# are being merged/added mid-edit (used by dev check scripts only; the
# test suite and the driver always run with the strict form).
if _os.environ.get("SPARK_GRAFT_CORPUS_WIP") != "1":
    assert len(CORPUS) == DRIVER_WINDOW, (
        f"corpus must hold exactly {DRIVER_WINDOW} entries so every one gets "
        f"a driver correctness row; found {len(CORPUS)}"
    )

__all__ = ["CORPUS", "CorpusQuery", "register"]
