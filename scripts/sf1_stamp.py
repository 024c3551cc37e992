"""Per-entry change fingerprints for the sf1 oracle discipline
(round-10 VERDICT #5).

The per-round rule — every corpus entry whose semantics changed gets an
sf1 oracle rerun — was enforced by verdict nagging. This module makes
it mechanical: ``sf1_stamp.json`` records, per oracled entry, the md5
of (oracle SQL + the build function's source) at the last green
``scripts/sf1_oracle.py`` run; ``changed_entries`` returns the entries
whose CURRENT fingerprint drifted (or that have no stamp yet), and the
env-opt-in gate (tests/test_sf1_gate.py, SPARK_GRAFT_SF1=1) runs
``--only`` exactly those.

Honest limitation: the fingerprint sees the entry's build-function
source and oracle text, not the operator helpers it calls — an edit
deep in operators/*.py that changes an entry's semantics without
touching the entry body still needs a manual ``--only`` run (the same
judgment call as before; the stamp closes the COMMON case, where the
entry body or its oracle is what changed). Comment-only edits flag a
rerun too — conservative by design.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

STAMP_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1_stamp.json")


def entry_fingerprint(cq) -> str:
    src = inspect.getsource(cq.build)
    return hashlib.md5(((cq.oracle or "") + "\x00" + src).encode()).hexdigest()


def load_stamp() -> dict:
    if not os.path.isfile(STAMP_PATH):
        return {}
    with open(STAMP_PATH) as f:
        return json.load(f)


def changed_entries(corpus) -> list[str]:
    """Oracled entries whose fingerprint differs from the stamp (a
    missing stamp counts as changed — new entries must earn one)."""
    stamp = load_stamp()
    return sorted(
        name
        for name, cq in corpus.items()
        if cq.oracle is not None and stamp.get(name) != entry_fingerprint(cq)
    )


def update_stamp(names, corpus, fingerprints: dict | None = None) -> None:
    """Record fingerprints of ``names`` (called by sf1_oracle.py after
    those entries ran green / budget-skipped — never by tests). Prunes
    stamps for entries no longer in the corpus (renamed/merged away).

    ``fingerprints``: pass the snapshot taken at RUN START. getsource
    reads the file on disk at call time, so fingerprinting at the END
    of a long run races concurrent edits — a mid-run edit shifts line
    offsets under the imported functions' stale __code__ objects and
    every later-defined entry in the module hashes garbage text
    (observed round 11: 14 spurious drifts from one edit). The
    start-of-run snapshot hashes exactly the code the run verified; if
    the file changed mid-run the stamp then correctly differs from the
    new source and the gate flags a rerun."""
    stamp = {k: v for k, v in load_stamp().items() if k in corpus}
    for name in names:
        stamp[name] = (
            fingerprints[name]
            if fingerprints is not None
            else entry_fingerprint(corpus[name])
        )
    tmp = STAMP_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(sorted(stamp.items())), f, indent=1)
        f.write("\n")
    os.replace(tmp, STAMP_PATH)
