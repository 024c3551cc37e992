"""In-repo sf1 oracle gate (round-10 VERDICT #5).

The per-round discipline — rerun scripts/sf1_oracle.py for every corpus
entry whose semantics changed — caught real bugs in rounds 4, 5, and 9
(auto-sizing branch divergence, rounding-tie law, the CAST truncation
trap), but was enforced by verdict nagging. Now it's mechanical:

- scripts/sf1_stamp.json records each oracled entry's fingerprint
  (oracle SQL + build source) at its last green sf1 run;
- the always-on test below keeps the stamp file itself honest with no
  Spark run (valid, no stale keys, no un-stamped oracled entries — so
  adding or editing an entry fails the SUITE until sf1 vouches for it);
- the SPARK_GRAFT_SF1=1 opt-in test runs sf1_oracle.py --only over
  exactly the drifted entries (regenerating /tmp/sf1 if absent, ~25 min
  cold) and is the thing that updates the stamp.

Documented in BASELINE.md (sf1 harness section).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from sf1_stamp import STAMP_PATH, changed_entries, load_stamp  # noqa: E402

from accounts_receivable_data_pipeline_api_spark.plans import CORPUS  # noqa: E402


def test_sf1_stamp_is_current():
    """No-Spark commit-time invariant: every oracled corpus entry has a
    stamp matching its CURRENT fingerprint, and no stamp is stale. A
    failure here means an entry changed (or is new) since its last sf1
    oracle run — run `SPARK_GRAFT_SF1=1 python -m pytest
    tests/test_sf1_gate.py` (or scripts/sf1_oracle.py --only <names>)
    to re-verify it at sf1, which refreshes the stamp."""
    stamp = load_stamp()
    assert os.path.isfile(STAMP_PATH), "scripts/sf1_stamp.json missing"
    stale = [k for k in stamp if k not in CORPUS]
    assert not stale, f"stamps for entries no longer in the corpus: {stale}"
    drifted = changed_entries(CORPUS)
    assert not drifted, (
        "corpus entries changed since their last sf1 oracle run "
        f"(rerun scripts/sf1_oracle.py --only {','.join(drifted)} "
        f"to re-verify and restamp): {drifted}"
    )


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF1") != "1",
    reason="sf1 oracle run is opt-in (SPARK_GRAFT_SF1=1); ~25 min cold",
)
def test_sf1_oracle_runs_changed_entries():
    """Opt-in runner: executes the sf1 oracle for exactly the drifted
    entries and asserts it exits green (the run restamps them, turning
    test_sf1_stamp_is_current green again)."""
    drifted = changed_entries(CORPUS)
    if not drifted:
        return  # nothing changed since the last green run
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "sf1_oracle.py"),
            "--only",
            ",".join(drifted),
        ],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    assert out.returncode == 0, (
        f"sf1 oracle failed for changed entries {drifted}:\n"
        + out.stdout[-3000:]
        + out.stderr[-2000:]
    )
