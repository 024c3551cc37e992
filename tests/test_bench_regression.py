"""Performance regression gate against the round-1 bench anchor.

r15 tiering (round-14 VERDICT item 1a): the two tests that RUN the
bench carry @pytest.mark.slow — excluded from the default tier by
pytest.ini so the driver-window run completes — and execute in the
separate `-m slow` tier (completed output committed per optimization
round, plans/r15/pytest_slow_tier.txt). The three no-Spark anchor
invariants below stay in the default tier: anchor drift still fails
at commit time.

Runs the real bench harness (bench.py, fresh Spark subprocess) at the
anchor's scale factor and asserts the suite and each warm per-query time
stay within 2x of BENCH_ANCHOR.json — so a round can answer "did this
change make it slower?" with a failing test instead of a post-hoc diff
(round-2 VERDICT fix #6). Warm times are the data-path numbers.

The per-query bar is FACTOR * anchor + FLOOR_S: a multiplicative factor
for genuine regressions plus an ADDITIVE allowance for scheduler/GC
noise. Inside the full suite the resident session JVM + Python worker
pool co-load the machine with a roughly CONSTANT ~0.5 s overhead per
query, so a pure 2x bar fails exactly the small-anchor queries (a 0.6 s
anchor blew its 1.2 s bar on the min of three co-loaded runs while
standalone runs sat at 1.1x) and never the large ones — the additive
term models that noise directly instead of re-running until lucky.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANCHOR_PATH = os.path.join(REPO, "BENCH_ANCHOR.json")
SF_DIR = "/root/testdata/sf0.1"
FACTOR = 2.0
FLOOR_S = 0.5


def _run_bench() -> dict:
    # Single-pass mode: bench.py's own min-of-two (cold-only second
    # subprocess pass, for BENCH_rN/anchor comparability) would double
    # this test's wall time, and _Lazy's per-query re-run logic already
    # suppresses spikes the way that second pass does.
    #
    # Methodology match (round-12): this subprocess silently inherited
    # conftest's SPARK_GRAFT_CPUS=8 / SPARK_GRAFT_SHUFFLE_PARTITIONS=8
    # test-session speedups — so the gate measured an 8-core bench
    # against anchors recorded from standalone 32-core runs.
    # Shuffle-heavy queries sat structurally near their bars under
    # that mismatch (op_winnow_pairs: 3.2 s at the anchor config,
    # 6-7 s at 8 cores vs a 6.3 s bar — a coin flip any throttle
    # tipped). BENCH_ANCHOR.json is a COMMITTED artifact recorded at
    # bench.py's own defaults, so the strip is UNCONDITIONAL: no
    # ambient override — this conftest, a developer export, an xdist
    # controller — ever has matching committed anchors (seventh-pass
    # round-12 review killed a record-what-conftest-injected scheme
    # for exactly that reason).
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("SPARK_GRAFT_CPUS", "SPARK_GRAFT_SHUFFLE_PARTITIONS")
    }
    env.update(SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_BENCH_RUNS="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        # Liveness bound, NOT a performance bar (those are FACTOR/
        # FLOOR_S): must clear the worst window the gate itself
        # tolerates — the suite bar is 2x the anchor cold, and a
        # throttled host (round-12: ~2x global slowdown with 3-4%
        # hypervisor steal visible at idle) pushed a legitimate full
        # pass beyond the old 600 s, turning a performance question
        # into a TimeoutExpired crash.
        timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # bench.py prints the FULL record first, then a compact driver-facing
    # summary (last line — since r11 it also carries "queries_warm", so
    # key on "verification", which only the full record has).
    line = [
        l
        for l in out.stdout.splitlines()
        if re.match(r'^\{"metric"', l) and '"verification"' in l
    ][-1]
    return json.loads(line)


class _Lazy:
    """First bench run, plus up to TWO on-demand re-runs: a genuine
    regression reproduces every time, a scheduler/GC/co-load spike does
    not, so failing queries are re-judged on the per-query MIN across
    runs. The third run exists because inside the full pytest suite the
    session JVM + its Python worker pool co-load the machine and the
    Python-kernel headline entries (multimodal, text curation) can blow
    the bar on two consecutive runs while being comfortably green
    standalone; three samples bound spike-shaped flakes, the additive
    FLOOR_S term in the bar models the constant co-load overhead."""

    def __init__(self):
        self.first = _run_bench()
        self.reruns: list[dict] = []

    def best(self, name: str, max_runs: int = 3) -> float:
        vals = [self.first["queries_warm"][name]]
        vals += [r["queries_warm"].get(name, float("inf")) for r in self.reruns]
        while min(vals) > 0 and len(self.reruns) < max_runs - 1:
            bar = FACTOR * _merged_anchor()["queries_warm"].get(name, 0) + FLOOR_S
            if min(vals) <= bar:
                break
            self.reruns.append(_run_bench())
            vals.append(self.reruns[-1]["queries_warm"].get(name, float("inf")))
        return min(vals)


@pytest.fixture(scope="module")
def bench():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    # Host comparability (round-12 ADVICE): the env strip above makes
    # the subprocess use bench.py's own defaults (all host cores), so
    # the committed anchors — recorded on a 32-core host — are only
    # meaningful bars on a host with at least that many cores. On a
    # smaller host shuffle-heavy queries sit structurally near their
    # 2x bars (the pre-fix round-12 coin flip, now as a host property
    # instead of an env leak): skip rather than flake. A LARGER host
    # only makes the run faster, so the anchors stay valid upper bars.
    anchor_cpus = json.load(open(ANCHOR_PATH)).get("anchor_host_cpus")
    host_cpus = os.cpu_count() or 0
    if anchor_cpus and host_cpus < anchor_cpus:
        pytest.skip(
            f"host has {host_cpus} cores < anchor host's {anchor_cpus}: "
            "per-query anchors are not comparable bars here"
        )
    return _Lazy()


def _merged_anchor() -> dict:
    """Merge every round's anchor block: later rounds override earlier
    per-query values (covering renamed/merged corpus entries), and the
    suite bar comes from the latest round's cold total."""
    doc = json.load(open(ANCHOR_PATH))
    rounds = sorted(k for k in doc if k.startswith("r"))
    merged = {"suite_seconds_cold": doc[rounds[-1]]["suite_seconds_cold"], "queries_warm": {}}
    for r in rounds:
        merged["queries_warm"].update(doc[r]["queries_warm"])
    return merged


def test_every_headline_query_is_anchored():
    """Hard invariant (round-9 VERDICT #1): every bench.py HEADLINE
    name must have a warm anchor in the merged BENCH_ANCHOR.json —
    the per-query gate silently SKIPS un-anchored names (`if name in
    anchor`), so a HEADLINE widened without a fresh anchor block
    leaves the new ops ungated and any later regression invisible.
    This test needs no Spark run, so the drift fails at commit time.
    """
    import bench as bench_mod

    anchored = set(_merged_anchor()["queries_warm"])
    missing = [n for n in bench_mod.HEADLINE if n not in anchored]
    assert not missing, (
        f"HEADLINE queries with no BENCH_ANCHOR.json warm entry "
        f"(append a fresh anchor block from a clean bench run): {missing}"
    )


def test_anchor_raises_are_explained():
    """Anchor-drift ledger (round-10 VERDICT #3): the per-query gate
    compares only to the MERGED LATEST anchors, so a round could
    silently ratchet anchors upward to absorb a real regression — the
    r10 suite re-base (+20%) was legitimate (host change + accounting
    fix), the next one might not be. Every block that RAISES an
    existing query's warm anchor materially (>1.15x + 0.05s — below
    that is min-of-two/median timer noise) or the suite cold bar
    (>1.15x) must name it in a ``raises`` ledger: query -> reason, or
    "*" -> a block-wide cause (host change, accounting change,
    pre-ledger adjudication). No Spark run needed — an unexplained
    anchor ratchet fails at commit time."""
    doc = json.load(open(ANCHOR_PATH))
    rounds = sorted(k for k in doc if k.startswith("r"))
    merged: dict[str, float] = {}
    prev_suite = None
    unexplained = []
    for r in rounds:
        block = doc[r]
        raises = block.get("raises", {})
        blanket = "*" in raises and bool(str(raises["*"]).strip())
        for name, t in block["queries_warm"].items():
            prev = merged.get(name)
            if prev is None or t <= prev * 1.15 + 0.05:
                continue
            if not (blanket or str(raises.get(name, "")).strip()):
                unexplained.append((r, name, prev, t))
        s = block["suite_seconds_cold"]
        if (
            prev_suite is not None
            and s > prev_suite * 1.15
            and not (blanket or str(raises.get("suite_seconds_cold", "")).strip())
        ):
            unexplained.append((r, "suite_seconds_cold", prev_suite, s))
        merged.update(block["queries_warm"])
        prev_suite = s
    assert not unexplained, (
        "anchor blocks raise existing warm anchors without a reason in "
        f"their 'raises' ledger (name the query or '*'): {unexplained}"
    )


@pytest.mark.slow
def test_suite_within_anchor(bench):
    anchor = _merged_anchor()
    assert bench.first["value"] <= FACTOR * anchor["suite_seconds_cold"], (
        f"suite {bench.first['value']}s vs anchor "
        f"{anchor['suite_seconds_cold']}s (x{FACTOR})"
    )


@pytest.mark.slow
def test_warm_queries_within_anchor(bench):
    anchor = _merged_anchor()["queries_warm"]
    warm = bench.first.get("queries_warm", {})
    suspect = [
        name
        for name, t in warm.items()
        if name in anchor and t > FACTOR * anchor[name] + FLOOR_S
    ]
    slow = {
        name: (bench.best(name), anchor[name])
        for name in suspect
        if bench.best(name) > FACTOR * anchor[name] + FLOOR_S
    }
    assert not slow, f"warm regressions vs anchor (x{FACTOR} + {FLOOR_S}s): {slow}"
