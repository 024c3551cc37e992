"""Build the re-tightened r15 anchor block (round-14 VERDICT item 1c)
from two agreeing clean-window bench runs of the FINAL r15 code.

Usage: python scripts/r15_anchor.py run1.json run2.json

Per-query warm bar = the WORSE (max) of the two runs' warm medians;
suite cold bar = the worse of the two cold totals. Lowering existing
bars needs no `raises` ledger entry (only raises do); the block still
carries a note naming the evidence. Refuses to write if the two runs
disagree by more than 1.6x on the suite cold (not a clean-window pair)
or if any pass-level steal sample exceeds 8%.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.readline())


def main() -> None:
    r1, r2 = _load(sys.argv[1]), _load(sys.argv[2])
    c1, c2 = r1["value"], r2["value"]
    ratio = max(c1, c2) / min(c1, c2)
    steals = r1.get("steal_pct_runs", []) + r2.get("steal_pct_runs", [])
    if ratio > 1.6:
        raise SystemExit(f"runs disagree {ratio:.2f}x on suite cold ({c1} vs {c2}); not a clean pair")
    if steals and max(steals) > 8.0:
        raise SystemExit(f"steal too high for an anchor: {steals}")
    warm = {
        k: round(max(r1["queries_warm"][k], r2["queries_warm"].get(k, 0.0)), 3)
        for k in r1["queries_warm"]
    }
    block = {
        "suite_seconds_cold": round(max(c1, c2), 1),
        "queries_warm": warm,
        "note": (
            "r15 re-tightened block (round-14 VERDICT item 1c): per-query warm = max of "
            "two agreeing same-session-day runs of the final r15 code "
            f"(suite colds {c1} / {c2}, pass steal samples {steals}); raw runs committed as "
            "plans/r15/bench_after_run{1,2}.json. Lowering bars vs the r14 host-drift block "
            "needs no raises ledger; queries whose bars RISE vs the merged pre-r14 anchors "
            "are covered by the raises entry below."
        ),
    }
    anchor_path = os.path.join(REPO, "BENCH_ANCHOR.json")
    doc = json.load(open(anchor_path))
    # name any query whose new bar exceeds the merged PRE-r14 anchors
    # materially (the r14 block was a loosened host-drift block; rising
    # above the OLD tight bars still needs an explanation)
    merged_old: dict[str, float] = {}
    for r in sorted(k for k in doc if k.startswith("r") and k != "r14_sf0.1"):
        merged_old.update(doc[r]["queries_warm"])
    raises = {
        k: "host: r15 VM measures ~1.5x the r13 host on unchanged code (see OPTIMIZATION_r15.md substrate section)"
        for k, v in warm.items()
        if k in merged_old and v > merged_old[k] * 1.15 + 0.05
    }
    if raises:
        block["raises"] = raises
    doc["r15_sf0.1"] = block
    with open(anchor_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote r15_sf0.1: suite cold {block['suite_seconds_cold']}, "
          f"{len(warm)} warm bars, {len(raises)} raises vs pre-r14 merged")


if __name__ == "__main__":
    main()
