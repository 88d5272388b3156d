"""Bench-regression gate (VERDICT r9 item 8).

Compares the working-tree BENCH_FULL.json against the committed one
(`git show HEAD:BENCH_FULL.json`) and FAILS when the new run regresses
more than the allowed drift:

  * ratio_headline   > +5 %  (primary — host-noise-cancelling)
  * headline wall    > +10 % (secondary — raw, host-sensitive)
  * ratio_headline   > +10 % vs the latest driver round anchor
    (BENCH_r{N}.json) — catches RATCHETING: the HEAD baseline moves
    with every refresh, so N successive <5% drifts compound silently
    (that is exactly how r11's +20% ratio landed without a failure;
    VERDICT r11 item 1)

Rationale (PERF.md "Round 10" section): raw walls drift with host state
— r8's exact code re-run on the r10 host was 27 % slower than its
committed number while DuckDB drifted proportionally — so the ratio is
the metric a silent regression actually shows up in; the wall bound is
a coarse backstop.

An intentional regression is recorded, not sneaked: set
`BENCH_GATE_NOTE="why"` in the environment (the note is echoed and the
gate passes with an explicit acknowledgement the committer must write).

Wire-up: `.git/hooks/pre-commit` (installed by `scripts/install_hooks.sh`,
re-run after fresh clones — hooks are not cloned) runs this whenever
BENCH_FULL.json is staged. It can also be run by hand:

    python scripts/bench_gate.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RATIO_DRIFT = 0.05
WALL_DRIFT = 0.10
ANCHOR_RATIO_DRIFT = 0.10


def _round_anchor() -> tuple[str, float] | None:
    """ratio_headline from the newest driver-committed BENCH_r{N}.json
    (its `parsed` summary), or None when no round artifact exists."""
    best = None
    for p in REPO.glob("BENCH_r*.json"):
        try:
            n = int(p.stem.split("r")[-1])
        except ValueError:
            continue
        if best is None or n > best[0]:
            best = (n, p)
    if best is None:
        return None
    try:
        parsed = json.loads(best[1].read_text()).get("parsed") or {}
        ratio = parsed.get("ratio_headline")
    except (OSError, json.JSONDecodeError):
        return None
    return (best[1].name, float(ratio)) if ratio else None


def main() -> int:
    new_path = REPO / "BENCH_FULL.json"
    if not new_path.exists():
        print("bench_gate: no BENCH_FULL.json in working tree — skip")
        return 0
    new = json.loads(new_path.read_text())
    try:
        old_raw = subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
        old = json.loads(old_raw)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        print("bench_gate: no committed BENCH_FULL.json baseline — pass")
        return 0

    problems: list[str] = []
    checked = 0
    # `is not None` (not truthiness): a literal 0 or 0.0 is a broken artifact
    # we want to hear about, not a silent skip (ADVICE r10).
    ratio_old, ratio_new = old.get("ratio_headline"), new.get("ratio_headline")
    if ratio_old is not None and ratio_new is not None and ratio_old > 0:
        checked += 1
        drift = ratio_new / ratio_old - 1.0
        line = f"ratio_headline {ratio_old} -> {ratio_new} ({drift:+.1%})"
        if drift > RATIO_DRIFT:
            problems.append(line + f" exceeds +{RATIO_DRIFT:.0%}")
        else:
            print(f"bench_gate: {line} ok")
    else:
        print(
            "bench_gate: ratio_headline bound SKIPPED "
            f"(old={ratio_old!r} new={ratio_new!r} — key absent or zero)",
            file=sys.stderr,
        )
    wall_old, wall_new = old.get("value"), new.get("value")
    if wall_old is not None and wall_new is not None and wall_old > 0:
        checked += 1
        drift = wall_new / wall_old - 1.0
        line = f"headline wall {wall_old}s -> {wall_new}s ({drift:+.1%})"
        if drift > WALL_DRIFT:
            problems.append(line + f" exceeds +{WALL_DRIFT:.0%}")
        else:
            print(f"bench_gate: {line} ok")
    else:
        print(
            "bench_gate: headline-wall bound SKIPPED "
            f"(old={wall_old!r} new={wall_new!r} — key absent or zero)",
            file=sys.stderr,
        )
    anchor = _round_anchor()
    if anchor is not None and ratio_new is not None:
        checked += 1
        aname, aratio = anchor
        drift = ratio_new / aratio - 1.0
        line = f"ratio_headline vs round anchor {aname} {aratio} -> {ratio_new} ({drift:+.1%})"
        if drift > ANCHOR_RATIO_DRIFT:
            problems.append(line + f" exceeds +{ANCHOR_RATIO_DRIFT:.0%}")
        else:
            print(f"bench_gate: {line} ok")
    if checked == 0:
        print(
            "bench_gate: WARNING — no bound was checked at all; the gate "
            "passed vacuously, not because the bench is clean",
            file=sys.stderr,
        )
    # Amend/rebase caveat (documented, not detectable here): the baseline is
    # HEAD, so if a regressed BENCH_FULL.json is already in HEAD the gate
    # compares regressed-vs-regressed.  `git commit --amend` flows should run
    # `git stash && python scripts/bench_gate.py` against the pre-amend HEAD.

    if not problems:
        return 0
    note = os.environ.get("BENCH_GATE_NOTE", "").strip()
    for p in problems:
        print(f"bench_gate: REGRESSION — {p}", file=sys.stderr)
    if note:
        print(f"bench_gate: acknowledged via BENCH_GATE_NOTE: {note}")
        return 0
    print(
        "bench_gate: FAIL — fix the regression, or acknowledge it with\n"
        '  BENCH_GATE_NOTE="reason (e.g. host drift proven by A/B)" git commit ...',
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
