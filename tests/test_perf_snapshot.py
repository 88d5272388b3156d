"""PERF.md's artifact snapshot must match the committed artifacts.

Round 10's lesson (VERDICT item 1/2): a PERF.md table claimed numbers
from a measurement run whose artifact was never committed — prose and
artifact drifted silently. The generated snapshot block is the fix;
this test is the lock (same discipline as tests/test_coverage_doc.py).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_perf_snapshot_current():
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_perf_snapshot.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    committed = (REPO / "PERF.md").read_text()
    assert out.strip() in committed, (
        "PERF.md's artifact snapshot is stale — regenerate with "
        "`python scripts/gen_perf_snapshot.py --write`"
    )


def test_scaleup_sections_carry_measured_on():
    """Every SCALEUP section regenerated from r11 on must be stamped.

    Pre-r11 sections are grandfathered (the stamp is added on their next
    regeneration); this asserts the stamp machinery stays wired by
    checking at least one section carries it once any does — and that
    any present stamp has the expected shape."""
    import json

    scaleup = json.loads((REPO / "SCALEUP.json").read_text())
    sections = [scaleup] + [
        scaleup[k] for k in ("llm", "fuzzy", "spatial", "streaming")
        if k in scaleup
    ]
    stamped = [s for s in sections if "measured_on" in s]
    for s in stamped:
        m = s["measured_on"]
        assert isinstance(m.get("git_sha"), str) and m["git_sha"], m
        assert isinstance(m.get("at"), str) and "T" in m["at"], m
