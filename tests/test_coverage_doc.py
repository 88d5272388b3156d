"""COVERAGE.md must stay in sync with the registry (it is generated;
a stale copy would misreport the operator inventory to reviewers)."""

from __future__ import annotations

import io
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coverage_md_current():
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_coverage.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    committed = (REPO / "COVERAGE.md").read_text()
    assert out.strip() == committed.strip(), (
        "COVERAGE.md is stale — regenerate with "
        "`python scripts/gen_coverage.py > COVERAGE.md`"
    )


def test_every_query_has_coverage_row():
    from mkpipe_extractor_clickhouse_spark.registry import all_specs

    committed = (REPO / "COVERAGE.md").read_text()
    missing = [n for n in all_specs() if f"`{n}`" not in committed]
    assert not missing, f"queries missing from COVERAGE.md: {missing}"


def test_queries_md_current():
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_cookbook.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    committed = (REPO / "QUERIES.md").read_text()
    assert out.strip() == committed.strip(), (
        "QUERIES.md is stale — regenerate with "
        "`python scripts/gen_cookbook.py > QUERIES.md`"
    )
