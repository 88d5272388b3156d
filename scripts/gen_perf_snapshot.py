"""Render the generated artifact snapshot in PERF.md (VERDICT r10 item 2).

Round 10 shipped a PERF.md parity table whose numbers were transcribed
from a measurement run that never made it into the committed artifact —
the code was right but the evidence chain was broken. This script makes
that class of drift impossible the same way COVERAGE.md/QUERIES.md are
protected: the headline numbers PERF.md presents are RENDERED FROM the
committed artifacts (BENCH_FULL.json, SCALEUP.json), each table carries
the artifact's own measured_on stamp, and tests/test_perf_snapshot.py
fails whenever the committed block differs from a fresh render.

Usage:
    python scripts/gen_perf_snapshot.py            # print the block
    python scripts/gen_perf_snapshot.py --write    # splice into PERF.md

PERF.md must contain the marker pair:
    <!-- BEGIN GENERATED ARTIFACT SNAPSHOT (scripts/gen_perf_snapshot.py) -->
    <!-- END GENERATED ARTIFACT SNAPSHOT -->
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BEGIN = "<!-- BEGIN GENERATED ARTIFACT SNAPSHOT (scripts/gen_perf_snapshot.py) -->"
END = "<!-- END GENERATED ARTIFACT SNAPSHOT -->"


def _load(name: str) -> dict:
    try:
        return json.loads((REPO / name).read_text())
    except (OSError, ValueError):
        return {}


def _stamp(section: dict) -> str:
    m = section.get("measured_on") or {}
    if not m:
        return "_no measured_on stamp (pre-r11 artifact)_"
    return f"measured on `{m.get('git_sha', '?')}` at {m.get('at', '?')}"


def _fmt(x, nd=2):
    if x is None:
        return "—"
    if isinstance(x, bool):
        return "yes" if x else "no"
    if isinstance(x, dict):  # per-query equality maps at the proof point
        n_true = sum(1 for v in x.values() if v)
        return f"{n_true}/{len(x)} queries" if x else "—"
    if isinstance(x, float):
        return f"{x:.{nd}f}"
    return str(x)


def render() -> str:
    bench = _load("BENCH_FULL.json")
    scaleup = _load("SCALEUP.json")
    out: list[str] = [BEGIN, ""]
    out.append(
        "_Everything in this section is rendered from the committed "
        "artifacts by `scripts/gen_perf_snapshot.py` and staleness-gated "
        "by `tests/test_perf_snapshot.py` — the numbers cannot drift from "
        "`BENCH_FULL.json` / `SCALEUP.json` without a test failure. "
        "Raw walls are host-sensitive (see the host-drift decomposition "
        "below); the DuckDB-normalized ratios are the stable metric._"
    )
    out.append("")

    if bench:
        out.append("#### Headline bench (BENCH_FULL.json)")
        out.append("")
        out.append(
            f"- headline total: **{_fmt(bench.get('value'))} "
            f"{bench.get('unit', 's')}** at sf "
            f"{bench.get('sf', '?')}; ratio vs DuckDB "
            f"**{_fmt(bench.get('ratio_headline'))}**"
        )
        qs = bench.get("queries") or {}
        if qs:
            out.append(
                "- per-query sec: "
                + ", ".join(f"{k} {_fmt(v)}" for k, v in sorted(qs.items()))
            )
        llm = bench.get("llm_suite") or {}
        if isinstance(llm, dict) and llm.get("ratio") is not None:
            out.append(f"- llm suite ratio: **{_fmt(llm.get('ratio'))}**")
        out.append("")

    pts = scaleup.get("points") or []
    if pts:
        out.append(
            f"#### Relational scale-up (SCALEUP.json, {_stamp(scaleup)})"
        )
        out.append("")
        out.append(
            "| lineitem rows | plain ratio | bucketed ratio | "
            "bucket_gen_sec | values_match |"
        )
        out.append("|---|---|---|---|---|")
        for p in pts:
            out.append(
                f"| {p.get('lineitem_rows', '?'):,} "
                f"| {_fmt(p.get('ratio'))} | {_fmt(p.get('ratio_bucketed'))} "
                f"| {_fmt(p.get('bucket_gen_sec'), 1)} "
                f"| {_fmt(p.get('values_match', p.get('bucketed_matches_plain')))} |"
            )
        out.append("")

    llm = scaleup.get("llm") or {}
    lpts = llm.get("points") or []
    if lpts:
        out.append(f"#### LLM vector kernels (SCALEUP.json llm, {_stamp(llm)})")
        out.append("")
        out.append(
            "| vectors | l3 ratio | l4 ratio | l4c ratio | suite ratio "
            "| pack_sec | fold==packed |"
        )
        out.append("|---|---|---|---|---|---|---|")
        for p in lpts:
            du = p.get("duckdb") or {}
            sp = p.get("spark") or {}

            def r(q, sp=sp, du=du):
                s, d = sp.get(q), du.get(q)
                return s / d if s and d else None

            out.append(
                f"| {p.get('vectors', '?'):,} "
                f"| {_fmt(r('l3_topk_cosine'))} "
                f"| {_fmt(r('l4_distributed_topk'))} "
                f"| {_fmt(r('l4c_packed_topk'))} "
                f"| {_fmt(p.get('ratio'))} "
                f"| {_fmt(p.get('pack_sec'), 1)} "
                f"| {_fmt(p.get('l3_fold_eq_packed', p.get('l3_fold_eq_kernel')))} |"
            )
        out.append("")

    fuzzy = scaleup.get("fuzzy") or {}
    fpts = fuzzy.get("points") or []
    if fpts:
        out.append(f"#### Fuzzy join (SCALEUP.json fuzzy, {_stamp(fuzzy)})")
        out.append("")
        rows = ", ".join(
            f"{p.get('n_names', '?'):,} names → {_fmt(p.get('ratio'))}×"
            for p in fpts
        )
        out.append(f"- ratio vs DuckDB (same blocked algorithm): {rows}")
        out.append("")

    spatial = scaleup.get("spatial") or {}
    spts = spatial.get("points") or []
    if spts:
        out.append(f"#### Spatial joins (SCALEUP.json spatial, {_stamp(spatial)})")
        out.append("")
        rows = ", ".join(
            f"{p.get('events', '?'):,} events → {_fmt(p.get('ratio'))}×"
            for p in spts
        )
        out.append(f"- ratio vs DuckDB: {rows}")
        out.append("")

    streaming = scaleup.get("streaming") or {}
    tpts = streaming.get("points") or []
    if tpts:
        out.append(
            f"#### Streaming batch-equivalents (SCALEUP.json streaming, "
            f"{_stamp(streaming)})"
        )
        out.append("")
        out.append(
            "| events | ratio (all) | ratio (t2+t4 windows) | t13 kernel "
            "ratio | x1 rows/s | values_match |"
        )
        out.append("|---|---|---|---|---|---|")
        for p in tpts:
            sp, du = p.get("spark") or {}, p.get("duckdb") or {}
            w_s = sum(v for k, v in sp.items() if not k.startswith("t13"))
            w_d = sum(v for k, v in du.items() if not k.startswith("t13"))
            t13_s, t13_d = sp.get("t13_stateful_profile"), du.get(
                "t13_stateful_profile"
            )
            out.append(
                f"| {p.get('events', '?'):,} "
                f"| {_fmt(p.get('ratio'))} "
                f"| {_fmt(w_s / w_d if w_s and w_d else None)} "
                f"| {_fmt(t13_s / t13_d if t13_s and t13_d else None)} "
                f"| {p.get('x1_rows_per_sec', '—'):,} "
                f"| {_fmt(p.get('values_match'))} |"
            )
        out.append("")
        out.append(
            "_t13 routes through the applyInPandas stateful kernel by "
            "design (the streaming operator's batch face) while its "
            "DuckDB oracle is a plain GROUP BY — its column measures the "
            "Python-kernel premium, not window-vs-window; t2+t4 is the "
            "engine-vs-engine window comparison._"
        )
        out.append("")

    dedup = scaleup.get("dedup") or {}
    dpts = dedup.get("points") or []
    if dpts:
        out.append(
            f"#### Dedup kernels at constant dup rate (SCALEUP.json "
            f"dedup, {_stamp(dedup)})"
        )
        out.append("")
        out.append(
            "| documents | l1 ratio | l58 ratio | l2 PPJoin sec (pairs) "
            "| l2b LSH sec (pairs) | values_match |"
        )
        out.append("|---|---|---|---|---|---|")
        for p in dpts:
            sp, du = p.get("spark") or {}, p.get("duckdb") or {}
            cn = p.get("counts") or {}

            def r(q, sp=sp, du=du):
                # `is not None` (not truthiness): a legitimate
                # 0.0-rounded numerator must still render a ratio;
                # the divisor additionally guards against 0 (ADVICE r11).
                s, d = sp.get(q), du.get(q)
                return s / d if s is not None and d else None

            doc = p.get("documents")
            doc_s = f"{doc:,}" if isinstance(doc, int) else str(doc or "?")
            out.append(
                f"| {doc_s} "
                f"| {_fmt(r('l1_exact_dedup'))} "
                f"| {_fmt(r('l58_minhash_portable'))} "
                f"| {_fmt(sp.get('l2_jaccard_neardup'))} "
                f"({cn.get('l2_jaccard_neardup', 0):,}) "
                f"| {_fmt(sp.get('l2b_minhash_lsh'))} "
                f"({cn.get('l2b_minhash_lsh', 0):,}) "
                f"| {_fmt(p.get('values_match'))} |"
            )
        lin = dedup.get("linear_exact") or {}
        if lin:
            out.append("")
            out.append(
                "- linearity invariant (per-replica output identical at "
                "every point): "
                + ", ".join(f"{k} {_fmt(v)}" for k, v in sorted(lin.items()))
            )
        out.append("")

    sweep = _load("PERF_SWEEP.json")
    # r12: rank by oneshot_sec (rebuild+execute — includes builder-time
    # checkpoint pins) when present; steady_sec is the legacy protocol
    ssec = sweep.get("oneshot_sec") or sweep.get("steady_sec") or {}
    oneshot = "oneshot_sec" in sweep
    if ssec:
        out.append(
            f"#### Full-registry sweep tail (PERF_SWEEP.json, "
            f"{_stamp(sweep)})"
        )
        out.append("")
        total_key = "total_oneshot" if oneshot else "total"
        out.append(
            f"- {len(ssec)} queries timed at {sweep.get('sf_dir', '?')}, "
            f"total {_fmt(sweep.get(total_key), 1)} s "
            f"({'one-shot rebuild+execute' if oneshot else 'steady'}"
            f"{', steady total ' + str(sweep.get('total')) + ' s' if oneshot else ''}), "
            f"{len(sweep.get('errors') or {})} errors"
        )
        tail = list(ssec.items())[:5]
        out.append(
            "- slowest 5: "
            + ", ".join(f"{k} {_fmt(v)} s" for k, v in tail)
        )
        out.append("")

    out.append(END)
    return "\n".join(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="splice the block into PERF.md between the markers")
    args = ap.parse_args()
    block = render()
    if not args.write:
        print(block)
        return 0
    perf = (REPO / "PERF.md").read_text()
    b, e = perf.find(BEGIN), perf.find(END)
    if b == -1 or e == -1:
        raise SystemExit("PERF.md is missing the snapshot markers")
    new = perf[:b] + block + perf[e + len(END):]
    (REPO / "PERF.md").write_text(new)
    print("PERF.md snapshot updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
