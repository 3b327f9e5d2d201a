"""Report sink — driver-side artifact from already-collected aggregates.

Functional equivalent of the reference's PDF report (app_v3.py:514-643): a
layout of the TableScore's global score, per-dimension scores, worst columns,
and issues by severity. Rendered as markdown + JSON (fpdf is a UI dependency,
not an engine one); like the reference, it touches ONLY collected aggregate
rows — never the data.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from data_quality_check_spark.operators.scoring import DIMENSIONS, TableScore

WORST_COLUMNS = 14  # reference shows the 14 worst columns (app_v3.py:631)

_SEVERITY_ORDER = {"high": 0, "medium": 1, "low": 2}


def score_report_markdown(ts: TableScore) -> str:
    lines = [
        f"# Data quality report — {ts.table_name}",
        "",
        f"*engine: {ts.engine} · rows: {ts.row_count:,} · columns: {ts.col_count} · "
        f"scored at {ts.scored_at}*",
        "",
        f"## Global score: {ts.global_score}",
        "",
        "| dimension | score |",
        "| --- | --- |",
    ]
    for d in DIMENSIONS:
        lines.append(f"| {d} | {getattr(ts, d)} |")

    worst = sorted(ts.columns, key=lambda c: c.overall)[:WORST_COLUMNS]
    if worst:
        lines += ["", f"## Worst columns (bottom {len(worst)})", "",
                  "| column | completeness | uniqueness | overall |", "| --- | --- | --- | --- |"]
        for c in worst:
            lines.append(f"| {c.name} | {c.completeness} | {c.uniqueness} | {c.overall} |")

    if ts.issues:
        by_sev: dict[str, list] = {}
        for issue in ts.issues:
            by_sev.setdefault(issue.get("severity", "low"), []).append(issue)
        lines += ["", "## Issues", ""]
        for sev in sorted(by_sev, key=lambda s: _SEVERITY_ORDER.get(s, 9)):
            lines.append(f"### {sev} ({len(by_sev[sev])})")
            for issue in by_sev[sev]:
                col = f" `{issue['column']}`" if issue.get("column") else ""
                lines.append(f"- [{issue.get('dimension', '?')}]{col} {issue.get('message', '')}")
            lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def score_report_json(ts: TableScore) -> str:
    return json.dumps(asdict(ts), indent=2, default=str)


def write_report(ts: TableScore, path: str) -> str:
    """Write markdown (plus sibling .json and .pdf — the reference's artifact,
    app_v3.py:514-643) reports; returns the markdown path."""
    from data_quality_check_spark.operators.pdf import score_report_pdf

    md = score_report_markdown(ts)
    with open(path, "w") as f:
        f.write(md)
    # splitext, not rsplit('.'): an extension-less filename under a dotted
    # directory ('/tmp/run.2026/report') must not split on the DIRECTORY dot
    # and scatter the .json/.pdf siblings outside the intended folder
    base = os.path.splitext(path)[0]
    with open(base + ".json", "w") as f:
        f.write(score_report_json(ts))
    score_report_pdf(ts, base + ".pdf")
    return path
