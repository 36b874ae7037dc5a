"""Scan-pruning spot-check (guide §6): for representative queries over
the two widest tables (documents, events), extract every parquet scan
node's ReadSchema and PushedFilters from the formatted physical plan —
the evidence that column pruning and predicate pushdown reach the
scans. Appends/updates the '## Scan pruning spot-check' section of
PLANS.md.

Usage: python tools/scan_pruning_report.py <sf_dir>
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Queries chosen to cover the widest scans with filters: documents
#: (text + quality + lang + source + n_bytes...) and events
#: (timestamps + user/doc ids + event_type...). Checkpoint-free plans
#: so the report is a pure driver-side explain.
PROBES = [
    ("documents", "text_stats"),
    ("documents", "quality_deciles"),
    ("documents", "pipeline_training_corpus"),
    ("events", "events_hourly_agg"),
    ("events", "events_retention"),
    ("events", "events_funnel"),
]

MARKER = "## Scan pruning spot-check"


def main() -> None:
    sf_dir = sys.argv[1]

    from duckdb_gsheets_spark.operators import all_queries
    from duckdb_gsheets_spark.plans.session import get_spark

    spark = get_spark("scan_pruning_report")
    qs = all_queries()
    lines = [MARKER, ""]
    lines.append(
        f"`python tools/scan_pruning_report.py {sf_dir}` — every parquet "
        "scan node's ReadSchema / PushedFilters for representative "
        "queries over the widest tables, proving column pruning and "
        "predicate pushdown reach the scans (guide §6)."
    )
    lines.append("")
    for table, name in PROBES:
        df = qs[name].spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        scans = []
        for block in re.split(r"\n\n", plan):
            if "Scan parquet" not in block:
                continue
            rs = re.search(r"ReadSchema: (.*)", block)
            if rs is None:  # the numbered plan-tree header, not a node
                continue
            loc = re.search(r"Location:.*?([a-z_]+)\.parquet", block)
            pf = re.search(r"PushedFilters: (.*)", block)
            scans.append(
                (
                    loc.group(1) if loc else "?",
                    rs.group(1).strip(),
                    pf.group(1).strip() if pf else "[]",
                )
            )
        lines.append(f"### {name} (probing `{table}`)")
        lines.append("")
        if not scans:
            lines.append("- no parquet scan in final plan (checkpoint-rooted)")
        for tbl, rs, pf in scans:
            lines.append(f"- scan `{tbl}`: ReadSchema `{rs}`")
            lines.append(f"  PushedFilters `{pf}`")
        lines.append("")

    plans_md = os.path.join(REPO, "PLANS.md")
    with open(plans_md) as f:
        body = f.read()
    if MARKER in body:
        body = body[: body.index(MARKER)].rstrip() + "\n\n"
    else:
        body = body.rstrip() + "\n\n"
    with open(plans_md, "w") as f:
        f.write(body + "\n".join(lines).rstrip() + "\n")
    print(f"updated {plans_md} with {len(PROBES)} probes")


if __name__ == "__main__":
    main()
