"""Physical-plan audit: .explain("formatted") every oracle query and grep
for the properties that matter at 100 TB — parquet pushdown (PushedFilters /
ReadSchema pruning), broadcast vs shuffle joins, WholeStageCodegen spans,
and absence of cartesian products (except where intended).

Usage: python tools/plan_audit.py [query ...]   (writes BENCH/PLANS.md)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
        df.explain()  # simple mode: codegen spans appear as *(n)
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    notes = []
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nonempty = [p for p in pushed if p.strip()]
        if nonempty:
            notes.append(f"pushdown: {len(nonempty)} scan(s) with pushed filters")
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    for s in scans:
        ncols = len(s.split(",")) if s else 0
        if ncols > 12:
            notes.append(f"WARN wide scan ({ncols} cols) — check column pruning")
    if "BroadcastHashJoin" in plan:
        notes.append(f"joins: {plan.count('BroadcastHashJoin')} broadcast")
    if "SortMergeJoin" in plan:
        notes.append(f"joins: {plan.count('SortMergeJoin')} sort-merge")
    if "ShuffledHashJoin" in plan:
        notes.append(f"joins: {plan.count('ShuffledHashJoin')} shuffled-hash")
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        notes.append("WARN nested-loop/cartesian present")
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    notes.append(f"codegen spans: {n_wsc}")
    n_ex = plan.count("Exchange")
    notes.append(f"exchanges: {n_ex}")
    return notes


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from azuresearchcrawlervector_spark.session import get_spark
    import __spark_entry__ as entrymod

    only = set(sys.argv[1:])
    sf = "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", shuffle_partitions=4,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# Physical-plan audit (sf0.01, local[4])", ""]
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        if name == "crawl_flagship":
            continue  # iterative engine, not a single plan
        try:
            plan = plan_of(fn(spark, sf))
        except Exception as e:
            out.append(f"## {name}\n- ERROR: {e}\n")
            continue
        out.append(f"## {name}")
        for note in audit(name, plan):
            out.append(f"- {note}")
        out.append("")
        print(name, "audited")
    os.makedirs("BENCH", exist_ok=True)
    # hand-written audit commentary survives regeneration: everything
    # from "## Notes" down in the existing file is re-appended
    notes = ""
    try:
        with open("BENCH/PLANS.md") as fh:
            prev = fh.read()
        i = prev.find("## Notes")
        if i >= 0:
            notes = "\n" + prev[i:]
    except FileNotFoundError:
        pass
    with open("BENCH/PLANS.md", "w") as fh:
        fh.write("\n".join(out) + notes)
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
