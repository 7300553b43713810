"""Generate PLANS.md: a physical-plan audit of every registered query.

For each `__spark_entry__.queries()` entry the audit extracts, from the
Catalyst physical plan (pre-execution, AQE initial plan):

- exchanges: shuffle count (Exchange hashpartitioning/rangepartitioning/
  SinglePartition) — the dominant cost driver at 100 TB;
- broadcasts: BroadcastExchange count (dimension/one-row scalar sides);
- joins: the join strategies used (BHJ/SMJ/SHJ, semi/anti/outer flavors);
- pushdown: whether any parquet scan carries a non-empty PushedFilters;
- python: Arrow batch stages (ArrowEvalPython / InPandas / MapInArrow) —
  the deliberate Pandas-UDF slots; row-at-a-time BatchEvalPython is a
  hygiene failure (also asserted by tests) and would show up here;
- risk flags: CartesianProduct / BroadcastNestedLoopJoin on non-trivial
  inputs (one-row scalar broadcasts are expected and common).

Usage: python tools/plan_audit.py [sf_dir] [--out PLANS.md]

The output path is flag-only (--out) — a positional second argument once
let a transposed call silently overwrite the committed PLANS.md with an
error-filled table; and if more than 5% of queries error during the
audit, nothing is written at all (the run is presumed misconfigured).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_stream_processor_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict[str, object]:
    shuffles = len(re.findall(r"\bExchange (?:hash|range|SinglePartition)", plan))
    broadcasts = plan.count("BroadcastExchange")
    joins: list[str] = []
    for m in re.finditer(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b[^\n]*", plan
    ):
        line = m.group(0)
        kind = {
            "BroadcastHashJoin": "BHJ",
            "SortMergeJoin": "SMJ",
            "ShuffledHashJoin": "SHJ",
            "BroadcastNestedLoopJoin": "BNLJ",
            "CartesianProduct": "CART",
        }[m.group(1)]
        for flavor in ("LeftSemi", "LeftAnti", "LeftOuter", "RightOuter",
                       "FullOuter", "Cross"):
            if flavor in line:
                kind += f"/{flavor}"
                break
        joins.append(kind)
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
    arrow = len(re.findall(
        r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandasWithState|PythonMapInArrow", plan))
    rowpy = plan.count("BatchEvalPython")
    window = plan.count("Window") - plan.count("WindowGroupLimit")
    wgl = plan.count("WindowGroupLimit")
    topk = plan.count("TakeOrderedAndProject")
    # Partition-less Window (global sort to ONE task): WindowExec prints
    # `Window [fns], [part], [order]` when partitioned but only
    # `Window [fns], [order]` when global.  A global window over
    # corpus-scale input is a single-reducer scale-killer; over
    # aggregate-scale input (top-k vocab ranks, ≤n_groups rows) it's the
    # cheapest correct plan.  Counted here so the distinction is auditable.
    gwin = sum(
        1
        for line in plan.splitlines()
        if re.search(r"\bWindow \[", line)
        and len(re.findall(r"\], \[", line)) == 1
    )
    # Queries that localCheckpoint mid-build (iterative loops: MMR/RFM/CC
    # rounds) surface the checkpointed RDD as a `Scan ExistingRDD` leaf —
    # everything upstream of the checkpoint is INVISIBLE to this audit, so
    # a 0-exchange row here would be a lie, not a win.  Mark such rows
    # `ckpt=y` so they read as "truncated lineage", never "free".
    ckpt = bool(re.search(r"Scan ExistingRDD", plan))
    return {
        "shuffles": shuffles,
        "broadcasts": broadcasts,
        "joins": ",".join(joins) if joins else "-",
        "pushdown": "y" if pushed else "-",
        "arrow": arrow,
        "rowpy": rowpy,
        "window": window,
        "wgl": wgl,
        "topk": topk,
        "gwin": gwin,
        "ckpt": "y" if ckpt else "-",
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01",
        help="testdata scale-factor dir (default sf0.01)",
    )
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PLANS.md",
        ),
        help="output markdown path (flag-only on purpose)",
    )
    ap.add_argument(
        "--max-error-frac", type=float, default=0.05,
        help="abort without writing if more than this fraction of "
             "queries error (default 0.05)",
    )
    ns = ap.parse_args()
    sf_dir, out_md = ns.sf_dir, ns.out
    if not os.path.isdir(sf_dir):
        print(f"ERROR: sf_dir {sf_dir!r} is not a directory", file=sys.stderr)
        return 2
    spark = get_spark("plan-audit")
    rows = []
    failures = 0
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            rows.append((name, {"error": str(exc)[:80]}))
            failures += 1
            continue
        rows.append((name, audit_plan(plan)))
        spark.catalog.clearCache()
    if rows and failures > ns.max_error_frac * len(rows):
        print(
            f"ABORT: {failures}/{len(rows)} queries errored "
            f"(> {ns.max_error_frac:.0%}) — presuming a misconfigured "
            f"run; NOT writing {out_md}",
            file=sys.stderr,
        )
        return 2
    rows.sort(key=lambda kv: kv[0])
    lines = [
        "# PLANS — physical-plan audit of the registered surface",
        "",
        f"Auto-generated by `tools/plan_audit.py` at {sf_dir} "
        f"({len(rows)} queries). Columns: shuffle Exchanges, "
        "BroadcastExchanges, join strategies, parquet filter pushdown, "
        "Arrow/Pandas stages, row-at-a-time Python stages (must be 0), "
        "Window / WindowGroupLimit / TakeOrderedAndProject counts, and "
        "ckpt=y where localCheckpoint TRUNCATES the audited lineage "
        "(iterative queries: counts there cover only the post-checkpoint "
        "fragment — see the per-operator docstrings for the full loop "
        "shape, audited per-round in their tests).",
        "",
        "Global (partition-less) Window count `gwin` flags single-task "
        "sorts — legitimate only at aggregate scale (see SCALE.md notes).",
        "",
        "| query | xchg | bcast | joins | push | arrow | rowPy | win | wgl | topk | gwin | ckpt |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    total_rowpy = 0
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | ERROR: {a['error']} | | | | | | | | | | |")
            continue
        total_rowpy += int(a["rowpy"])  # type: ignore[arg-type]
        lines.append(
            f"| {name} | {a['shuffles']} | {a['broadcasts']} | {a['joins']} "
            f"| {a['pushdown']} | {a['arrow']} | {a['rowpy']} "
            f"| {a['window']} | {a['wgl']} | {a['topk']} | {a['gwin']} "
            f"| {a['ckpt']} |"
        )
    lines.append("")
    lines.append(
        f"Row-at-a-time Python stages across the surface: {total_rowpy} "
        "(hygiene invariant: 0)."
    )
    lines.append("")
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}: {len(rows)} queries, {failures} errors, "
          f"rowPy total {total_rowpy}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
