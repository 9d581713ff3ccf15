#!/usr/bin/env python
"""Regenerate SHUFFLES.md: a plan-statistics audit over EVERY registered
query — exchanges (shuffles), broadcast vs sort-merge vs nested-loop
joins, scans, and whether aggregation stays partial (map-side). This is
the systematic version of the spot plan tests: one table the reviewer
can scan for scale smells (a query whose shuffle count jumps, a join
that silently stopped broadcasting). Run: `python tools/shuffle_audit.py`.

Single-partition policy (the round-10 lesson — three rank-statistic
queries shipped with global sort windows and nothing failed): every
``Exchange SinglePartition`` is CLASSIFIED by its parent operator.

* ``scalar``  — parent is a KEYLESS aggregate (HashAggregate(keys=[])
  etc.): the exchange merges one partial row per upstream task.
  Bounded by task count, inherent to any scalar statistic — benign.
* ``limit``   — parent is TakeOrderedAndProject / CollectLimit: a
  top-k / LIMIT merge of per-partition prefixes — benign.
* ``sort``    — parent is Sort / Window / WindowGroupLimit: EVERY ROW
  of the input flows through one task.  This is the named
  scale-killer; it is an ERROR unless the query is on the explicit
  allowlist below with a reason (only dictionary-bounded frames —
  top-k shortlists, per-day rollups, fixed bucket grids — qualify).
* ``other``   — anything else: always an error (classify it first).

``python tools/shuffle_audit.py --check`` (used by release_gate) exits
non-zero on any unlisted sort/other single-part, so the next
single-partition sort fails the gate instead of sailing through.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries allowed to keep a sort-class Exchange SinglePartition, each
# with the bounded frame that justifies it.  A NEW sort single-part
# anywhere else fails the gate.  (Scalar-agg and limit merges are
# classified automatically and never need listing.)
SINGLE_PART_ALLOWLIST: dict[str, str] = {
    # 9-row first-digit rollup (analytics.benford_screen digit grid)
    "benford_screen": "digit-grid",
    # cum over one row per calendar DAY (analytics.py:381 argues the
    # rewrite: users fold to first-seen days before the window)
    "cumulative_new_users": "per-day",
    # one row per corpus SOURCE (features.py:171)
    "mixture_temperature_weights": "per-source",
    # cum over ~64 power-of-two length buckets (features.py:884)
    "seq_length_buckets": "bucket-grid",
    # prefix over the fixed packing-bucket grid (packing.py:72 — the
    # module docstring derives the bucket-count bound)
    "sequence_packing_layout": "bucket-grid",
}

_SORT_PARENTS = ("Sort ", "Sort(", "Window ", "Window(", "WindowGroupLimit")
_LIMIT_PARENTS = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit")


def _indent(line: str) -> int:
    i = 0
    for ch in line:
        if ch in "+-: *()":
            i += 1
        else:
            break
    return i


def classify_single_parts(plan: str) -> dict[str, int]:
    """Count Exchange SinglePartition nodes per class (scalar / limit /
    sort / other) by walking up to each node's parent operator."""
    out = {"scalar": 0, "limit": 0, "sort": 0, "other": 0}
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        my = _indent(ln)
        parent = ""
        for j in range(i - 1, -1, -1):
            if lines[j].strip() and _indent(lines[j]) < my:
                parent = lines[j].strip().lstrip("+-: *")
                break
        if re.match(r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]", parent):
            out["scalar"] += 1
        elif parent.startswith(_LIMIT_PARENTS):
            out["limit"] += 1
        elif parent.startswith(_SORT_PARENTS):
            out["sort"] += 1
        else:
            out["other"] += 1
    return out


def main() -> None:
    check = "--check" in sys.argv
    from fastetl_spark.session import get_spark

    spark = get_spark(
        "shuffle-audit",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    queries = m.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    rows = []
    violations = []
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
        except Exception as e:  # noqa: BLE001 - audit keeps going
            rows.append((name, "-", "-", "-", "-", "-", f"ERR {type(e).__name__}"))
            violations.append(f"{name}: plan error {type(e).__name__}")
            continue
        exchanges = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan))
        sp = classify_single_parts(plan)
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        scans = plan.count("FileScan parquet") + plan.count("Scan parquet")
        note = []
        if sp["scalar"]:
            note.append(f"{sp['scalar']} 1part-scalar")
        if sp["limit"]:
            note.append(f"{sp['limit']} 1part-limit")
        bad = sp["sort"] + sp["other"]
        if bad:
            reason = SINGLE_PART_ALLOWLIST.get(name)
            if reason:
                note.append(f"{bad} 1part-sort (allowed: {reason})")
            else:
                note.append(f"{bad} 1part-sort UNLISTED")
                violations.append(
                    f"{name}: {sp['sort']} sort + {sp['other']} other"
                    " single-part exchange(s) not on SINGLE_PART_ALLOWLIST"
                )
        if bnlj:
            note.append("nested-loop")
        rows.append((name, exchanges, bhj, smj, bnlj, scans, "; ".join(note)))

    stale = sorted(set(SINGLE_PART_ALLOWLIST) - set(queries))
    if stale:
        violations.append(f"allowlist names unknown queries: {stale}")

    lines = [
        "# Shuffle / join audit (generated by tools/shuffle_audit.py)",
        "",
        "Per-query physical-plan statistics at sf0.01. `exch` counts",
        "hash/range repartition exchanges (shuffles). Exchange",
        "SinglePartition nodes are classified by parent operator:",
        "`1part-scalar` (keyless-aggregate merge, one row per task —",
        "benign), `1part-limit` (top-k/LIMIT merge — benign),",
        "`1part-sort` (global Sort/Window: every row through one task —",
        "scale-killer, must be on the audit's SINGLE_PART_ALLOWLIST",
        "with a bounded-frame reason, else the release gate fails).",
        "Nested-loop joins are legitimate only on dictionary-sized",
        "inputs (fuzzy matching) or scalar-subquery broadcasts.",
        "Iterative operators (connected components) and",
        "localCheckpoint-backed plans report the post-checkpoint plan.",
        "",
        "| query | exch | bcast join | SMJ | NLJ | scans | notes |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLES.md")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"SHUFFLES.md written ({len(rows)} queries)")
    if violations:
        print("SINGLE-PART VIOLATIONS:")
        for v in violations:
            print(" -", v)
    else:
        print("single-part policy: clean")
    spark.stop()
    if check and violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
