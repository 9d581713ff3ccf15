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
  etc.) whose buffers are CONSTANT-SIZE: the exchange merges one
  partial row per upstream task.  Bounded by task count, inherent to
  any scalar statistic — benign.
* ``gather``  — parent is a keyless aggregate containing a GATHERING
  TypedImperativeAggregate (percentile_disc, percentile, median,
  mode, collect_list/set, listagg/string_agg/array_agg): the "one row
  per task" argument is FALSE — each partial row carries the task's
  whole value multiset, so the merge funnels ALL input values through
  one task (the r12 lesson: quantile_mapping_normalize's grid OOM'd a
  default-heap session at sf0.1 while the audit called it benign).
  ERROR unless on GATHER_ALLOWLIST with a bounded-input reason.
* ``limit``   — parent is TakeOrderedAndProject / CollectLimit: a
  top-k / LIMIT merge of per-partition prefixes — benign.
* ``sort``    — parent is Sort / Window / WindowGroupLimit: EVERY ROW
  of the input flows through one task.  This is the named
  scale-killer; it is an ERROR unless the query is on the explicit
  allowlist below with a reason (only dictionary-bounded frames —
  top-k shortlists, per-day rollups, fixed bucket grids — qualify).
* ``other``   — anything else: always an error (classify it first).

KEYED gathering aggregates (and Window nodes evaluating a gathering
function) are audited too: the buffer is per-GROUP rather than global,
which is only safe when per-group input is bounded — so every query
whose plan evaluates a gathering aggregate must carry a
GATHER_ALLOWLIST entry naming that bound (df-capped posting lists,
per-session event caps, documented moderate-group contracts).

Two further bounded-parallelism shapes are classified (the r13 VERDICT
blind spots — both invisible to the single-part walk because they are
plain hash exchanges / unnamed functions):

* **GROUPED_AGG pandas UDAFs** (``ArrowAggregatePython`` /
  ``AggregateInPandas`` plan nodes): a custom UDAF's buffer is the
  WHOLE GROUP by construction — Arrow ships each group's entire
  column set into one python worker — but its function name can never
  match the ``_GATHER_FUNCS`` regex, so the node TYPE is matched
  instead and audited exactly like a keyed gathering aggregate
  (GATHER_ALLOWLIST entry naming the per-group bound, else the gate
  fails).
* **Dictionary-keyed windows**: a Window whose partition spec consists
  ONLY of known dictionary-cardinality columns (``DICT_COLS``) runs
  as |dictionary| tasks regardless of cluster size — 5 tasks sorting
  ~20 TB each at 100 TB.  Flagged as ``dict-window``; ERROR unless on
  DICT_WINDOW_ALLOWLIST with the bounded-frame reason (only
  dictionary-sized supports qualify — raw-row or data-scale-support
  windows must move to ranks.bucketed_cum_sum /
  ranks.grouped_row_ranks).  The column list is a static nameable
  class, not inference — the r12 lesson: the gate can only defend
  shapes it can name, and a nameable class beats no class.

``python tools/shuffle_audit.py --check`` (used by release_gate) exits
non-zero on any unlisted sort/other single-part, any unlisted
gathering aggregate (built-in OR pandas-UDAF node), or any unlisted
dictionary-keyed window, so the next single-partition sort —
single-task multiset buffer — or dictionary-bounded stage fails the
gate instead of sailing through.
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

# Queries allowed to evaluate a GATHERING aggregate (multiset buffer),
# each with the input bound that keeps the buffer small.  Keyless
# gathers (the whole frame through ONE merge task) should not be here
# at all unless the frame itself is dictionary-sized; keyed/window
# gathers qualify only with a per-group cap.  A gathering aggregate
# anywhere else fails the gate (the r12 blind spot: a keyless
# percentile_disc grid was auto-classified a benign 1part-scalar and
# OOM'd a default-heap session at sf0.1 — quantile_mapping_normalize,
# since rerouted through rank_quantiles' distributed exact selection).
GATHER_ALLOWLIST: dict[str, str] = {
    # collect_set(event_type) per user: set bounded by the event-type
    # dictionary (6 values), not by the user's event count
    "array_agg_cluster": "event-type dictionary",
    # per-doc (pos, ln p) lists for the ordered surprisal fold:
    # bounded by per-document token count
    "bigram_surprisal": "per-doc tokens",
    "unigram_surprisal": "per-doc tokens",
    # shingle posting lists gathered ONLY after the two-phase df-cap
    # eliminates hot shingles as (shingle, count) rows — buffer <=
    # df_cap elements (dedup.py two-phase df-cap note)
    "dedup_containment": "df-capped postings",
    "dedup_jaccard_prefix": "df-capped postings",
    "dedup_ngram_jaccard": "df-capped postings",
    # composes ngram_jaccard_pairs -> same df-capped posting bound
    "split_leakage_report": "df-capped postings",
    # df-capped inverted-index posting lists (curation2 prefix filter)
    "sparse_cosine_shingles": "df-capped postings",
    # KEYLESS, but over the km curve frame: one row per distinct
    # duration DAY — bounded by the observation window, not by users
    # (docstring 'Scale shape')
    "kaplan_meier_conversion": "per-day curve state",
    # per-src (rnk, sim) lists over the kNN output: <= k rows/group
    "mutual_margin_pairs": "top-k shortlist",
    # EXACT-twin PageRank: per-node ordered contribution folds gather
    # in-degree lists for bit-reproducible sums; the scale path is the
    # throughput fold's plain F.sum (pagerank_*_throughput), this form
    # exists to be oracle-verifiable
    "pagerank_doc_graph": "exact-twin ordered fold (scale: throughput form)",
    "pagerank_link_graph": "exact-twin ordered fold (scale: throughput form)",
    # exact F.percentile over 3 return-flag groups: the documented
    # moderate-group contract (integral qty; sketch route at scale)
    "quantity_percentiles": "moderate-group contract",
    # percentile_disc median/MAD per event type: the documented
    # moderate-group contract (analytics.py 'Shape at scale' — route
    # through approx_quantiles_events at 100 TB/group)
    "robust_outlier_events": "moderate-group contract",
    # per-(user, session) event lists: bounded by session length
    "top_session_paths": "per-session events",
    # grouped-map applyInPandas keyed by user_id: each group is one
    # user's events — bounded by per-user activity, a data-scale KEY
    # with moderate groups (the §2.11 plugin-surface demo; heavy
    # per-user fan-in would move to the native window form the oracle
    # itself uses)
    "group_zscore_pandas": "per-user events (grouped-map demo)",
}

#: Known dictionary-cardinality columns of the fixture tables (static,
#: nameable — see module docstring).  A Window partitioned ONLY by
#: these is a bounded-parallelism stage at any cluster size.
DICT_COLS = {
    "event_type",
    "l_returnflag",
    "l_linestatus",
    "l_shipmode",
    "o_orderstatus",
    "o_orderpriority",
    "source",
}

#: Queries allowed to keep a Window partitioned only by DICT_COLS,
#: each with the reason its per-group frame is dictionary-sized (NOT
#: merely "the support is compressed" — a distinct-value support still
#: scales with the data; only a genuinely fixed grid qualifies).
DICT_WINDOW_ALLOWLIST: dict[str, str] = {
    # running min over the (l_returnflag, quantity) support:
    # l_quantity is a 1..50 integer dictionary, so the window frame is
    # <= 50 rows per flag — a fixed grid, not a data-scale support
    "pareto_frontier_lineitems": "1..50 quantity grid per flag",
}

_SORT_PARENTS = ("Sort ", "Sort(", "Window ", "Window(", "WindowGroupLimit")
_LIMIT_PARENTS = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit")
#: GROUPED_AGG pandas-UDAF plan nodes (Spark 4 spells it
#: ArrowAggregatePython; 3.x AggregateInPandas) — the buffer is the
#: whole group, audited as a keyed gather regardless of function name.
_PANDAS_AGG_NODES = (
    "ArrowAggregatePython",
    "AggregateInPandas",
    # grouped-MAP / cogrouped forms share the property: each group
    # (pair of groups) lands whole in one python worker batch
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInArrow",
    "FlatMapCoGroupsInPandas",
    "FlatMapCoGroupsInArrow",
)

# Gathering aggregate functions: TypedImperativeAggregates whose buffer
# holds the input multiset (or a list of it) rather than a constant-size
# state.  percentile_approx / approx_percentile are SKETCHES (constant
# buffer) and intentionally do not match — `percentile(` cannot match
# `percentile_approx(`.  The optional partial_/merge_/final_ prefixes
# cover the plan's aggregate-mode spellings.
_GATHER_FUNCS = re.compile(
    r"\b(?:partial_|merge_|final_)?"
    r"(percentile_disc|percentile_cont|percentile|median|mode|"
    r"collect_list|collect_set|listagg|string_agg|array_agg)\("
)
_AGG_NODE = re.compile(r"\b(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[(\]|[^\]])")


def count_gathers(plan: str) -> dict[str, int]:
    """Count plan nodes evaluating a GATHERING aggregate function,
    split by shape: ``keyless`` (global multiset through one merge
    task), ``keyed`` (per-group multiset buffers), ``window`` (a
    Window node evaluating e.g. collect_list over a frame).  Partial
    and final nodes of one logical aggregate both count — the audit
    cares about presence, not arity."""
    out = {"keyless": 0, "keyed": 0, "window": 0, "udaf": 0}
    for ln in plan.splitlines():
        s = ln.strip().lstrip("+-: *!")
        if s.startswith(_PANDAS_AGG_NODES):
            # custom GROUPED_AGG UDAF: the buffer is the whole group
            # by construction; no function-name regex can know it
            # (the r13 VERDICT blind spot), so match the node type
            out["udaf"] += 1
            continue
        if not _GATHER_FUNCS.search(s):
            continue
        m = _AGG_NODE.search(s)
        if m:
            out["keyless" if m.group(2) == "]" else "keyed"] += 1
        elif s.startswith(("Window ", "Window(", "WindowGroupLimit")):
            out["window"] += 1
    return out


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan line, in order."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start:i])
                start = -1
    return groups


_COL_REF = re.compile(r"#\d+L?")


def count_dict_windows(plan: str) -> int:
    """Count Window nodes whose partition spec is non-empty and made
    up ONLY of DICT_COLS columns — a stage whose parallelism is
    bounded by the dictionary's cardinality, not the cluster (the r13
    VERDICT finding: plain hash exchanges, invisible to the
    single-partition walk).  A Window with no partition spec at all is
    the global-sort case the 1part-sort class already covers.

    Exemption: a rank-filter top-k (``rank <= k``) plans a
    ``WindowGroupLimit ... Partial`` BELOW the exchange — every map
    task forwards at most k rows per group, so the dict-partitioned
    Window merges <= k x tasks rows per group: a top-k merge, the
    keyed analogue of the benign 1part-limit class
    (TakeOrderedAndProject).  Windows whose partition spec matches a
    Partial-mode WindowGroupLimit in the same plan are not counted."""
    limited: set[tuple] = set()
    for ln in plan.splitlines():
        s = ln.strip().lstrip("+-: *!")
        if s.startswith("WindowGroupLimit") and s.rstrip().endswith(
            "Partial"
        ):
            groups = _bracket_groups(s)
            if groups:
                limited.add(
                    tuple(
                        _COL_REF.sub("", c).strip().lower()
                        for c in groups[0].split(",")
                    )
                )
    n = 0
    for ln in plan.splitlines():
        s = ln.strip().lstrip("+-: *!")
        if not s.startswith(("Window ", "Window(")):
            continue
        groups = _bracket_groups(s)
        # [functions], [partition spec](, [order spec])? — partition
        # spec is the 2nd top-level group when present
        if len(groups) < 2 or not groups[1].strip():
            continue
        cols = [
            _COL_REF.sub("", c).strip().lower()
            for c in groups[1].split(",")
        ]
        if (
            cols
            and all(c in DICT_COLS for c in cols)
            and tuple(cols) not in limited
        ):
            n += 1
    return n


def _indent(line: str) -> int:
    i = 0
    for ch in line:
        if ch in "+-: *()":
            i += 1
        else:
            break
    return i


def classify_single_parts(plan: str) -> dict[str, int]:
    """Count Exchange SinglePartition nodes per class (scalar / gather
    / limit / sort / other) by walking up to each node's parent
    operator.  A keyless-aggregate parent is ``scalar`` (benign, one
    constant-size row per task) UNLESS it evaluates a gathering
    function — then it is ``gather``: the merge carries the full input
    multiset through one task."""
    out = {"scalar": 0, "gather": 0, "limit": 0, "sort": 0, "other": 0}
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        my = _indent(ln)
        parent = ""
        for j in range(i - 1, -1, -1):
            if lines[j].strip() and _indent(lines[j]) < my:
                parent = lines[j].strip().lstrip("+-: *!")
                break
        if re.match(r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]", parent):
            out["gather" if _GATHER_FUNCS.search(parent) else "scalar"] += 1
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
            rows.append((name, "-", "-", "-", "-", "-", "-", f"ERR {type(e).__name__}"))
            violations.append(f"{name}: plan error {type(e).__name__}")
            continue
        exchanges = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan))
        sp = classify_single_parts(plan)
        ga = count_gathers(plan)
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
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
        n_gather = ga["keyless"] + ga["keyed"] + ga["window"] + ga["udaf"]
        if n_gather:
            shape = "/".join(
                f"{ga[k]} {k}"
                for k in ("keyless", "keyed", "window", "udaf")
                if ga[k]
            )
            reason = GATHER_ALLOWLIST.get(name)
            if reason:
                note.append(f"gather[{shape}] (allowed: {reason})")
            else:
                note.append(f"gather[{shape}] UNLISTED")
                violations.append(
                    f"{name}: gathering aggregate ({shape}) not on"
                    " GATHER_ALLOWLIST — a multiset buffer needs a"
                    " documented input bound"
                )
        dw = count_dict_windows(plan)
        if dw:
            reason = DICT_WINDOW_ALLOWLIST.get(name)
            if reason:
                note.append(f"{dw} dict-window (allowed: {reason})")
            else:
                note.append(f"{dw} dict-window UNLISTED")
                violations.append(
                    f"{name}: {dw} Window(s) partitioned ONLY by"
                    " dictionary columns — parallelism bounded at the"
                    " dictionary cardinality; route through"
                    " ranks.bucketed_cum_sum/grouped_row_ranks or add"
                    " a DICT_WINDOW_ALLOWLIST entry with the"
                    " fixed-grid bound"
                )
        if sp["gather"] and not ga["keyless"]:
            # belt-and-braces: a keyless gather merge whose parent line
            # the node scan missed still fails the gate
            violations.append(
                f"{name}: {sp['gather']} 1part-gather exchange(s)"
                " (keyless gathering-aggregate merge) not matched by"
                " count_gathers — classify it"
            )
        if bnlj:
            note.append("nested-loop")
        rows.append((name, exchanges, bhj, smj, shj, bnlj, scans, "; ".join(note)))

    for lst, lname in (
        (SINGLE_PART_ALLOWLIST, "SINGLE_PART_ALLOWLIST"),
        (GATHER_ALLOWLIST, "GATHER_ALLOWLIST"),
        (DICT_WINDOW_ALLOWLIST, "DICT_WINDOW_ALLOWLIST"),
    ):
        stale = sorted(set(lst) - set(queries))
        if stale:
            violations.append(f"{lname} names unknown queries: {stale}")

    lines = [
        "# Shuffle / join audit (generated by tools/shuffle_audit.py)",
        "",
        "Per-query physical-plan statistics at sf0.01. `exch` counts",
        "hash/range repartition exchanges (shuffles). Exchange",
        "SinglePartition nodes are classified by parent operator:",
        "`1part-scalar` (keyless-aggregate merge of CONSTANT-SIZE",
        "buffers, one row per task — benign), `1part-limit`",
        "(top-k/LIMIT merge — benign), `1part-sort` (global",
        "Sort/Window: every row through one task — scale-killer, must",
        "be on the audit's SINGLE_PART_ALLOWLIST with a bounded-frame",
        "reason, else the release gate fails). `gather[...]` marks",
        "plans evaluating a GATHERING aggregate (percentile_disc,",
        "collect_list/set, mode, ...): keyless = the full input",
        "multiset through ONE merge task, keyed/window = per-group",
        "multiset buffers, udaf = a GROUPED_AGG pandas-UDAF node whose",
        "buffer is the whole group by construction — every occurrence",
        "must be on GATHER_ALLOWLIST with the input bound that keeps",
        "the buffer small, else the gate fails (sketches like",
        "percentile_approx are constant-size and exempt).",
        "`dict-window` marks Window nodes partitioned ONLY by known",
        "dictionary-cardinality columns (DICT_COLS): parallelism is",
        "bounded at the dictionary size regardless of cluster — must",
        "be on DICT_WINDOW_ALLOWLIST with a fixed-grid reason, else",
        "the gate fails.",
        "Nested-loop joins are legitimate only on dictionary-sized",
        "inputs (fuzzy matching) or scalar-subquery broadcasts.",
        "Iterative operators (connected components) and",
        "localCheckpoint-backed plans report the post-checkpoint plan.",
        "`SHJ` counts ShuffledHashJoin nodes — since r14 the session",
        "prefers shuffled-hash over sort-merge when a per-partition",
        "hash map fits (no sort on either side); the planner falls",
        "back to sort-merge past the size bounds, so a non-zero SMJ",
        "column marks genuinely big-big joins.",
        "",
        "| query | exch | bcast join | SMJ | SHJ | NLJ | scans | notes |",
        "|---|---|---|---|---|---|---|---|",
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
