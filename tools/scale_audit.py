"""Generate SCALE.md: a per-query physical-plan audit of every batch
query in the registry — the at-a-glance evidence that plans have the
shape a 100 TB deployment needs.

Columns:
- exchanges:  shuffle count in the executed plan (lower = better;
  0 = embarrassingly parallel projection/scan pipeline)
- scans:      parquet scans (re-scans of the same table show up here)
- python:     whether the plan contains an Arrow/Python stage
  (mapInPandas / applyInPandas) — the deliberate slow path
- bcast:      broadcast joins/exchanges (small-side dims)
- agg:        HashAggregate/ObjectHashAggregate count (SortAggregate
  is banned registry-wide by tests/test_plans.py)

Beyond the table, two enumerated-and-justified sections: plans with
>= 6 shuffles, and plans containing a single-partition WindowExec
(empty partition spec) — each such row needs a one-line justification
in HIGH_SHUFFLE_NOTES / GLOBAL_WINDOW_NOTES or it is flagged
UNEXPLAINED in SCALE.md and warned on stdout.

Usage: python tools/scale_audit.py [sf_dir] [query ...]

With query names, audits ONLY those (printed to stdout, SCALE.md
untouched) — the fast loop while trimming a plan; the full run that
rewrites SCALE.md takes ~13 min.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from arcon_spark.session import get_spark

# One-line justifications for any row that still plans >= 6 shuffles —
# the audit refuses to leave such a row unexplained (exit message +
# UNEXPLAINED marker in SCALE.md). Add a note when a high-shuffle plan
# is the semantically-required shape; trim the plan otherwise.
HIGH_SHUFFLE_NOTES: dict[str, str] = {
    "graph_triangle_count": (
        "the wedge-closure join sequence IS the algorithm: e1⋈e2 (on b=a) "
        "and ⋈e3 (on a,b) are differently-keyed exchanges over the deduped, "
        "checkpointed edge list, plus the scalar node/edge audit rows; the "
        "low→high orientation bounds the wedge join by Σd², and the edge "
        "list is orders smaller than the fact table it came from"
    ),
    "exact_median_selection": (
        "deliberate two-phase selection: the histogram pass, the "
        "cumulative-rank windows, and the pruned-sliver rescan each need "
        "their own event_type-keyed exchange — but every exchange after "
        "phase 1 moves only per-bin/per-sliver rows, never the full data; "
        "this is the bounded-memory alternative to a global sort"
    ),
    "ts_similarity_topk_sax": (
        "the symbolize→band→verify funnel is a chain of differently-"
        "keyed aggregations over the CHECKPOINTED per-user profile "
        "(users x ≤24 rows, events already reduced): segment agg, word "
        "agg, band-key self-join, candidate distinct, dot agg, norms "
        "— every exchange after the profile moves per-user or "
        "per-candidate rows, never event-scale data; this pipeline "
        "replaces the exact kernel's all-pairs tile matmul"
    ),
    "text_bigram_assoc_score": (
        "each exchange is a distinct semantic key: spread of the "
        "single-file scan, corpus pair-count agg, vocabulary agg, the "
        "inverted-index rejoin on (w1,w2), and the per-doc mean on doc_id; "
        "the stats tables and the rejoin cannot share a partitioning, and "
        "the vocabulary sides ride as broadcasts"
    ),
}


# One-line justifications for any query whose plan contains a
# single-partition WindowExec (empty partition spec — "No Partition
# Defined" at runtime): legitimate ONLY over a DERIVED table whose row
# count is bounded by construction (hours, bins, slivers, scalar
# audits), never over event-scale data. The audit refuses to leave
# such a row unexplained, exactly like the >=6-shuffle rows.
_TPR_NOTE = (
    "io.two_phase_rank offset table: the only global window runs over "
    "one row per range partition (rows = shuffle width, a cluster "
    "constant); the corpus-scale rank/cumsum itself is per-partition"
)
GLOBAL_WINDOW_NOTES: dict[str, str] = {
    # --- rewritten in r7 onto io.two_phase_rank (range exchange +
    # per-partition rank + broadcast #partitions-row offsets): the
    # detector still sees the offset table's tiny global window
    "corpus_shuffle_rank": _TPR_NOTE,
    "corpus_pack_bins": _TPR_NOTE,
    "histogram_equidepth_value": _TPR_NOTE,
    "rfm_customer_segments": _TPR_NOTE + " (three chained ranks, one per RFM axis)",
    "tokenizer_vocab_coverage": _TPR_NOTE,
    # --- bounded derived tables: the window input is hours / bins /
    # shards / top-k partials by construction, never event-scale
    "bpe_pair_merge_stats": (
        "rank <= top-k filter plans as WindowGroupLimit: the Partial "
        "trim caps the single-partition input at k rows per map "
        "partition (k * shuffle-width), not the pair vocabulary"
    ),
    "decayed_topk_parts": (
        "rank <= top-k over the per-part scored aggregate plans as "
        "WindowGroupLimit — Partial trim bounds the final window at "
        "k rows per partition"
    ),
    "cumulative_distinct_users": (
        "running sum over the per-HOUR new-user counts — rows bounded "
        "by the time horizon (8760/year), not events"
    ),
    "dedup_sorted_neighborhood": (
        "the global lead() runs ONLY on the boundary stitch frame — "
        "heads/tails of each sort bucket, O(#buckets * window) rows "
        "independent of corpus size; the corpus-scale lead is "
        "per-bucket (see the SHARDED-sort docstring)"
    ),
    "gini_best_split_totalprice": (
        "cumulative class counts + argmin over the 100-row price-BIN "
        "table; bin count is a constant of the operator"
    ),
    "heavy_hitters_shard_union": (
        "ranks run on the candidate union (<= local-M per shard, "
        "shard count fixed) and the truth set trimmed to K via "
        "WindowGroupLimit — both bounded by sketch parameters"
    ),
    "hybrid_search_rrf": (
        "both ranker outputs end in TakeOrdered/top-k (<= K rows "
        "each); the rank-assignment and RRF-fusion windows run on "
        "<= 2K rows regardless of corpus size"
    ),
    "pareto_frontier_orders": (
        "running max over the per-DATE max-price table (|distinct "
        "dates| rows, bounded by the calendar); the corpus-scale "
        "dominance test is a broadcast threshold join"
    ),
    "sequence_gap_report": (
        "global lead over one min-row per 2^14-id shard — a 4-orders-"
        "of-magnitude reduction of the key space; re-shard "
        "hierarchically if the id space outgrows it"
    ),
    "skew_diagnostics_events": (
        "rank over the per-KEY count aggregate trimmed to the top-k "
        "report rows via WindowGroupLimit; diagnostics output is "
        "k rows by construction"
    ),
    "stl_decompose_hourly": (
        "centered moving average over the per-HOUR series "
        "(8760/year rows); decomposing many series in parallel adds "
        "the series key to PARTITION BY (see docstring)"
    ),
    "survival_risk_table": (
        "cumulative deaths over the per-DAY lifetime table — rows "
        "bounded by the observation horizon in days"
    ),
    "theil_sen_hourly_trend": (
        "slope median via rank over the h^2 pairwise-slope table of "
        "the per-HOUR series — bounded by the horizon squared, not "
        "events (sketch alternative documented for longer horizons)"
    ),
    "weighted_sample_without_replacement": (
        "rn assignment runs AFTER orderBy().limit(k): TakeOrdered "
        "reduces to k rows before the window touches anything"
    ),
}


def _global_window_count(plan: str) -> int:
    """Count WindowExec operators with an EMPTY partition spec.

    WindowExec prints `Window [exprs], [part], [order]` (3 top-level
    groups) when partitioned, `Window [exprs], [order]` (2 groups)
    when global, and `Window [exprs], [part]` (2 groups) when
    partitioned without ordering — the 2-group forms disambiguate by
    the sort-direction tokens only an order spec contains. Dedup by
    plan_id like _exchange_counts (cached subtrees re-print)."""
    seen: set[str] = set()
    n = 0
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").lstrip()
        if not (s.startswith("Window ") or s.startswith("WindowGroupLimit ")):
            continue
        m = re.search(r"\[plan_id=(\d+)\]", line)
        key = m.group(1) if m else s
        if key in seen:
            continue
        seen.add(key)
        # split into top-level [...] groups
        groups, depth, start = [], 0, None
        for i, ch in enumerate(s):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(s[start : i + 1])
        if s.startswith("WindowGroupLimit "):
            # prints `WindowGroupLimit [part], [order], rankFn, k` —
            # global iff the first group is empty or an order spec
            if groups and (
                groups[0] == "[]" or " ASC " in groups[0] or " DESC " in groups[0]
            ):
                n += 1
            continue
        if len(groups) >= 3:
            continue  # [exprs], [part], [order]
        if len(groups) == 2 and (" ASC " in groups[1] or " DESC " in groups[1]):
            n += 1  # [exprs], [order] — no partition spec
        elif len(groups) == 2 and groups[1] == "[]":
            n += 1
    return n


def _exchange_counts(plan: str) -> tuple[int, int]:
    """(shuffles, broadcasts) as UNIQUE physical exchanges. A cached
    frame's plan is re-printed under every InMemoryTableScan, so raw
    substring counts tally the same exchange once per reprint; dedup
    by plan_id (or by the full line when no id is printed) and skip
    ReusedExchange references, which are pointers, not operators."""
    sh: set[str] = set()
    bc: set[str] = set()
    for line in plan.splitlines():
        if "Exchange" not in line or "ReusedExchange" in line:
            continue
        m = re.search(r"\[plan_id=(\d+)\]", line)
        key = m.group(1) if m else line.strip()
        (bc if "BroadcastExchange" in line else sh).add(key)
    return len(sh), len(bc)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scale_audit")
    from arcon_spark.plans.registry import REGISTRY, queries

    qmap = queries()
    rows = []
    for name, fn in sorted(qmap.items()):
        if only and name not in only:
            continue
        if name.startswith("stream_"):
            continue  # streaming plans are exercised by their tapes
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        n_sh, n_bc = _exchange_counts(plan)
        rows.append(
            (
                name,
                n_sh,
                plan.count("Scan parquet"),
                "yes" if ("ArrowEvalPython" in plan or "MapInPandas" in plan
                          or "MapInArrow" in plan
                          or "FlatMapGroupsInPandas" in plan
                          or "FlatMapCoGroupsInPandas" in plan) else "",
                n_bc,
                plan.count("HashAggregate") + plan.count("ObjectHashAggregate"),
                ", ".join(REGISTRY[name].tags[:3]),
                _global_window_count(plan),
            )
        )

    if only:
        for r in rows:
            print("| " + " | ".join(str(c) for c in r) + " |")
        return  # (last column = single-partition Window count)

    out = [
        "# SCALE — physical-plan audit of every batch query",
        "",
        "Generated by tools/scale_audit.py (executed plans at "
        f"{sf_dir}; plan SHAPE is scale-invariant — AQE may coalesce",
        "partition counts at runtime but the operator tree is what",
        "ships to a 1000-executor cluster). SortAggregate, cartesian",
        "products and un-allowlisted broadcast-nested-loop joins are",
        "banned registry-wide by tests/test_plans.py; Python stages",
        "are deliberate (Arrow-batched multimodal/ANN featurizers),",
        "never incidental.",
        "",
        "| query | shuffles | scans | python | bcast | aggs | tags |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append("| " + " | ".join(str(c) for c in r[:7]) + " |")

    n_zero = sum(1 for r in rows if r[1] == 0)
    n_py = sum(1 for r in rows if r[3])
    out += [
        "",
        f"**{len(rows)} batch queries** — {n_zero} plan ZERO shuffles "
        f"(pure scan→project pipelines); {n_py} use the Arrow/Python "
        "path by design; the rest shuffle only on their semantic keys.",
    ]
    high = [r for r in rows if r[1] >= 6]
    if high:
        out += ["", "## High-shuffle rows (>= 6), each justified", ""]
        unexplained = []
        for r in high:
            note = HIGH_SHUFFLE_NOTES.get(r[0])
            if note is None:
                unexplained.append(r[0])
                note = "UNEXPLAINED — trim the plan or add a note"
            out.append(f"- **{r[0]}** ({r[1]} shuffles): {note}")
        if unexplained:
            print(f"WARNING: unexplained >=6-shuffle plans: {unexplained}")
    gw_rows = [r for r in rows if r[7] > 0]
    if gw_rows:
        out += [
            "",
            "## Single-partition Window rows (WindowExec with no "
            "partition spec), each justified",
            "",
            "A global window moves ALL its input to one task — "
            "legitimate only over a DERIVED table whose row count is "
            "bounded by construction (hour series, fixed bins, "
            "top-k-trimmed candidates, scalar audits), never over "
            "event-scale data. tools/scale_audit.py enumerates every "
            "such plan; an unexplained row is a bug to fix.",
            "",
        ]
        gw_unexplained = []
        for r in gw_rows:
            note = GLOBAL_WINDOW_NOTES.get(r[0])
            if note is None:
                gw_unexplained.append(r[0])
                note = "UNEXPLAINED — repartition the window or add a note"
            out.append(f"- **{r[0]}** ({r[7]} global window{'s' if r[7] > 1 else ''}): {note}")
        if gw_unexplained:
            print(f"WARNING: unexplained single-partition Window plans: {gw_unexplained}")
    from tools.doc_digest import digest_line

    out += ["", digest_line()]
    with open("/root/repo/SCALE.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote SCALE.md: {len(rows)} queries, {n_zero} zero-shuffle, {n_py} python")


if __name__ == "__main__":
    main()
