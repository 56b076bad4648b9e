"""Physical-plan audit across every registered query.

Counts the plan features that matter at scale and flags anti-patterns:

- ``Exchange SinglePartition``  — a serial stage (global window/sort
  without partitioning); the kiss of death at 100 TB. Allowed only
  under an explicit cap (the audit reports it; reviewer judges).
- ``CartesianProduct``          — unbounded all-pairs join.
- ``BatchEvalPython``           — row-at-a-time Python UDF in the plan
  (ArrowEvalPython / mapInPandas are the sanctioned Python paths).
- counts of shuffles / broadcast joins / sort-merge joins / windows /
  WholeStageCodegen spans per query, for drift tracking.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


FLAGS = ("Exchange SinglePartition", "CartesianProduct", "BatchEvalPython")

# Queries whose plans legitimately contain a flagged feature, with the
# reason pinned here so new offenders stand out. Entries that a run
# never needs are reported as STALE (they would mask a future
# regression in that query).
ALLOWED = {
    # bounded-payload top-k: the global sort-limit's final
    # single-partition merge sees only `limit` rows per upstream task
    "text_bm25_topk": {"Exchange SinglePartition"},
    # 1-row corpus-scalar frames joined back in (stats, vocab, N):
    # single-partition by construction
    "text_lm_quality": {"Exchange SinglePartition"},
    "describe_all": {"Exchange SinglePartition"},
    "eda_box_stats": {"Exchange SinglePartition"},
    "eda_binned": {"Exchange SinglePartition"},
    "corr_matrix": {"Exchange SinglePartition"},
    # global no-groupBy aggregate: the final merge sees one partial row
    # per upstream task — bounded at any scale
    "stream_batch_twin": {"Exchange SinglePartition"},
    # '__part_R' leg: global aggregate over the partition-pruned
    # read-back — one partial row per upstream task, bounded
    "src_roundtrip": {"Exchange SinglePartition"},
    # '__salted_agree' leg: global aggregate over the 25-nation-group
    # salted-vs-unsalted comparison — one partial row per task, bounded
    "rel_revenue_by_nation": {"Exchange SinglePartition"},
    # label-map global rank runs over DISTINCT category values of one
    # column — bounded by category cardinality, not corpus size; the
    # one-hot column-sum check is a 1-row global aggregate (one
    # bounded partial per upstream task)
    "feat_label_encode": {"Exchange SinglePartition"},
    # blocking_stats' final global aggregate: the single-partition
    # merge sees one partial row per upstream task (block-size
    # distribution already reduced map-side) — bounded at any scale
    "link_golden": {"Exchange SinglePartition"},
    # the funnel report + packed-row global aggregates: each merge
    # sees one partial row per upstream task — bounded at any scale
    "curate_pipeline": {"Exchange SinglePartition"},
    # 'jl_ok' verdict row: global no-groupBy aggregate over the
    # JL-projected norms — one partial row per upstream task, bounded
    "emb_pool_quantize": {"Exchange SinglePartition"},
    # 'funnel' leg: the per-step reach counts are a global no-groupBy
    # aggregate over per-user rows — one partial row per task, bounded
    "events_windows": {"Exchange SinglePartition"},
    # 'hll_rollup' leg: the union-merge of ~days fixed-size HLL
    # sketches and the exact-distinct final merge are both global
    # aggregates — one bounded partial per upstream task
    "events_sessions_props": {"Exchange SinglePartition"},
    # target_encode's global-prior fit: 1-row aggregate, bounded
    "feat_zscore": {"Exchange SinglePartition"},
    # (harmonize_union's funnel legs moved their stage aggregates to
    # driver-side collects over a persisted frame in r9 — the
    # returned plan no longer carries a SinglePartition exchange, so
    # its former allowlist entry is gone; the audit's stale check is
    # what caught the change.)
    # 'copairs' basket-total fit: global distinct-count final merge —
    # one partial row per upstream task, bounded
    "rel_grouping_sets": {"Exchange SinglePartition"},
    # r10 correlated-subquery legs: q3's global top-10 merge (limit
    # rows per upstream task) and the q17/q22 uncorrelated scalar
    # subqueries (1-row global averages) — bounded at any scale; the
    # correlated shapes themselves decorrelate to semi/anti joins
    "sql_shipping_priority": {"Exchange SinglePartition"},
}


# Expected GLOBAL (unpartitioned) window count per query — the
# known-bounded sites (frames of <= bins rows, capped top-k merges,
# distinct-category ranks). Every WindowExec with an empty partition
# spec forces a serial Sort + SinglePartition exchange, so a NEW one
# over a non-aggregated frame is a scale-killer; this budget turns the
# undifferentiated "WindowExec: No Partition Defined" log spam into a
# red/green signal (r10 verdict item 7). A query exceeding its budget
# (default 0) flags; a query under it is reported as a stale budget.
GLOBAL_WINDOW_BUDGET: dict[str, int] = {
    # scoring.py rank-over-term-frequency sites: the frame is the
    # top-1000-capped distinct-term table, bounded by construction
    "text_bm25_topk": 2,
    # profile.py drift legs (cum/full windows): the frame is the
    # per-bucket histogram, <= bins rows at any corpus size
    "corr_matrix": 2,
    # features.py label map + robust-fit rank: frames are distinct
    # category values / the scale-gated exact-fit sample
    "feat_label_encode": 2,
}


def _global_window_count(plan: str) -> int:
    """WindowExec nodes with an EMPTY partition spec — the shape that
    forces a serial Sort + SinglePartition exchange. The node prints
    its specs as top-level bracket groups after the expression list:
    ``Window [exprs], [partSpec], [orderSpec]`` when partitioned and
    ordered, ``Window [exprs], [orderSpec]`` when GLOBAL (empty
    partition spec omitted), ``Window [exprs], [partSpec]`` for
    partitioned-unordered frames (count-over-partition). The last two
    are distinguished by the second group's content: an order spec
    carries sort directions (``ASC``/``DESC``); a partition spec is
    bare expressions. Groups are parsed at bracket depth 0 so array
    subscripts inside expressions don't miscount."""
    n = 0
    for line in plan.splitlines():
        i = line.find("Window [")
        if i < 0:
            continue
        depth = 0
        groups: list[str] = []
        buf: list[str] = []
        for ch in line[i + 7 :]:
            if ch == "[":
                if depth == 0:
                    buf = []
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                    continue
            if depth >= 1:
                buf.append(ch)
        if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
            n += 1
    return n


def _single_partition_split(plan: str) -> tuple[int, int]:
    """(offending, bloom) SinglePartition exchanges. Spark's
    injected runtime-filter subqueries (``bloom_filter_agg``) end in a
    single-partition merge of ONE partial bloom filter per upstream
    task — bounded at any scale and outside the query author's
    control, so they are classified separately instead of allowlisted
    per query (they appear/disappear as join stats shift)."""
    lines = plan.splitlines()
    off = bloom = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # classify by the exchange's DIRECT CHILD (printed on the next
        # line): only a partial bloom build below it makes this a
        # runtime-filter merge — looking at preceding lines instead
        # could misclassify a genuine offender that happens to sit
        # next to an inlined bloom subquery
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "partial_bloom_filter_agg" in child:
            bloom += 1
        else:
            off += 1
    return off, bloom


def audit(name: str, df) -> tuple[dict[str, int], list[str], set[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    sp_off, sp_bloom = _single_partition_split(plan)
    gw = _global_window_count(plan)
    counts = {
        "shuffle": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "single_part": sp_off,
        "bloom_sp": sp_bloom,
        "bcast_join": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        # "Window [" is WindowExec; a bare substring count would also
        # match WindowGroupLimit (rank-pushdown helper nodes)
        "window": plan.count("Window ["),
        "global_window": gw,
        # executedPlan toString marks codegen stages as "*(n)"
        "codegen": plan.count("*("),
    }
    present = {
        "Exchange SinglePartition": sp_off > 0,
        "CartesianProduct": "CartesianProduct" in plan,
        "BatchEvalPython": "BatchEvalPython" in plan,
    }
    used = {f for f in FLAGS if present[f] and f in ALLOWED.get(name, set())}
    bad = [f for f in FLAGS if present[f] and f not in ALLOWED.get(name, set())]
    budget = GLOBAL_WINDOW_BUDGET.get(name, 0)
    if gw > budget:
        bad.append(f"GlobalWindow {gw}>{budget}")
    return counts, bad, used


def scan_observe_sources(root: str | None = None) -> list[str]:
    """Flag any ``observe(`` / ``Observation(`` in engine source.

    On Spark 4.1.2 the FIRST ``Observation`` permanently attaches a
    non-serializable ObservationManager to the shared SparkSession;
    every later RDD-closure job (the ML fits) dies with "Task not
    serializable". Per-query verifies can't see it — only a
    full-catalog single-session run does — so the ban is enforced
    statically here (and mirrored by a pytest). History + safe shape:
    ``plans/pipeline.py`` docstring (persist the mid frame, derive
    stage counts in one aggregate). Returns ``file:line`` offenders.
    """
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = ["data_integration_and_harmonization_spark", "__spark_entry__.py", "bench.py"]
    hits: list[str] = []
    for t in targets:
        p = os.path.join(root, t)
        files = [p] if os.path.isfile(p) else [
            os.path.join(d, f)
            for d, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".py")
        ]
        for fp in files:
            with open(fp, encoding="utf-8") as fh:
                for i, line in enumerate(fh, 1):
                    code = line.split("#", 1)[0]
                    if ".observe(" in code or "Observation(" in code:
                        rel = os.path.relpath(fp, root)
                        hits.append(f"{rel}:{i}")
    return hits


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    observe_hits = scan_observe_sources()
    if observe_hits:
        print(
            "OBSERVE GUARD: Observation/observe() poisons the shared "
            "session on Spark 4.1.2 (see plans/pipeline.py docstring); "
            f"remove: {', '.join(observe_hits)}"
        )
        return 1

    import __spark_entry__ as entrymod
    from data_integration_and_harmonization_spark import get_spark

    qs = entrymod.queries()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise audit nothing and report clean
        print(f"unknown queries: {sorted(unknown)}")
        return 2

    spark = get_spark("plan_audit")
    failures = []
    allow_used: dict[str, set[str]] = {}
    gw_seen: dict[str, int] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            counts, bad, used = audit(name, fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            failures.append(name)
            continue
        allow_used[name] = used
        gw_seen[name] = counts["global_window"]
        line = " ".join(f"{k}={v}" for k, v in counts.items())
        if bad:
            failures.append(name)
            print(f"FLAG {name}: {', '.join(bad)} | {line}")
        else:
            print(f"ok   {name}: {line}")
    if not only:
        # full runs also surface allowlist rot: an entry no plan needs
        # would silently mask a future regression in that query
        stale = [
            f"{name}:{sorted(ALLOWED[name] - allow_used.get(name, set()))}"
            for name in sorted(ALLOWED)
            if name in allow_used and ALLOWED[name] - allow_used.get(name, set())
        ] + [f"{name} (not in registry)" for name in sorted(set(ALLOWED) - set(qs))] + [
            f"{name} (global-window budget {b} > seen {gw_seen[name]})"
            for name, b in sorted(GLOBAL_WINDOW_BUDGET.items())
            if name in gw_seen and gw_seen[name] < b
        ] + [
            f"{name} (global-window budget, not in registry)"
            for name in sorted(set(GLOBAL_WINDOW_BUDGET) - set(qs))
        ]
        if stale:
            print(f"\nSTALE ALLOWLIST: {', '.join(stale)}")
            failures.extend(["<stale-allowlist>"])
    if failures:
        print(f"\nFLAGGED: {', '.join(failures)}")
        return 1
    print("\nNO FLAGS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
