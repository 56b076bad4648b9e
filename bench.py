"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from data_integration_and_harmonization_spark import get_spark

# Headline set: the operators that dominate real pipelines — union
# harmonization, order-sensitive repair, wide aggs, scaling, encoding,
# binned EDA.
HEADLINE = [
    "harmonize_union",
    "clean_repair",
    "clean_cascade",
    "describe_all",
    "corr_matrix",
    "feat_zscore",
    "feat_label_encode",
    "eda_binned",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # Untimed codegen warmup: run EVERY query once AT THE TIMED sf.
    # Janino compilation + JIT of each plan's generated code is a
    # per-plan-shape cost, not a per-data cost — measured: the first
    # query to touch the minhash expression tree pays tens of seconds
    # of codegen, then identical plans run in single digits. Warming at
    # a smaller sf does NOT fully cover this: AQE picks different
    # physical plans at different scales (broadcast vs sort-merge), so
    # some large-scale codegen would still land inside the timed pass.
    # Steady-state plan cost is what a long-lived cluster service sees,
    # so that is what the timed pass below measures.
    # Two passes: measured on this class of host, the first execution
    # pays Janino codegen and the second still runs partially
    # interpreted until HotSpot C2 compiles the generated code (e.g.
    # the 32-way md5 MinHash expression tree: ~20s cold, ~12s on the
    # second run, ~3s steady). One warmup would time the C2 ramp, not
    # the plan.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", sf_dir)
    warm_passes = int(os.environ.get("SPARK_GRAFT_WARM_PASSES", "2"))
    t0 = time.time()
    warm_failures = 0
    for _ in range(warm_passes):
        warm_failures = 0
        for name in names:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as e:  # one warmup failure must not sink the bench
                warm_failures += 1
                print(f"# warmup {name} FAILED: {e}", file=sys.stderr)
    if names and warm_failures == len(names):
        # every query failing means the warm dir is bogus (absent dir,
        # bad env override) — a silently-cold timed pass would report
        # codegen, not plans; fail loudly instead.
        raise RuntimeError(f"warmup pass failed for all queries at {warm_dir!r}")
    print(
        f"# warmup ({warm_passes} passes x {len(names)} queries @ {warm_dir}):"
        f" {time.time() - t0:.1f}s untimed",
        file=sys.stderr,
    )

    # Timed pass: best of TIMED_RUNS consecutive executions per query.
    # HotSpot's C2 ramp on the largest generated classes (the 32-way
    # MinHash tree) is stochastic — a run can hit a 10s compile storm
    # even after two warm passes (measured: the same plan alternating
    # 2.5s / 12.7s across early executions, CompilationMXBean showing
    # 20-50s of concurrent compile time). Min-of-k reports the
    # steady-state plan cost a long-lived service sees; single-shot
    # would report whichever side of the JIT coin-flip the run landed.
    # The passes are INTERLEAVED (pass over all queries, then again),
    # not back-to-back per query: compile storms are temporally
    # correlated, so a query's two executions should be minutes apart
    # rather than adjacent — min-of-k across separated passes survives
    # a storm window that covers any single stretch of the run.
    # 3 timed passes (r5): back-to-back full-bench totals on this VM
    # vary ~15% with no code change (Firecracker host noise on top of
    # the documented C2 stochasticity) — min-of-3 tightens the
    # recorded steady-state number for ~90 s more wall-clock.
    timed_runs = int(os.environ.get("SPARK_GRAFT_TIMED_RUNS", "3"))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for _ in range(max(1, timed_runs)):
        for name in names:
            t0 = time.time()
            try:
                rows[name] = qs[name](spark, sf_dir).count()
            except Exception:  # noqa: BLE001 — filtered just below
                # One retry, ONLY for the known-transient signatures
                # (concurrent-fit py4j race / py4j transport hiccup) —
                # keeps a single flake from sinking the whole bench. A
                # deterministic failure re-raises immediately with its
                # original traceback; the swallowed first traceback is
                # printed so the flake stays diagnosable.
                import traceback

                tb = traceback.format_exc()
                transient = any(
                    sig in tb
                    for sig in (
                        "Cannot parse null string",
                        "Py4JNetworkError",
                        "Answer from Java side is empty",
                    )
                )
                if not transient:
                    raise
                print(f"# timed {name} failed once; retrying. First traceback:\n{tb}", file=sys.stderr)
                t0 = time.time()
                rows[name] = qs[name](spark, sf_dir).count()
            t = time.time() - t0
            timings[name] = round(min(timings.get(name, float("inf")), t), 3)
            runs.setdefault(name, []).append(round(t, 3))
    for name in names:
        print(f"# {name}: {timings[name]:.2f}s ({rows[name]} rows)", file=sys.stderr)

    codecache: dict[str, str] = {}
    try:
        # JVM code-cache usage at end of run: this repo has twice had
        # warm-query drift from a silently-full code cache (r4: 240m
        # default, r5: 1g) — recorded IN the artifact (plus stderr) so
        # a future drift is attributable without re-instrumenting.
        beans = spark._jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        it = beans.iterator()
        while it.hasNext():
            b = it.next()
            if "CodeHeap" in b.getName():
                u = b.getUsage()
                codecache[b.getName()] = (
                    f"{u.getUsed() // (1024 * 1024)}/{u.getMax() // (1024 * 1024)} MB"
                )
                print(
                    f"# codecache {b.getName()}: {codecache[b.getName()]}",
                    file=sys.stderr,
                )
    except Exception:  # noqa: BLE001 — diagnostics must never sink a bench
        pass

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                # per-run times (the min of each list is "queries"):
                # the spread attributes drift — a wide spread on an
                # unchanged query is JIT/host noise, a tight spread at
                # a new level is a real plan change
                "runs": runs,
                "codecache": codecache,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
