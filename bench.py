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
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", sf_dir)
    t0 = time.time()
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
        f"# warmup pass ({len(names)} queries @ {warm_dir}):"
        f" {time.time() - t0:.1f}s untimed",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
