"""Session-hygiene guards (r9 verdict item 3).

Round-9 incident: a ``df.observe(Observation(...))`` call in the
integration funnel permanently attached a non-serializable
ObservationManager to the shared SparkSession on Spark 4.1.2 — every
LATER RDD-closure job (the ML fits) died with "Task not serializable".
Per-query verifies can't see cross-query poisoning; only a
full-catalog single-session run (the bench) caught it. Two guards:

1. a static scan banning ``observe(`` / ``Observation(`` anywhere in
   engine source (mirrors ``tools/plan_audit.py``'s hard gate);
2. a dynamic canary: after planning catalog queries on the shared
   session, an RDD-closure job must still serialize and run — this
   catches ANY future session-poisoning mechanism, not just observe.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tools.plan_audit import scan_observe_sources


def test_no_observe_in_engine_source():
    hits = scan_observe_sources()
    assert hits == [], (
        "Observation/observe() poisons the shared SparkSession on "
        f"Spark 4.1.2 (see plans/pipeline.py docstring): {hits}"
    )


def test_rdd_closure_alive_after_planning_catalog(spark, sf_dir):
    """Plan (don't execute) a representative slice of the catalog —
    including the integration-funnel query where the r9 incident
    lived — then prove an RDD-closure job still serializes on the
    SAME session. Planning is what attaches session-level managers;
    executing all 50 queries here would duplicate verify_local."""
    qs = entry.queries()
    for name in ("harmonize_union", "clean_cascade", "feat_zscore"):
        df = qs[name](spark, sf_dir)
        df._jdf.queryExecution().executedPlan()  # force full planning
    got = spark.sparkContext.parallelize([1, 2, 3], 2).map(lambda x: x + 1).sum()
    assert got == 9
