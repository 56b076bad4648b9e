"""Relational operators beyond the reference: as-of boundary
semantics, rollup markers, pivot explicit values."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators import relational as REL


def test_asof_picks_latest_at_or_before(spark):
    t = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, 100, t("2024-01-01T10:00:00")),
            (2, 100, t("2024-01-01T12:00:00")),
            (3, 100, t("2024-01-01T08:00:00")),  # before any right row
            (4, 200, t("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "event_id long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, t("2024-01-01T09:00:00"), 1.0),
            (100, t("2024-01-01T10:00:00"), 2.0),  # ties lts of event 1 exactly
            (100, t("2024-01-01T11:00:00"), 3.0),
        ],
        "k long, rts timestamp, val double",
    )
    out = {
        r["event_id"]: r["asof_val"]
        for r in REL.asof_join(left, right, "lts", "rts", ["k"], ["val"]).collect()
    }
    assert out[1] == 2.0  # <= semantics: exact-time right row matches
    assert out[2] == 3.0  # latest before 12:00
    assert out[3] is None  # nothing at or before 08:00
    assert out[4] is None  # no right rows for key


def test_rollup_contains_grand_total(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = REL.rollup_summary(li)
    grand = out.where(
        F.col("l_returnflag").isNull() & F.col("l_linestatus").isNull()
    ).collect()
    assert len(grand) == 1 and grand[0]["n"] == li.count()


def test_pivot_explicit_columns(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = REL.pivot_status(li)
    assert set(out.columns) == {"l_returnflag", "qty_open", "qty_filled"}


def test_melt_retains_nulls_and_roundtrips_pivot(spark):
    wide = spark.createDataFrame(
        [("A", 1.0, 2.0), ("B", None, 3.0)],
        "k string, m1 double, m2 double",
    )
    long = REL.melt(wide, ["k"], ["m1", "m2"], "var", "val")
    rows = {(r["k"], r["var"]): r["val"] for r in long.collect()}
    # pandas-melt semantics: the null measure is kept as a row
    assert rows == {
        ("A", "m1"): 1.0,
        ("A", "m2"): 2.0,
        ("B", "m1"): None,
        ("B", "m2"): 3.0,
    }
    # narrow plan: no Exchange in the unpivot subtree
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_semi_anti_partition(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = REL.customers_with_orders(cust, orders).count()
    wo = REL.customers_without_orders(cust, orders).count()
    assert w + wo == cust.count()


def test_scd2_build_classifies_history(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", None)],
        "k long, seg string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B2", 25.0), (4, "D", 40.0)],
        "k long, seg string, bal double",
    )
    rows = REL.scd2_build(old, new, "k", ["seg", "bal"], "2024-01-01", "2024-06-01")
    got = {(r.key, r.is_current): r for r in rows.collect()}
    d0, d1 = dt.date(2024, 1, 1), dt.date(2024, 6, 1)
    # stable key: one open row since the OLD as-of
    assert got[(1, True)].valid_from == d0 and got[(1, True)].valid_to is None
    assert (1, False) not in got
    # changed key: closed old version + open new version
    assert got[(2, False)].seg == "B" and got[(2, False)].valid_to == d1
    assert got[(2, True)].seg == "B2" and got[(2, True)].valid_from == d1
    # deleted key: closed only; added key: open only, since NEW as-of
    assert got[(3, False)].valid_to == d1 and (3, True) not in got
    assert got[(4, True)].valid_from == d1 and (4, False) not in got
    assert rows.count() == 5


def test_scd2_null_vs_empty_attr_hash_apart(spark):
    old = spark.createDataFrame([(1, None)], "k long, seg string")
    new = spark.createDataFrame([(1, "")], "k long, seg string")
    rows = REL.scd2_build(old, new, "k", ["seg"], "2024-01-01", "2024-06-01")
    kinds = {(r.is_current, r.seg) for r in rows.collect()}
    # NULL -> '' must register as a CHANGE, not a stable row
    assert kinds == {(False, None), (True, "")}


def test_copurchase_pairs_hand_computed(spark):
    # baskets: {A,B,C}, {A,B}, {A,B}, {C}, {A} -> pair (A,B) support 3;
    # (A,C) and (B,C) support 1 (below min_support)
    rows = []
    for ok, parts in [(1, [10, 20, 30]), (2, [10, 20]), (3, [10, 20]), (4, [30]), (5, [10])]:
        rows += [(ok, p) for p in parts]
    # duplicate line within a basket must not inflate support
    rows.append((2, 10))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = REL.copurchase_pairs(li, min_support=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["p1"], r["p2"], r["support"]) == (10, 20, 3)
    # lift = sup * N / (n_10 * n_20) = 3 * 5 / (4 * 3)
    assert r["lift"] == round(3 * 5 / (4 * 3), 6)
