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


def test_semi_anti_partition(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = REL.customers_with_orders(cust, orders).count()
    wo = REL.customers_without_orders(cust, orders).count()
    assert w + wo == cust.count()
