"""Relational surface the engine exposes beyond the reference.

The reference has NO joins, groupBy, sorts, or top-k anywhere
(SURVEY §2.8) — its only multi-table op is union. A harmonization
engine at 100 TB lives on key-based integration, so the engine
exposes Spark's native relational surface and these queries pin its
semantics against the oracle:

- pricing summary: classic wide agg with map-side partial aggregation
- revenue by nation: a 3-way join where the two small dims (nation,
  customer at dim-scale) broadcast — no shuffle of the fact table
  beyond the agg
- top-k per group: ranking window after a join

All plain DataFrame code — Catalyst picks broadcast-hash joins for
the dims (verified via explain) and AQE handles skew at scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped whole-table grouped agg."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_nation(customer: DataFrame, orders: DataFrame, nation: DataFrame) -> DataFrame:
    """Revenue per (nation, mktsegment): fact joins two broadcast dims."""
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def top_orders_per_segment(customer: DataFrame, orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders by totalprice per market segment — ranking window
    partitioned by segment (parallel across segments). Ties broken by
    orderkey for determinism."""
    j = orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("c_mktsegment", "rk", "o_orderkey", F.round("o_totalprice", 6).alias("o_totalprice"))
    )


# ------------------------------------------------------- query registry

def relational_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_pricing(spark, sf):
        return pricing_summary(spark.read.parquet(f"{sf}/lineitem.parquet"))

    def q_revenue(spark, sf):
        return revenue_by_nation(
            spark.read.parquet(f"{sf}/customer.parquet"),
            spark.read.parquet(f"{sf}/orders.parquet"),
            spark.read.parquet(f"{sf}/nation.parquet"),
        )

    def q_topk(spark, sf):
        return top_orders_per_segment(
            spark.read.parquet(f"{sf}/customer.parquet"),
            spark.read.parquet(f"{sf}/orders.parquet"),
            3,
        )

    return {
        "rel_pricing_summary": q_pricing,
        "rel_revenue_by_nation": q_revenue,
        "rel_topk_per_segment": q_topk,
    }


def relational_oracles() -> dict[str, str]:
    return {
        "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 6) AS sum_qty,
  round(sum(l_extendedprice), 6) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_discount), 6) AS avg_disc,
  count(*)::BIGINT AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
        "rel_revenue_by_nation": """
SELECT n_name, c_mktsegment,
  round(sum(o_totalprice), 6) AS revenue,
  count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
""",
        "rel_topk_per_segment": """
SELECT c_mktsegment, rk::INTEGER AS rk, o_orderkey, round(o_totalprice, 6) AS o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rk <= 3
""",
    }
