"""SQL front door.

Catalyst produces the same plan for SQL text and DataFrame calls; the
engine registers the harmonized tables as temp views so users can mix
both freely. One Q3-shaped query is pinned against the oracle to show
the SQL surface end-to-end (parser -> Catalyst -> same physical plan
family as the DataFrame queries: broadcast dim join + partial aggs +
top-k sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from data_integration_and_harmonization_spark.sources.readers import TPCH_TABLES


def register_tables(
    spark: SparkSession, sf_dir: str, tables: Sequence[str] = TPCH_TABLES
) -> None:
    """Expose the parquet tables as temp views for spark.sql()."""
    for t in tables:
        if t == "events":
            from data_integration_and_harmonization_spark.operators.events import load_events

            load_events(spark, sf_dir).createOrReplaceTempView(t)
        else:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query through the SQL API."""
    register_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(SHIPPING_PRIORITY_SQL)
