"""Distributed row-index synthesis.

The reference's order-sensitive ops (linear interpolation ``ref:30``,
ffill ``ref:31``) are defined over pandas' implicit positional row
order. Spark has no row order, so the engine makes the order explicit:
a contiguous 0..n-1 position column computed WITHOUT a single-task
global window.

Pattern (standard distributed scan-fix):
  1. ``repartitionByRange`` on the ordering key -> partitions hold
     contiguous, sorted key ranges (partition i < partition i+1).
  2. per-partition ``row_number`` (narrow window inside a partition).
  3. one tiny job collects per-partition counts; cumulative offsets are
     broadcast-joined back.

Cost: one extra lightweight count job; no stage is single-task, so the
pattern holds at 1000 executors / 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.functions.caching import track

PID = "__dih_pid"
POS = "__dih_pos"


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = POS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a contiguous 0-based position column ordered by ``order_cols``.

    ``order_cols`` must be a (composite) unique key for the result to be
    deterministic — ties may land on either side of a range-partition
    boundary.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # Per-partition positions WITHOUT a window: after an in-partition
    # sort, monotonically_increasing_id is a per-partition row counter
    # (value = pid<<33 + row), so position = mid - min(mid in pid).
    # A row_number window would force a second (hash-on-pid) shuffle;
    # this shape needs only the one range shuffle, and the output stays
    # physically range-partitioned — downstream repair ops may use
    # pre_partitioned=True on it.
    part = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(PID, F.spark_partition_id())
        .withColumn("__dih_mid", F.monotonically_increasing_id())
    )

    # repartitionByRange samples fresh range boundaries on EVERY job, so
    # the stats job below and the consumer's later actions would see
    # different partitionings. Persist pins one physical partitioning
    # (same reason Spark's own RDD.zipWithIndex materializes first).
    # Tracked so session owners can release it at the next query
    # boundary (functions/caching.py) instead of leaking for the
    # session lifetime.
    part = track(part.persist())

    # Tiny job: one row per partition; offsets computed driver-side.
    stats = {
        r[PID]: (r["cnt"], r["mn"])
        for r in part.groupBy(PID)
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("__dih_mid").alias("mn"))
        .collect()
    }
    rows, acc = [], 0
    for pid in sorted(stats):
        cnt, mn = stats[pid]
        rows.append((int(pid), int(acc), int(mn)))
        acc += cnt
    spark = df.sparkSession
    offset_df = spark.createDataFrame(rows, f"{PID} int, __dih_off long, __dih_mn long")
    out = (
        part.join(F.broadcast(offset_df), PID)
        .withColumn(
            index_col,
            (F.col("__dih_off") + (F.col("__dih_mid") - F.col("__dih_mn"))).cast("long"),
        )
        .drop("__dih_mid", "__dih_off", "__dih_mn", PID)
    )
    return out
